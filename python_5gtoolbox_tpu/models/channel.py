"""MIMO fading channel model: AWGN / TDL / Rayleigh / Rician + impairments.

Behavior parity targets:
  py5gphy/channel_model/nr_channel_model.py (NrChannelModel: CFO rotation,
      integer/fractional TA split, per-tap MIMO fading, AWGN injection,
      per-symbol timing-error matrix Dm, config factory)
  py5gphy/channel_model/rayleigh_channel.py / rician_channel.py
      (sum-of-sinusoids random-walk generators, model I/IV)
  py5gphy/channel_model/MIMO_fading_channel.py (Kronecker-correlated
      per-sample MIMO assembly)
  py5gphy/channel_model/nr_TDL_channel.py (TR 38.901 7.7.2/7.7.3 TDL
      profiles — stored as data npz)
  py5gphy/channel_model/nr_spatial_correlation_matrix.py (38.101-4 /
      38.104 correlation matrices; uniform ULA + customized alpha/beta)

TPU design: the reference's per-sample `H @ x` python loop becomes one
einsum over (tap, sample, Nr, Nt); sum-of-sinusoids fading is a batched
cosine-sum matmul over sinusoids. The whole filter is jittable; static
randomness comes from explicit PRNG keys (the reference draws fresh
numpy randomness per call — statistically equivalent).
"""
from __future__ import annotations

import functools
import pathlib

import numpy as np
from python_5gtoolbox_tpu.utils.host import to_device, to_host
from python_5gtoolbox_tpu.utils.cplx import cexp
import jax
import jax.numpy as jnp

_DATA = pathlib.Path(__file__).resolve().parents[1] / "data"


# ---------------------------------------------------------------------------
# Spatial correlation (uniform ULA + customized)
# ---------------------------------------------------------------------------

def gen_correlation_matrix(size: int, delta) -> np.ndarray:
    """38.104 Table G.2.3.1.1-1 style exponential correlation matrix."""
    assert size in (1, 2, 4, 8)
    r = np.eye(size, dtype=np.complex64)
    if size == 1:
        return r
    if size == 2:
        r[0, 1] = delta
        r[1, 0] = np.conjugate(delta)
        return r
    step = 1 / ((size - 1) ** 2)
    seq = np.arange(1, size) ** 2
    for line in range(size - 1):
        r[line, line + 1:] = delta ** (step * seq[: size - line - 1])
    for col in range(size - 1):
        r[col + 1:, col] = np.conjugate(r[col, col + 1:])
    return r


_DL_UNIFORM = {"low": (0, 0), "medium": (0.3, 0.9), "mediumA": (0.3, 0.3874),
               "high": (0.9, 0.9)}
_UL_UNIFORM = {"low": (0, 0), "medium": (0.9, 0.3), "high": (0.9, 0.9)}


def get_nr_mimo_rspat(nt: int, nr: int, polarization: str = "uniform",
                      direction: str = "DL",
                      correlation: str = "customized",
                      parameters=(0, 0)) -> np.ndarray:
    """MIMO correlation matrix (uniform ULA and customized alpha/beta)."""
    if correlation == "customized":
        alpha, beta = parameters
        rspat = np.kron(gen_correlation_matrix(nt, alpha),
                        gen_correlation_matrix(nr, beta))
        a = 0.00012
        return ((rspat + a * np.eye(nt * nr, dtype=np.complex64))
                / (1 + a)).astype(np.complex64)
    assert polarization == "uniform", "cross-polar: use customized alpha/beta"
    if direction == "DL":
        alpha, beta = _DL_UNIFORM[correlation]
        r_tx = gen_correlation_matrix(nt, alpha)
        r_rx = gen_correlation_matrix(nr, beta)
        if nt == 4 and nr == 2 and correlation == "high":
            a = 0.00010
        elif nt == 4 and nr == 4 and correlation == "high":
            a = 0.00012
        elif nt == 2 and nr == 4 and correlation == "medium":
            a = 0.00010
        elif nt == 4 and nr == 4 and correlation == "medium":
            a = 0.00012
        else:
            a = 0
    else:
        alpha, beta = _UL_UNIFORM[correlation]
        r_tx = gen_correlation_matrix(nt, beta)
        r_rx = gen_correlation_matrix(nr, alpha)
        a = 0
    rspat = np.kron(r_tx, r_rx)
    return ((rspat + a * np.eye(nt * nr, dtype=np.complex64))
            / (1 + a)).astype(np.complex64)


# ---------------------------------------------------------------------------
# TDL profiles (TR 38.901 Tables 7.7.2-1..5, stored as data)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tdl_table(model: str) -> np.ndarray:
    with np.load(_DATA / "tdl_profiles.npz") as z:
        return z[model.replace("-", "_")].copy()


def get_tdl_model_config(model: str, ds_desired_ns: float,
                         fm_hz: float) -> list:
    """Tap list [[delay_ns, power_dB, dist, K_dB, fDo_Hz], ...]."""
    t = _tdl_table(model)
    out = []
    for i in range(t.shape[1]):
        dist = "Rician" if t[2, i] else "Rayleigh"
        out.append([float(t[0, i]) * ds_desired_ns, float(t[1, i]), dist,
                    float(t[3, i]), float(t[4, i]) * fm_hz])
    return out


def gen_channel_model_config(model_format="AWGN",
                             Rspat_config=("customized", "uniform", "DL",
                                           (0, 0)),
                             Nt=1, Nr=1, Timeoff_ns=0, rho=0, fm_inHz=0,
                             multi_paths=((0, 0, "Rayleigh", 0, 0),),
                             fDo_in_Hz=0, Rspat_in=None, DSdesired=100):
    """Mirrors nr_channel_model.gen_channel_model_config."""
    cfg = dict(num_of_sinusoids=30, Nt=Nt, Nr=Nr, Timeoff_ns=Timeoff_ns,
               rho=rho, fm_inHz=fm_inHz, fDo_in_Hz=fDo_in_Hz)
    if model_format == "AWGN":
        cfg["multi_paths"] = []
    elif model_format in ("TDL-A", "TDL-B", "TDL-C", "TDL-D", "TDL-E"):
        cfg["multi_paths"] = get_tdl_model_config(model_format, DSdesired,
                                                  fm_inHz)
    elif model_format == "customized":
        cfg["multi_paths"] = [list(p) for p in multi_paths]
    else:
        raise ValueError(model_format)
    if Rspat_config:
        corr, pol, direction, params = Rspat_config
        rspat = get_nr_mimo_rspat(Nt, Nr, pol, direction, corr, params)
    elif Rspat_in is not None and np.asarray(Rspat_in).size:
        rspat = np.asarray(Rspat_in, np.complex64)
    else:
        rspat = np.eye(Nt * Nr, dtype=np.complex64)
    cfg["Rspat"] = np.eye(Nt * Nr, dtype=np.complex64) \
        if model_format == "AWGN" else rspat
    return cfg


# ---------------------------------------------------------------------------
# Sum-of-sinusoids fading (vectorized, key-driven)
# ---------------------------------------------------------------------------

def rayleigh_filters(key, n: int, fmax: float, fs: float, n_sin: int,
                     shape=()) -> jnp.ndarray:
    """(..., n) Rayleigh fading series, model I random-walk sinusoids."""
    k1, k2, k3 = jax.random.split(key, 3)
    full = shape + (n_sin, 1)
    phase1 = jax.random.uniform(k1, full, minval=-np.pi, maxval=np.pi)
    phase2 = jax.random.uniform(k2, full, minval=-np.pi, maxval=np.pi)
    seta = jax.random.uniform(k3, full, minval=-np.pi, maxval=np.pi)
    m = jnp.arange(n)[None, :]
    w = 2 * np.pi * fmax / fs
    ci = jnp.sqrt(2 / n_sin) * jnp.sum(
        jnp.cos(w * m * jnp.cos(seta) + phase1), axis=-2)
    cq = jnp.sqrt(2 / n_sin) * jnp.sum(
        jnp.cos(w * m * jnp.sin(seta) + phase2), axis=-2)
    return jax.lax.complex(ci.astype(jnp.float32), cq.astype(jnp.float32)).astype(jnp.complex64)


def rician_filters(key, n: int, k_db: float, fdo: float, fmax: float,
                   fs: float, n_sin: int, shape=()) -> jnp.ndarray:
    k1, k2 = jax.random.split(key)
    cm = rayleigh_filters(k1, n, fmax, fs, n_sin, shape)
    phase0 = jax.random.uniform(k2, shape + (1,), minval=-np.pi,
                                maxval=np.pi)
    los = cexp(2 * np.pi * fdo / fs * jnp.arange(n) + phase0)
    kv = 10 ** (k_db / 10)
    return (cm / np.sqrt(kv + 1)
            + np.sqrt(kv / (kv + 1)) * los).astype(jnp.complex64)


def gen_mimo_channel(key, nt: int, nr: int, rspat: np.ndarray, n: int,
                     fs: float, channel: str, k_db: float, fdo: float,
                     fmax: float, n_sin: int) -> jnp.ndarray:
    """(n, Nr, Nt) correlated per-sample MIMO channel."""
    if channel == "Rayleigh":
        vec = rayleigh_filters(key, n, fmax, fs, n_sin, shape=(nt * nr,))
    else:
        vec = rician_filters(key, n, k_db, fdo, fmax, fs, n_sin,
                             shape=(nt * nr,))
    L = np.linalg.cholesky(np.asarray(rspat)) if rspat.shape[0] > 1 else rspat
    mixed = to_device(np.asarray(L, np.complex64)) @ vec  # (Nt*Nr, n)
    # vec_H.reshape((Nr, Nt), order='F') == reshape (Nt, Nr) then transpose
    return jnp.transpose(mixed.reshape(nt, nr, n), (2, 1, 0))


class NrChannelModel:
    """Channel orchestrator, reference-compatible API (+ explicit PRNG key)."""

    def __init__(self, channel_model_config: dict, Pnoise_dB: float,
                 fi_inHz: float, fs_inHz: float, scs: int, seed: int = 0):
        cfg = channel_model_config
        self.nt, self.nr = cfg["Nt"], cfg["Nr"]
        self.timeoff_ns = cfg["Timeoff_ns"]
        self.rho = cfg["rho"]
        self.fm = cfg["fm_inHz"]
        self.rspat = np.asarray(cfg["Rspat"])
        self.pnoise_db = Pnoise_dB
        self.multi_paths = cfg["multi_paths"]
        self.fi, self.fs, self.scs = fi_inHz, fs_inHz, scs
        self.n_sin = cfg["num_of_sinusoids"]
        self.key = jax.random.PRNGKey(seed)

        self.n_integer_ta = int(np.round(self.timeoff_ns * 1e-9 * fs_inHz))
        self.ta_frac = self.timeoff_ns * 1e-9 - self.n_integer_ta / fs_inHz
        if scs == 15:
            cps, nfft, fs0 = [160] + [144] * 6 + [160] + [144] * 6, 2048, 30.72e6
        else:
            cps, nfft, fs0 = [352] + [288] * 13, 4096, 122.88e6
        off, offs = 0, np.zeros(14)
        for m in range(14):
            off += cps[m]
            offs[m] = off
            off += nfft
        self.symbols_offset_s = offs / fs0

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def gen_Dm(self, numofslots: int) -> np.ndarray:
        """Per-symbol fractional timing error matrix (slots, 14)."""
        dm = np.zeros((numofslots, 14))
        terr = 0.0
        slot_s = 1e-3 if self.scs == 15 else 0.5e-3
        for slot in range(numofslots):
            dm[slot] = self.symbols_offset_s * self.rho + terr - self.ta_frac
            terr += slot_s * self.rho
        return dm

    def filter(self, tx, return_device: bool = False) -> np.ndarray:
        """(Nt, N) tx samples -> (Nr, N) rx samples through the channel.

        Accepts host or device arrays; return_device=True keeps the
        result on the accelerator (the device-resident sim pipeline —
        each avoided host round trip saves a ~0.1-0.5 s axon tunnel
        transfer)."""
        if not isinstance(tx, jax.Array):
            tx = np.asarray(tx, np.complex64)
        tx = to_device(tx).astype(jnp.complex64)
        n = tx.shape[1]
        ferr = self.fi * self.rho
        if ferr:
            tx = tx * cexp(2 * np.pi * ferr * jnp.arange(n) / self.fs)
        if self.n_integer_ta:
            sh = self.n_integer_ta
            tx = jnp.roll(tx, sh, axis=1)
            idx = jnp.arange(n)
            mask = (idx >= sh) if sh >= 0 else (idx < n + sh)
            tx = jnp.where(mask[None, :], tx, 0)
        if self.multi_paths:
            # eager complex64 zeros would materialize a complex host
            # constant, which the axon plugin cannot transfer; build it
            # on-device from real planes instead
            zre = jnp.zeros((self.nr, n), jnp.float32)
            acc = jax.lax.complex(zre, zre)
            for path in self.multi_paths:
                delay_s = path[0] * 1e-9
                power_db = path[1]
                h = gen_mimo_channel(self._next_key(), self.nt, self.nr,
                                     self.rspat, n, self.fs, path[2],
                                     path[3], path[4], self.fm, self.n_sin)
                tap = jnp.einsum("nrt,tn->rn", h, tx)
                tap = tap * 10 ** (power_db / 20)
                d = int(np.round(delay_s * self.fs))
                if d:
                    tap = jnp.roll(tap, d, axis=1)
                    idx = jnp.arange(n)
                    mask = (idx >= d) if d >= 0 else (idx < n + d)
                    tap = jnp.where(mask[None, :], tap, 0)
                acc = acc + tap
        else:
            acc = jnp.broadcast_to(tx, (self.nr, n)) if self.nt == self.nr \
                else tx[: self.nr]
        if self.pnoise_db != 255:
            sigma = 10 ** (self.pnoise_db / 20) / np.sqrt(2)
            k1, k2 = jax.random.split(self._next_key())
            acc = acc + sigma * jax.lax.complex(
                jax.random.normal(k1, acc.shape),
                jax.random.normal(k2, acc.shape))
        return acc if return_device else to_host(acc)
