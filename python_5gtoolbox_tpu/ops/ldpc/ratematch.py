"""LDPC rate matching / recovery, TS 38.212 5.4.2.

Behavior parity target: py5gphy/ldpc/nr_ldpc_ratematch.py (Er split, RV
start k0, filler-skipping circular-buffer bit selection, Qm column
interleave) and nr_ldpc_raterecover.py (inverse with repetition
averaging and +max LLR on filler positions).

TPU design: the data-dependent while-loop walk of the reference is traced
ONCE at plan time into a static index vector; the device side is a pure
gather (TX) or a segment-sum scatter (RX LLR accumulation), batched over
code blocks. The filler positions, k0 and Ncb are all config functions.
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from python_5gtoolbox_tpu.ops.ldpc.tables import CBInfo


def get_er_ldpc(G: int, C: int, Qm: int, NL: int) -> list[int]:
    """Per-code-block rate-match lengths (38.212 5.4.2.1)."""
    er = []
    for j in range(C):
        if j <= C - ((G / (NL * Qm)) % C) - 1:
            er.append(NL * Qm * math.floor(G / (NL * Qm * C)))
        else:
            er.append(NL * Qm * math.ceil(G / (NL * Qm * C)))
    return er


def get_k0(Ncb: int, bgn: int, rv: int, Zc: int) -> int:
    """RV starting position (38.212 Table 5.4.2.1-2)."""
    num = {1: {0: 0, 1: 17, 2: 33, 3: 56}, 2: {0: 0, 1: 13, 2: 25, 3: 43}}
    den = 66 if bgn == 1 else 50
    return math.floor(num[bgn][rv] * Ncb / (den * Zc)) * Zc


@functools.lru_cache(maxsize=None)
def ratematch_indices(E: int, Ncb: int, k0: int, filler_start: int,
                      filler_end: int) -> np.ndarray:
    """Static E-length gather indices into the dn circular buffer.

    filler_[start,end): dn-domain filler span = [K' - 2Zc, K - 2Zc).
    Vectorized plan-time equivalent of the reference's while loop: walk
    the circular buffer skipping fillers until E bits are selected.
    """
    n_filler = max(0, min(filler_end, Ncb) - min(filler_start, Ncb))
    usable = Ncb - n_filler
    # enough full wraps to cover E selected bits from any k0
    wraps = E // usable + 2
    ring = (k0 + np.arange(wraps * Ncb)) % Ncb
    keep = ~((ring >= filler_start) & (ring < filler_end))
    idx = ring[keep][:E].astype(np.int32)
    assert idx.size == E
    return idx


def _interleave(e: jnp.ndarray, Qm: int) -> jnp.ndarray:
    """(..., E) -> Qm-column interleave (38.212 5.4.2.2)."""
    E = e.shape[-1]
    return jnp.swapaxes(
        e.reshape(e.shape[:-1] + (Qm, E // Qm)), -1, -2
    ).reshape(e.shape[:-1] + (E,))


def _deinterleave(f: jnp.ndarray, Qm: int) -> jnp.ndarray:
    E = f.shape[-1]
    return jnp.swapaxes(
        f.reshape(f.shape[:-1] + (E // Qm, Qm)), -1, -2
    ).reshape(f.shape[:-1] + (E,))


def ldpc_ratematch(dn: jnp.ndarray, info: CBInfo, E: int, rv: int, Qm: int,
                   Ncb: int | None = None) -> jnp.ndarray:
    """(..., N) codeword -> (..., E) rate-matched bits. Jittable."""
    Ncb = info.N if Ncb is None else Ncb
    k0 = get_k0(Ncb, info.bgn, rv, info.Zc)
    idx = ratematch_indices(E, Ncb, k0, info.Kd - 2 * info.Zc,
                            info.K - 2 * info.Zc)
    ek = dn[..., jnp.asarray(idx)]
    return _interleave(ek, Qm)


def ldpc_raterecover(llr_fe: jnp.ndarray, info: CBInfo, rv: int, Qm: int,
                     Ncb: int | None = None,
                     max_llr: float | jnp.ndarray | None = None) -> jnp.ndarray:
    """(..., E) LLRs -> (..., N) circular-buffer LLRs.

    Repetition handling matches the reference: repeated transmissions of
    the same bit are *averaged*; untransmitted bits get LLR 0; filler
    positions get +max_llr (default 10*max|LLR| like the reference).
    """
    Ncb = info.N if Ncb is None else Ncb
    N = info.N
    E = llr_fe.shape[-1]
    k0 = get_k0(Ncb, info.bgn, rv, info.Zc)
    f0, f1 = info.Kd - 2 * info.Zc, info.K - 2 * info.Zc
    idx = ratematch_indices(E, Ncb, k0, f0, f1)
    # per-position repetition count over the E selected bits
    counts = np.bincount(idx, minlength=N).astype(np.float32)
    counts = np.maximum(counts, 1.0)
    ek = _deinterleave(llr_fe, Qm).astype(jnp.float32)
    acc = jnp.zeros(llr_fe.shape[:-1] + (N,), jnp.float32)
    acc = acc.at[..., jnp.asarray(idx)].add(ek)
    acc = acc / jnp.asarray(counts)
    if max_llr is None:
        max_llr = 10.0 * jnp.max(jnp.abs(llr_fe))
    if f1 > f0:
        fmask = np.zeros(N, np.bool_)
        fmask[f0:f1] = True
        acc = jnp.where(jnp.asarray(fmask), max_llr, acc)
    return acc
