"""OFDM Tx/Rx low-PHY: IFFT + CP + phase compensation, TS 38.211 5.3.1.

Behavior parity target: py5gphy/nr_lowphy/tx_lowphy_process.py:10-80
(center-mapped ifftshift IFFT with sqrt(N) scaling, CP prepend, per-symbol
carrier phase compensation, optional fractional-timing phase ramp Dm) and
rx_lowphy_process.py:35-98 (half-CP-shifted FFT window).

TPU design: slots are a leading batch axis; all 14 symbols IFFT in one
batched XLA FFT; CP insertion is a single static gather; per-symbol phase
compensation factors are plan-time complex scalars. No per-symbol Python
loop on the device path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from python_5gtoolbox_tpu.utils import numerology as num


@functools.lru_cache(maxsize=None)
def _cp_table(scs: int, nfft: int) -> np.ndarray:
    if scs == 15:
        base = np.array([320] + [288] * 6 + [320] + [288] * 6)
    else:
        base = np.array([352] + [288] * 13)
    return (base * nfft // 4096).astype(np.int64)


@functools.lru_cache(maxsize=None)
def _phase_comp(scs: int, nfft: int, carrier_freq_hz: int) -> np.ndarray:
    """Per-symbol phase compensation e^{-j2πΔ(t_off+CP)} (tx_lowphy:72-75)."""
    cps = _cp_table(scs, nfft)
    fs = nfft * scs * 1000
    out = np.ones(14, np.complex64)
    if carrier_freq_hz:
        delta = carrier_freq_hz / fs
        off = 0
        for m in range(14):
            out[m] = np.exp(-1j * 2 * np.pi * delta * (off + cps[m]))
            off += cps[m] + nfft
    return out


def slot_sample_count(scs: int, bw: int) -> int:
    nfft = num.fft_size(num.carrier_prb_size(scs, bw))
    return int(_cp_table(scs, nfft).sum()) + 14 * nfft


@functools.partial(jax.jit, static_argnames=("scs", "bw",
                                             "carrier_freq_hz", "nfft",
                                             "roll_ant"))
def tx_low_phy(fd_slots: jnp.ndarray, scs: int, bw: int,
               carrier_freq_hz: int = 0, dm: jnp.ndarray | None = None,
               nfft: int | None = None, roll_ant: bool = True
               ) -> jnp.ndarray:
    """(..., ant, 14, n_sc) frequency grid -> (..., ant, slot_samples).

    dm: optional (..., 14) per-symbol fractional timing error (seconds)
        applied as a frequency-domain phase ramp (channel-sim impairment).

    Jitted entry: the complex phase-comp constants and the `1j` ramp
    literal must live INSIDE a traced program — eagerly they would
    cross the axon host->device boundary as complex buffers (see
    utils/host.py). Calling this from an outer jit simply inlines.
    """
    n_sc = fd_slots.shape[-1]
    if nfft is None:
        nfft = num.fft_size(num.carrier_prb_size(scs, bw))
    x = fd_slots.astype(jnp.complex64)
    if dm is not None:
        k = jnp.arange(n_sc, dtype=jnp.float32)
        ramp = jnp.exp(1j * 2 * jnp.pi * k * (scs * 1000.0)
                       * dm[..., None, :, None].astype(jnp.float32))
        # dm broadcast: (..., 14) -> (..., 1, 14, 1) over (ant, sym, sc)
        x = x * ramp.astype(jnp.complex64)
    lo = (nfft - n_sc) // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(lo, nfft - n_sc - lo)]
    spec = jnp.pad(x, pad)
    # The reference calls ifftshift without axes on its (ant, nfft)
    # buffer (tx_lowphy_process.py:63), which also rolls the ANTENNA
    # axis by nant//2 — a pure antenna permutation that its Rx side
    # undoes. Replicated for waveform-level parity.
    # (roll_ant=False lets antenna-major batched callers skip it — axis
    # -3 is then NOT the antenna axis — and apply the equivalent input
    # permutation themselves)
    nant = spec.shape[-3]
    if roll_ant and nant > 1:
        spec = jnp.roll(spec, -(nant // 2), axis=-3)
    # ifftshift (circular shift by nfft/2) folded into the output as a
    # (-1)^m sign: ifft(roll(X, -N/2))[m] == ifft(X)[m] * (-1)^m for
    # even N — saves a full 63 MB roll pass; the sign rides the
    # phase-comp multiply for free (XLA fuses the elementwise chain).
    td = jnp.fft.ifft(spec, axis=-1)
    sign = np.ones(nfft, np.float32)
    sign[1::2] = -1.0
    td = td * (jnp.asarray(sign * np.sqrt(nfft))
               * jnp.asarray(_phase_comp(scs, nfft, carrier_freq_hz)
                             )[:, None])
    # CP insertion as static slices + one concat (NOT a gather: XLA
    # lowers a 14*nfft-point gather to a serialized ~1-element/cycle
    # loop on TPU, which dominated the whole OFDM stage)
    parts = []
    cps = _cp_table(scs, nfft)
    for m in range(14):
        sym = jax.lax.slice_in_dim(td, m, m + 1, axis=-2)
        parts.append(jax.lax.slice_in_dim(
            sym, nfft - int(cps[m]), nfft, axis=-1))
        parts.append(sym)
    out = jnp.concatenate([p.reshape(p.shape[:-2] + (-1,)) for p in parts],
                          axis=-1)
    return out.astype(jnp.complex64)


@functools.lru_cache(maxsize=None)
def _idft_mats(nfft: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two-stage matmul IDFT constants (E2, Tw, E1) for nfft = N1*N2.

    ifft(x)[t] * sqrt(nfft) * (-1)^t ==
        (E1 @ ((x.reshape(N2, N1).T @ E2.T).T? -- see tx_low_phy_planes)
    with k = k2*N1 + k1, t = t1*N2 + t2:
        Y[k1, t2] = sum_k2 S[k2, k1] * E2[k2, t2]
        Z[t1, t2] = sum_k1 E1[t1, k1] * Tw[k1, t2] * Y[k1, t2]
    Both contractions are MXU matmuls and the output (t1, t2) axes
    flatten to contiguous time with NO transpose — this replaces the
    XLA FFT custom-call whose mandatory input/output relayout copies
    were 1.07 ms of the 3.49 ms DUC step (out/duc_trace_r05.json).
    The ifftshift (-1)^t sign ((-1)^{t2} since N2 is even) and the
    1/sqrt(nfft) net scale are folded into E2 / E1.
    """
    k = int(np.log2(nfft))
    assert 2 ** k == nfft and k >= 8
    n2 = 128          # lane dim: both reshapes stay free bitcasts
    n1 = nfft // n2
    sign2 = np.where(np.arange(n2) % 2 == 0, 1.0, -1.0)
    # k = k1*n2 + k2, t = t1*n2 + t2 (both minor dims = n2 = 128 lanes)
    e_in = np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n2))
                  / n1)                                     # [k1, t2]
    tw = np.exp(2j * np.pi * np.outer(np.arange(n2), np.arange(n2))
                / nfft) * sign2[None, :]                    # [k2, t2]
    e_out = np.exp(2j * np.pi * np.outer(np.arange(n1), np.arange(n2))
                   / n1) / (nfft / np.sqrt(nfft))           # [t1, k2]
    return (e_in.astype(np.complex64), tw.astype(np.complex64),
            e_out.astype(np.complex64))


def _matmul_idft(spec: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """(..., nfft) center-ifftshifted IDFT * sqrt(nfft):
    equals jnp.fft.ifft(spec) * sqrt(nfft) * (-1)^t, time-contiguous."""
    e_in, tw, e_out = _idft_mats(nfft)
    n1 = nfft // 128
    s = spec.reshape(spec.shape[:-1] + (n1, 128))
    prec = jax.lax.Precision.HIGH
    y = jnp.einsum("...kb,kt->...bt", s, jnp.asarray(e_in),
                   precision=prec)
    y = y * jnp.asarray(tw)
    z = jnp.einsum("pk,...kt->...pt", jnp.asarray(e_out), y,
                   precision=prec)
    return z.reshape(spec.shape[:-1] + (nfft,))


@functools.lru_cache(maxsize=None)
def _slot_phase_const(scs: int, carrier_freq_hz: int, n_slots: int,
                      start_slot: int) -> np.ndarray:
    """Per-slot phase compensation e^{-j2pi fc t_slot}
    (nr_dl_waveform.py:91-100) as a trace-time constant."""
    idx = start_slot + np.arange(n_slots)
    if not carrier_freq_hz:
        return np.ones(n_slots, np.complex64)
    per_ms = carrier_freq_hz / 1e3
    slot_ms = 1.0 if scs == 15 else 0.5
    return np.exp(-1j * 2 * np.pi * per_ms * slot_ms * idx
                  ).astype(np.complex64)


@functools.partial(jax.jit, static_argnames=("scs", "bw",
                                             "carrier_freq_hz", "nfft",
                                             "pad", "slot_phase",
                                             "start_slot"))
def tx_low_phy_planes(fd_slots: jnp.ndarray, scs: int, bw: int,
                      carrier_freq_hz: int = 0,
                      nfft: int | None = None,
                      pad: tuple[int, int] = (0, 0),
                      slot_phase: bool = False,
                      start_slot: int = 0) -> jnp.ndarray:
    """Antenna-major planar tx_low_phy: (ant, slots, 14, n_sc) complex
    -> (2*ant, pad[0] + slots*slot_samples + pad[1]) float32 planes
    (real planes first).

    Same math as tx_low_phy(roll_ant=False) but the per-symbol
    sign/phase-comp multiply, the CP-insert concat, the complex->planar
    relayout and the caller's zero-padding all fuse into the single
    output-concat pass — on a bandwidth-limited chip each avoided 63 MB
    pass is ~0.2 ms (the c64 waveform pipeline otherwise spends more
    time in copies than in the FFT itself). Callers that need the
    reference's ifftshift antenna roll apply it to fd_slots beforehand.
    """
    n_sc = fd_slots.shape[-1]
    if nfft is None:
        nfft = num.fft_size(num.carrier_prb_size(scs, bw))
    x = fd_slots.astype(jnp.complex64)
    if slot_phase:
        # slot-level phase compensation folded pre-IFFT (linear), so
        # the waveform layer's separate 63 MB multiply pass disappears
        ph = _slot_phase_const(scs, carrier_freq_hz, fd_slots.shape[1],
                               start_slot)
        x = x * jnp.asarray(ph)[None, :, None, None]
    lo = (nfft - n_sc) // 2
    spec = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lo, nfft - n_sc - lo)])
    td = jnp.fft.ifft(spec, axis=-1)
    sign = np.ones(nfft, np.float32)
    sign[1::2] = -1.0
    sp = (sign * np.sqrt(nfft)).astype(np.complex64) \
        * np.asarray(_phase_comp(scs, nfft, carrier_freq_hz))[:, None]
    re = jnp.real(td) * jnp.asarray(sp.real) \
        - jnp.imag(td) * jnp.asarray(sp.imag)
    im = jnp.real(td) * jnp.asarray(sp.imag) \
        + jnp.imag(td) * jnp.asarray(sp.real)
    nant = fd_slots.shape[0]
    n_slots = fd_slots.shape[1]
    cps = _cp_table(scs, nfft)

    def cp_concat(plane):
        parts = []
        for m in range(14):
            sym = jax.lax.slice_in_dim(plane, m, m + 1, axis=-2)
            parts.append(jax.lax.slice_in_dim(
                sym, nfft - int(cps[m]), nfft, axis=-1))
            parts.append(sym)
        flat = jnp.concatenate(
            [p.reshape(p.shape[:-2] + (-1,)) for p in parts], axis=-1)
        flat = flat.reshape(nant, -1)          # (ant, slots*slot_samples)
        return jnp.pad(flat, ((0, 0), pad))

    return jnp.concatenate([cp_concat(re), cp_concat(im)], axis=0)


@functools.partial(jax.jit, static_argnames=("scs", "bw",
                                             "carrier_freq_hz", "nfft",
                                             "slot_phase", "start_slot",
                                             "idft"))
def tx_low_phy_sym_planes(fd_slots: jnp.ndarray, scs: int, bw: int,
                          carrier_freq_hz: int = 0,
                          nfft: int | None = None,
                          slot_phase: bool = False,
                          start_slot: int = 0,
                          idft: str = "fft") -> jnp.ndarray:
    """Antenna-major per-SYMBOL tx_low_phy: (ant, slots, 14, n_sc)
    complex -> (2*ant, slots, 14, nfft) float32 planes (real planes
    first) of the scaled/phase-compensated IFFT outputs, WITHOUT CP
    insertion — CP assembly happens inside the consuming Pallas DUC
    kernel (pallas_filters.fir_up2_fused_symbols), so the CP concat,
    its padding and the frame-layout copy never hit HBM.

    Same math as tx_low_phy_planes up to (and excluding) cp_concat.
    idft='matmul' uses the two-stage MXU DFT; 'fft' the XLA FFT.
    """
    n_sc = fd_slots.shape[-1]
    if nfft is None:
        nfft = num.fft_size(num.carrier_prb_size(scs, bw))
    x = fd_slots.astype(jnp.complex64)
    if slot_phase:
        ph = _slot_phase_const(scs, carrier_freq_hz, fd_slots.shape[1],
                               start_slot)
        x = x * jnp.asarray(ph)[None, :, None, None]
    lo = (nfft - n_sc) // 2
    spec = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lo, nfft - n_sc - lo)])
    if idft == "matmul":
        td = _matmul_idft(spec, nfft)
        sp = np.asarray(_phase_comp(scs, nfft, carrier_freq_hz)
                        )[:, None].astype(np.complex64)
    else:
        td = jnp.fft.ifft(spec, axis=-1)
        sign = np.ones(nfft, np.float32)
        sign[1::2] = -1.0
        sp = (sign * np.sqrt(nfft)).astype(np.complex64) \
            * np.asarray(_phase_comp(scs, nfft, carrier_freq_hz))[:, None]
    re = jnp.real(td) * jnp.asarray(sp.real) \
        - jnp.imag(td) * jnp.asarray(sp.imag)
    im = jnp.real(td) * jnp.asarray(sp.imag) \
        + jnp.imag(td) * jnp.asarray(sp.real)
    return jnp.concatenate([re, im], axis=0)


@functools.partial(jax.jit, static_argnames=("scs", "bw", "nfft",
                                             "slot_phase",
                                             "carrier_freq_hz",
                                             "start_slot"))
def tx_spec_planes(fd_slots: jnp.ndarray, scs: int, bw: int,
                   carrier_freq_hz: int = 0, nfft: int | None = None,
                   slot_phase: bool = False,
                   start_slot: int = 0) -> jnp.ndarray:
    """(ant, slots, 14, n_sc) complex grid -> (2*ant, slots,
    14*nfft/128, 128) f32 padded-spec planes (real planes first) for
    the fully fused Pallas DUC (pallas_filters.duc_from_spec_planes),
    which performs the IFFT itself. Only the center padding, the
    optional slot-phase fold and the complex->planar split happen here
    (one fused elementwise pass)."""
    n_sc = fd_slots.shape[-1]
    if nfft is None:
        nfft = num.fft_size(num.carrier_prb_size(scs, bw))
    x = fd_slots.astype(jnp.complex64)
    if slot_phase:
        ph = _slot_phase_const(scs, carrier_freq_hz, fd_slots.shape[1],
                               start_slot)
        x = x * jnp.asarray(ph)[None, :, None, None]
    lo = (nfft - n_sc) // 2
    spec = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lo, nfft - n_sc - lo)])
    nant, n_slots = fd_slots.shape[0], fd_slots.shape[1]
    planes = jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=0)
    return planes.reshape(2 * nant, n_slots, 14 * nfft // 128, 128)


@functools.partial(jax.jit, static_argnames=("scs", "bw",
                                             "carrier_freq_hz", "nfft",
                                             "n_sc"))
def rx_low_phy(td_slots: jnp.ndarray, scs: int, bw: int,
               carrier_freq_hz: int = 0,
               nfft: int | None = None, n_sc: int | None = None
               ) -> jnp.ndarray:
    """(..., ant, slot_samples) -> (..., ant, 14, n_sc) frequency grid.

    Uses the reference's half-CP-advanced FFT window: take the last CP/2
    CP samples plus the first N-CP/2 data samples, then undo the CP/2
    advance with a frequency-domain phase ramp (rx_lowphy_process.py:72-94).
    """
    if nfft is None:
        nfft = num.fft_size(num.carrier_prb_size(scs, bw))
    if n_sc is None:
        n_sc = 12 * num.carrier_prb_size(scs, bw)
    cps = _cp_table(scs, nfft)
    half = int(cps[1]) // 2  # half of the SHORT CP, same for every symbol
    # slice each symbol's FFT window (advanced by half a short CP);
    # static slices + stack instead of a gather (see tx_low_phy note)
    wins = []
    off = 0
    for m in range(14):
        cp = int(cps[m])
        start = off + cp - half
        wins.append(jax.lax.slice_in_dim(td_slots, start, start + nfft,
                                         axis=-1))
        off += cp + nfft
    win = jnp.stack(wins, axis=-2)                  # (..., ant, 14, nfft)
    # undo per-symbol tx phase compensation
    pc = _phase_comp(scs, nfft, carrier_freq_hz)
    win = win * jnp.asarray(np.conj(pc))[:, None]
    spec = jnp.fft.fft(win, axis=-1) / np.sqrt(nfft)
    spec = jnp.fft.fftshift(spec, axes=-1)
    # undo the reference's antenna-axis roll (see tx_low_phy); its Rx
    # fftshift also runs over all axes (rx_lowphy_process.py:90)
    nant = spec.shape[-3]
    if nant > 1:
        spec = jnp.roll(spec, nant // 2, axis=-3)
    lo = (nfft - n_sc) // 2
    spec = spec[..., lo: lo + n_sc]
    # phase ramp undoing the half-CP time advance (post-fftshift indexing)
    ramp = np.exp(1j * 2 * np.pi * half * (lo + np.arange(n_sc)) / nfft)
    return (spec * jnp.asarray(ramp.astype(np.complex64))).astype(jnp.complex64)
