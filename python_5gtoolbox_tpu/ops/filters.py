"""Channel filters: FIR + halfband up/down-sampling chains (DUC/DDC).

Behavior parity target: py5gphy/nr_lowphy/tx_lowphy_process.py:82-153
(remez FIR at 1x then log2(oversample) halfband x2 upsampling stages with
sqrt(2) gain, fixed output rate 245.76 Msps, ACLR < -45 dB) and
rx_lowphy_process.py:100-164 (the mirror-image decimation chain).

TPU design: coefficients are designed at plan time with scipy.signal.remez
(identical parameters -> identical taps). On device, filtering is
jax.lax.conv_general_dilated over the time axis, batched over antennas:
  * FIR "same" convolution == the reference's upfirdn + center slice;
  * x2 upsampling == lhs_dilation=2 with padding chosen to reproduce
    upfirdn's exact offset convention;
  * /2 decimation == window_strides=2.
All taps are symmetric (linear phase), so conv-vs-correlation orientation
is irrelevant; we still flip for exactness.

Performance: a single-channel 1-D conv cannot use the MXU (measured 22
Msamples/s for the full DUC on v5e — it lowers to a VPU sliding
window). For long inputs every stage therefore runs as a blocked
overlap-save MATMUL: frames of L output samples gather their
(halo-extended) input window and multiply one banded Toeplitz matrix
M[q, r] = taps_at(<mode-specific index>) on the MXU. Block/halo
geometry is identical to parallel/timeshard.py's (tested sample-exact);
the matmul reassociates float adds, so blocked-vs-direct differs by
~1e-6 (well inside the 2e-4 golden tolerance). Short inputs keep the
direct conv path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import remez

from python_5gtoolbox_tpu.utils import numerology as num

# FIR tap counts from the reference's offline filter search
# (tx_lowphy_process.py:108-122).
_FIR_NUMTAPS = {
    (30, 100): 287, (30, 90): 287, (30, 80): 287, (30, 70): 287,
    (30, 60): 287, (30, 50): 143, (30, 45): 143, (30, 40): 143,
    (30, 35): 143, (30, 30): 143, (30, 25): 71, (30, 20): 71,
    (30, 15): 87, (30, 10): 45, (30, 5): 27, (15, 5): 51, (15, 10): 87,
    (15, 15): 153, (15, 20): 143, (15, 25): 143, (15, 30): 287,
    (15, 35): 287, (15, 40): 287, (15, 45): 287, (15, 50): 287,
}
_HB_NUMTAPS = 55
_HB_FPASS = 0.21


@functools.lru_cache(maxsize=None)
def fir_coeff(scs: int, bw: int) -> np.ndarray:
    """Channel-filter FIR taps at the carrier native rate (plan time)."""
    prb = num.carrier_prb_size(scs, bw)
    nfft = num.fft_size(prb)
    fs = nfft * scs * 1000
    fpass = ((prb * 12 * scs + scs / 2) * 1000) / 2
    fstop = bw * 1e6 / 2
    numtaps = _FIR_NUMTAPS.get((scs, bw), 287)
    return remez(numtaps, [0, fpass, fstop, fs / 2], [1, 0], fs=fs)


@functools.lru_cache(maxsize=None)
def halfband_coeff() -> np.ndarray:
    return remez(_HB_NUMTAPS, [0, _HB_FPASS, 0.5 - _HB_FPASS, 0.5], [1, 0])


def _conv1d(x: jnp.ndarray, taps: np.ndarray, pad: tuple[int, int],
            lhs_dilation: int = 1, stride: int = 1) -> jnp.ndarray:
    """Complex 1-D convolution along the last axis via two real convs.

    x: (..., T). taps are real (flipped here so this is true convolution).
    """
    lead = x.shape[:-1]
    k = jnp.asarray(taps[::-1].copy(), jnp.float32)[None, None, :]
    def real_conv(r):
        r = r.reshape((-1, 1) + r.shape[-1:])
        out = jax.lax.conv_general_dilated(
            r, k, window_strides=(stride,), padding=[pad],
            lhs_dilation=(lhs_dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"))
        return out[:, 0, :]
    re = real_conv(jnp.real(x).astype(jnp.float32))
    im = real_conv(jnp.imag(x).astype(jnp.float32))
    out = jax.lax.complex(re, im).astype(jnp.complex64)
    return out.reshape(lead + out.shape[-1:])


# ---------------------------------------------------------------------------
# Blocked overlap-save matmul path (MXU)
# ---------------------------------------------------------------------------

_BLOCK_L = 512          # output samples per frame ("same"/up2 input L)
_MIN_BLOCKED_T = 4096   # below this, direct conv wins (no gather/pad cost)
_MIN_PALLAS_T = 65536   # below this the Pallas kernel's 512-frame grid
                        # block is mostly padding; XLA blocked path wins


def _use_pallas(t: int) -> bool:
    """Pallas banded-conv kernel: real TPU + large inputs only.

    Measured on v5e (round 4): the Pallas kernel (ops/pallas_filters.py,
    K=roundup(Lf+n-1,128) per 128-sample output frame, manual bf16x3)
    runs the 287-tap FIR in ~0.94 ms net vs ~1.5 ms for the XLA
    D-shifted GEMM, and the 55-tap halfband up2 in ~1.3 ms vs ~1.9.
    """
    import os
    if os.environ.get("PY5G_NO_PALLAS") == "1":
        return False
    if t < _MIN_PALLAS_T:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _taps_at(taps: np.ndarray, idx: np.ndarray) -> np.ndarray:
    n = len(taps)
    ok = (idx >= 0) & (idx < n)
    return np.where(ok, taps[np.clip(idx, 0, n - 1)], 0.0)


@functools.lru_cache(maxsize=None)
def _blocked_plan(taps_key: bytes, n: int, mode: str, L: int):
    """(hl, hr, M (B, L_out) f32) for one overlap-save stage.

    M[q, r] encodes the exact direct-path semantics (same offsets as
    fir_same / hb_upsample2 / hb_downsample2; halo geometry as
    parallel/timeshard.py):
      same : y[t] = sum_i x[i] * taps_at(t + n-1 - i)        hl=n//2
      up2  : y[t] = sum_i x[i] * taps_at(t + k + n-1 - 2i)*s2
      down2: y[t] = sum_i x[i] * taps_at(2t + n-1 - i)*s2
    with frame-local q = i - (m*L - hl), r = t - m*L_out.
    """
    taps = np.frombuffer(taps_key, np.float64)
    assert len(taps) == n
    q = np.arange(0, 0)  # placeholder for lints
    if mode == "same":
        hl, hr = n // 2, n - 1 - n // 2
        L_out, scale = L, 1.0
        B = L + hl + hr
        qq, rr = np.meshgrid(np.arange(B), np.arange(L_out), indexing="ij")
        M = _taps_at(taps, rr + n - 1 - qq)
    elif mode == "up2":
        off = n // 2 - 1
        pad_l = (n - 1) - off
        hl = -(-pad_l // 2)
        hr = -(-(n - 1 - pad_l) // 2) + 1
        k = 2 * hl - pad_l
        L_out, scale = 2 * L, np.sqrt(2)
        B = L + hl + hr
        qq, rr = np.meshgrid(np.arange(B), np.arange(L_out), indexing="ij")
        M = _taps_at(taps, rr + k + n - 1 - 2 * qq)
    elif mode == "down2":
        shift = 2 * ((n + 1) // 4)
        hl, hr = (n - 1) - shift, shift - 1
        assert L % 2 == 0
        L_out, scale = L // 2, np.sqrt(2)
        B = L + hl + hr
        qq, rr = np.meshgrid(np.arange(B), np.arange(L_out), indexing="ij")
        M = _taps_at(taps, 2 * rr + n - 1 - qq)
    else:
        raise ValueError(mode)
    return hl, hr, (M * scale).astype(np.float32)


def _blocked_conv(x: jnp.ndarray, taps: np.ndarray, mode: str,
                  L: int | None = None) -> jnp.ndarray:
    """Block-Toeplitz convolution as D shifted GEMMs (complex via planes).

    The banded Toeplitz M (B, L_out) from _blocked_plan is split along
    its input axis into D = ceil(B/L) chunks M_d; frame m's output is
    sum_d Xb[m + d] @ M_d where Xb is simply the padded input reshaped
    to (nf + D, L) — a shifted SLICE per term, so no overlapping-frames
    materialization pass at all (the previous frames+single-GEMM
    version spent ~40% of its runtime building the (..., nf, B) frame
    tensor). FLOPs per output sample are D*L ~= L + n - 1 either way.
    """
    n = len(taps)
    if L is None:
        # small L keeps D*L (per-output MACs) near the tap count; 128
        # matches the MXU tile so M_d chunks stay full-lane. Measured
        # on v5e: 55-tap HB fastest at 128, 287-tap FIR at 512.
        L = 128 if n <= 256 else 512
    hl, hr, M = _blocked_plan(
        np.ascontiguousarray(taps, np.float64).tobytes(), n, mode, L)
    B = L + hl + hr
    L_out = M.shape[1]
    D = -(-B // L)
    T = x.shape[-1]
    lead = x.shape[:-1]
    nf = -(-T // L)
    xpad = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                   + [(hl, (nf + D) * L - T - hl)])
    planes = jnp.stack([jnp.real(xpad), jnp.imag(xpad)]).astype(jnp.float32)
    xb = planes.reshape(planes.shape[:-1] + (nf + D, L))
    y = None
    for d in range(D):
        md = np.zeros((L, L_out), np.float32)
        md[: min(L, B - d * L)] = M[d * L: (d + 1) * L]
        term = jax.lax.dot_general(
            jax.lax.slice_in_dim(xb, d, d + nf, axis=-2),
            jnp.asarray(md),
            (((xb.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH)                 # (2,...,nf,Lo)
        y = term if y is None else y + term
    out = jax.lax.complex(y[0], y[1]).astype(jnp.complex64)
    out = out.reshape(lead + (-1,))
    n_out = {"same": T, "up2": 2 * T, "down2": T // 2}[mode]
    return out[..., :n_out]


def fir_same(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """upfirdn(h, x)[h//2 : h//2+len] == centered 'same' convolution."""
    n = len(taps)
    if _use_pallas(x.shape[-1]):
        from python_5gtoolbox_tpu.ops.pallas_filters import banded_conv
        return banded_conv(x, taps, "same")
    if x.shape[-1] >= _MIN_BLOCKED_T:
        return _blocked_conv(x, taps, "same")
    return _conv1d(x, taps, (n // 2, n - 1 - n // 2))


def hb_upsample2(x: jnp.ndarray, taps: np.ndarray | None = None) -> jnp.ndarray:
    """upfirdn(h, x, up=2)[h//2-1 : h//2-1+2len] * sqrt(2).

    Exact offset convention of the reference's halfband DUC stage.
    """
    if taps is None:
        taps = halfband_coeff()
    n = len(taps)
    if _use_pallas(x.shape[-1]):
        from python_5gtoolbox_tpu.ops.pallas_filters import banded_conv
        return banded_conv(x, taps, "up2")
    if x.shape[-1] >= _MIN_BLOCKED_T:
        return _blocked_conv(x, taps, "up2")
    off = n // 2 - 1
    # full conv of the 2x zero-stuffed signal has length 2T-1+n-1;
    # pad so the output is exactly [off : off + 2T].
    pl = (n - 1) - off
    pr = (n - 1) - (n - 2 - off)
    return _conv1d(x, taps, (pl, pr), lhs_dilation=2) * np.float32(np.sqrt(2))


def hb_downsample2(x: jnp.ndarray, taps: np.ndarray | None = None) -> jnp.ndarray:
    """upfirdn(h, x, down=2)[(n+1)//4 : (n+1)//4 + T//2] * sqrt(2).

    Exact offset convention of the reference's halfband DDC stage
    (rx_lowphy_process.py:124-133): y[k] = fullconv[2k + 2*(n+1)//4].
    """
    if taps is None:
        taps = halfband_coeff()
    n = len(taps)
    if x.shape[-1] % 2 == 0 and _use_pallas(x.shape[-1]):
        from python_5gtoolbox_tpu.ops.pallas_filters import banded_conv
        return banded_conv(x, taps, "down2")
    if x.shape[-1] >= _MIN_BLOCKED_T and x.shape[-1] % 2 == 0:
        return _blocked_conv(x, taps, "down2")
    shift = 2 * ((n + 1) // 4)
    pl = (n - 1) - shift
    pr = shift - 1
    y = _conv1d(x, taps, (pl, pr), stride=2)
    return y * np.float32(np.sqrt(2))


@functools.partial(jax.jit, static_argnames=("scs", "bw", "in_rate_hz"))
def rx_channel_filter(rx: jnp.ndarray, scs: int, bw: int,
                      in_rate_hz: float) -> jnp.ndarray:
    """DDC: halfband /2 stages then FIR at carrier rate (rx_lowphy:100-164)."""
    prb = num.carrier_prb_size(scs, bw)
    fs_out = num.fft_size(prb) * scs * 1000
    oversample = int(round(in_rate_hz / fs_out))
    assert 2 ** int(np.log2(oversample)) == oversample
    y = rx
    for _ in range(int(np.log2(oversample))):
        y = hb_downsample2(y)
    return fir_same(y, fir_coeff(scs, bw))


@functools.partial(jax.jit, static_argnames=("scs", "bw",
                                             "carrier_freq_hz",
                                             "out_rate_hz", "as_planes",
                                             "slot_phase", "start_slot"))
def tx_lowphy_duc(fd_ant_major: jnp.ndarray, scs: int, bw: int,
                  carrier_freq_hz: int = 0,
                  out_rate_hz: float = 245.76e6,
                  as_planes: bool = False,
                  slot_phase: bool = False,
                  start_slot: int = 0) -> jnp.ndarray:
    """Full TX low-PHY + DUC: (ant, slots, 14, n_sc) frequency grids ->
    (ant, oversample * slots * slot_samples) waveform.

    Applies NO antenna ifftshift roll (pre-roll fd for reference
    parity; see ofdm.tx_low_phy roll_ant). On TPU the whole chain runs
    planar: the OFDM output pass fuses phase-comp + CP concat +
    complex->planar + the fused-DUC halo padding, and the FIR+first-HB
    run as one Pallas kernel — on this bandwidth-limited chip that
    removes three full-waveform HBM passes vs composing tx_low_phy and
    tx_channel_filter. as_planes=True returns (2*ant, T) f32 planes
    (real planes first) and skips the final planar->complex relayout.
    """
    from python_5gtoolbox_tpu.ops import ofdm

    nant, n_slots = fd_ant_major.shape[0], fd_ant_major.shape[1]
    prb = num.carrier_prb_size(scs, bw)
    fs_in = num.fft_size(prb) * scs * 1000
    oversample = int(round(out_rate_hz / fs_in))
    assert 2 ** int(np.log2(oversample)) == oversample
    n_hb = int(np.log2(oversample))
    t = n_slots * ofdm.slot_sample_count(scs, bw)
    if n_hb >= 1 and _use_pallas(t):
        from python_5gtoolbox_tpu.ops import pallas_filters as pf
        nfft = num.fft_size(prb)
        cps = ofdm._cp_table(scs, nfft)
        if nfft >= 1024:
            # fully fused path: the Pallas kernel computes the IFFT
            # itself (two-stage MXU matmul DFT), so the host pass is
            # just pad + planar split — no FFT custom-call relayouts,
            # no CP concat, no frame-layout copies
            spec = ofdm.tx_spec_planes(fd_ant_major, scs, bw,
                                       carrier_freq_hz,
                                       slot_phase=slot_phase,
                                       start_slot=start_slot)
            yr, yi = pf.duc_from_spec_planes(
                spec, cps, fir_coeff(scs, bw), halfband_coeff(),
                ofdm._phase_comp(scs, nfft, carrier_freq_hz))
            for _ in range(n_hb - 1):
                yr = pf.banded_conv_planes(yr, halfband_coeff(), "up2")
                yi = pf.banded_conv_planes(yi, halfband_coeff(), "up2")
            if as_planes == "split":
                return yr, yi
            if as_planes:
                return jnp.concatenate([yr, yi], axis=0)
            return jax.lax.complex(yr, yi).astype(jnp.complex64)
        symp = ofdm.tx_low_phy_sym_planes(fd_ant_major, scs, bw,
                                          carrier_freq_hz,
                                          slot_phase=slot_phase,
                                          start_slot=start_slot,
                                          idft="fft")
        y = pf.fir_up2_fused_symbols(symp, cps,
                                     fir_coeff(scs, bw),
                                     halfband_coeff())
        for _ in range(n_hb - 1):
            y = pf.banded_conv_planes(y, halfband_coeff(), "up2")
        if as_planes == "split":
            return y[:nant], y[nant:]
        if as_planes:
            return y
        return jax.lax.complex(y[:nant], y[nant:]).astype(jnp.complex64)
    td = ofdm.tx_low_phy(fd_ant_major, scs, bw, carrier_freq_hz,
                         roll_ant=False)
    if slot_phase:
        ph = ofdm._slot_phase_const(scs, carrier_freq_hz, n_slots,
                                    start_slot)
        td = td * jnp.asarray(ph)[None, :, None]
    out = tx_channel_filter(td.reshape(nant, -1), scs, bw, out_rate_hz)
    if as_planes == "split":
        return (jnp.real(out).astype(jnp.float32),
                jnp.imag(out).astype(jnp.float32))
    if as_planes:
        return jnp.concatenate([jnp.real(out), jnp.imag(out)]
                               ).astype(jnp.float32)
    return out


@functools.partial(jax.jit, static_argnames=("scs", "bw", "out_rate_hz"))
def tx_channel_filter(td: jnp.ndarray, scs: int, bw: int,
                      out_rate_hz: float = 245.76e6) -> jnp.ndarray:
    """(..., T) at carrier rate -> (..., T * oversample) at out_rate_hz."""
    prb = num.carrier_prb_size(scs, bw)
    fs_in = num.fft_size(prb) * scs * 1000
    oversample = int(round(out_rate_hz / fs_in))
    assert 2 ** int(np.log2(oversample)) == oversample
    n_hb = int(np.log2(oversample))
    if n_hb >= 1 and _use_pallas(td.shape[-1]):
        # FIR + first halfband fused in one Pallas pass (the 1x-rate
        # intermediate never touches HBM)
        from python_5gtoolbox_tpu.ops.pallas_filters import fir_up2_fused
        y = fir_up2_fused(td, fir_coeff(scs, bw), halfband_coeff())
        n_hb -= 1
    else:
        y = fir_same(td, fir_coeff(scs, bw))
    for _ in range(n_hb):
        y = hb_upsample2(y)
    return y
