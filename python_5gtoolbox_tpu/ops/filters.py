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
    out = (re + 1j * im).astype(jnp.complex64)
    return out.reshape(lead + out.shape[-1:])


def fir_same(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """upfirdn(h, x)[h//2 : h//2+len] == centered 'same' convolution."""
    n = len(taps)
    return _conv1d(x, taps, (n // 2, n - 1 - n // 2))


def hb_upsample2(x: jnp.ndarray, taps: np.ndarray | None = None) -> jnp.ndarray:
    """upfirdn(h, x, up=2)[h//2-1 : h//2-1+2len] * sqrt(2).

    Exact offset convention of the reference's halfband DUC stage.
    """
    if taps is None:
        taps = halfband_coeff()
    n = len(taps)
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
    shift = 2 * ((n + 1) // 4)
    pl = (n - 1) - shift
    pr = shift - 1
    y = _conv1d(x, taps, (pl, pr), stride=2)
    return y * np.float32(np.sqrt(2))


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


def tx_channel_filter(td: jnp.ndarray, scs: int, bw: int,
                      out_rate_hz: float = 245.76e6) -> jnp.ndarray:
    """(..., T) at carrier rate -> (..., T * oversample) at out_rate_hz."""
    prb = num.carrier_prb_size(scs, bw)
    fs_in = num.fft_size(prb) * scs * 1000
    oversample = int(round(out_rate_hz / fs_in))
    assert 2 ** int(np.log2(oversample)) == oversample
    y = fir_same(td, fir_coeff(scs, bw))
    for _ in range(int(np.log2(oversample))):
        y = hb_upsample2(y)
    return y
