"""Pallas banded-conv / fused-DUC kernels vs the XLA reference paths.

Runs in interpreter mode on CPU (tests force jax_platforms=cpu), which
executes the kernels' REAL math including the manual bf16x3 precision
splits — so the tolerance here (1e-4) reflects genuine on-chip
accuracy, unlike XLA precision flags that CPU ignores (ADVICE r3 #3;
bench.py additionally spot-checks the same pair on the real chip
against an f64 upfirdn every run).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from python_5gtoolbox_tpu.ops import filters
from python_5gtoolbox_tpu.ops import pallas_filters as pf

TOL = 1.2e-4


@pytest.fixture(scope="module")
def x():
    rng = np.random.default_rng(7)
    t = 20000
    return jnp.asarray((rng.normal(size=(2, t))
                        + 1j * rng.normal(size=(2, t))
                        ).astype(np.complex64))


@pytest.fixture(scope="module")
def taps():
    return filters.fir_coeff(30, 100), filters.halfband_coeff()


def test_banded_same(x, taps):
    fir, _ = taps
    ref = np.asarray(filters.fir_same(x, fir))
    got = np.asarray(pf.banded_conv(x, fir, "same"))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < TOL


def test_banded_up2(x, taps):
    _, hb = taps
    ref = np.asarray(filters.hb_upsample2(x, hb))
    got = np.asarray(pf.banded_conv(x, hb, "up2"))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < TOL


def test_banded_down2(x, taps):
    _, hb = taps
    ref = np.asarray(filters.hb_downsample2(x, hb))
    got = np.asarray(pf.banded_conv(x, hb, "down2"))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < TOL


def test_fused_fir_up2(x, taps):
    fir, hb = taps
    ref = np.asarray(filters.hb_upsample2(filters.fir_same(x, fir), hb))
    got = np.asarray(pf.fir_up2_fused(x, fir, hb))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < TOL


def test_planar_chain_matches_complex_chain(taps):
    """tx_low_phy_planes + fir_up2_fused_planes == tx_low_phy +
    tx_channel_filter (the tx_lowphy_duc TPU path vs its fallback)."""
    from python_5gtoolbox_tpu.ops import ofdm

    fir, hb = taps
    scs, bw = 30, 100
    rng = np.random.default_rng(3)
    fd = jnp.asarray((rng.normal(size=(2, 1, 14, 12 * 273))
                      + 1j * rng.normal(size=(2, 1, 14, 12 * 273))
                      ).astype(np.complex64))
    td = ofdm.tx_low_phy(fd, scs, bw, int(3500e6), roll_ant=False)
    ref = np.asarray(filters.tx_channel_filter(
        td.reshape(2, -1), scs, bw, 245.76e6))
    t = ofdm.slot_sample_count(scs, bw)
    planes = ofdm.tx_low_phy_planes(fd, scs, bw, int(3500e6),
                                    pad=pf.fused_pad_spec(t))
    y = pf.fir_up2_fused_planes(planes, fir, hb, t)
    got = np.asarray(jax.lax.complex(y[:2], y[2:]))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < TOL


@pytest.mark.parametrize("scs,bw,prb,n_slots",
                         [(30, 100, 273, 2), (30, 40, 106, 2),
                          (15, 20, 106, 1)])
def test_duc_from_spec_planes_matches_fallback(scs, bw, prb, n_slots):
    """The fully fused spec->waveform kernel (in-kernel matmul IFFT +
    CP insertion + FIR + HB) == tx_low_phy + tx_channel_filter."""
    from python_5gtoolbox_tpu.ops import ofdm

    rng = np.random.default_rng(11)
    fd = jnp.asarray((rng.normal(size=(2, n_slots, 14, 12 * prb))
                      + 1j * rng.normal(size=(2, n_slots, 14, 12 * prb))
                      ).astype(np.complex64))
    td = ofdm.tx_low_phy(fd, scs, bw, int(3500e6), roll_ant=False)
    ref = np.asarray(filters.tx_channel_filter(
        td.reshape(2, -1), scs, bw, 245.76e6))
    nfft = ofdm.num.fft_size(prb)
    spec = ofdm.tx_spec_planes(fd, scs, bw, int(3500e6))
    yr, yi = pf.duc_from_spec_planes(
        spec, ofdm._cp_table(scs, nfft), filters.fir_coeff(scs, bw),
        filters.halfband_coeff(),
        ofdm._phase_comp(scs, nfft, int(3500e6)))
    for _ in range(int(np.log2(round(245.76e6
                                     / (nfft * scs * 1000)))) - 1):
        yr = pf.banded_conv_planes(yr, filters.halfband_coeff(), "up2")
        yi = pf.banded_conv_planes(yi, filters.halfband_coeff(), "up2")
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < TOL
