"""Fading-channel regression tests (VERDICT r2 item 3).

Covers the stack the identity-channel E2E tests never touch:
  * sum-of-sinusoids Rayleigh statistics vs the Jakes model
    (reference py5gphy/channel_model/rayleigh_channel.py:13),
  * Kronecker spatial correlation of the assembled MIMO channel
    (nr_spatial_correlation_matrix.py:18, MIMO_fading_channel.py:7),
  * PDSCH TX -> fading channel -> RX decode with nonzero timing offset
    and carrier rho so TO/FO estimation
    (rx/channel_estimate.py timing_offset_est/freq_offset_est,
    reference nr_channel_estimation.py:150,224) runs on real
    impairments — the shape of the reference's statistical sweep
    (nr_pdsch/nr_pdsch.py:383-440: one-tap correlated MIMO + TDL).

All PRNG seeds are pinned, so pass/fail counts are deterministic.
"""
import numpy as np
import pytest

from python_5gtoolbox_tpu.models import channel as chan_mod
from python_5gtoolbox_tpu.utils.config import get_default_config, merged


# ---------------------------------------------------------------------------
# Channel-model statistics
# ---------------------------------------------------------------------------

def test_rayleigh_autocorrelation_bessel():
    """Tap autocorrelation ~ J0(2 pi f_m tau) (Jakes spectrum).

    Sum-of-sinusoids model I: E[cos(w tau cos theta)] over uniform
    theta is J0(w tau); with 30 sinusoids and 256 independent series
    the empirical autocorrelation tracks J0 to a few percent.
    """
    import jax
    from scipy.special import j0

    fs, fm, n = 1000.0, 30.0, 3000
    c = np.asarray(chan_mod.rayleigh_filters(
        jax.random.PRNGKey(5), n, fm, fs, 30, shape=(256,)))
    assert c.shape == (256, n)
    # power normalization: E|c|^2 = 2 by construction
    np.testing.assert_allclose(np.mean(np.abs(c) ** 2), 2.0, atol=0.1)
    lags = np.arange(0, 40)
    emp = np.array([
        np.mean(np.real(c[:, k:] * np.conj(c[:, : n - k]))) / 2.0
        for k in lags])
    theo = j0(2 * np.pi * fm * lags / fs)
    np.testing.assert_allclose(emp, theo, atol=0.06)


def test_kronecker_spatial_correlation():
    """Measured E[vec(H) vec(H)^H] of the mixed MIMO channel ~ Rspat."""
    import jax

    nt = nr = 2
    rspat = chan_mod.get_nr_mimo_rspat(nt, nr, "uniform", "DL",
                                       "customized", (0.9, 0.6))
    # fast fading (high fm vs fs) decorrelates samples quickly; ~1600
    # effectively-independent samples -> sigma ~ 0.03 per entry
    h = np.asarray(chan_mod.gen_mimo_channel(
        jax.random.PRNGKey(9), nt, nr, rspat, 40000, 1000.0, "Rayleigh",
        0.0, 0.0, 40.0, 30))                     # (n, Nr, Nt)
    # vec in the mixing order (Rspat index = t*Nr + r, kron(R_tx, R_rx))
    vec = np.transpose(h, (0, 2, 1)).reshape(h.shape[0], nt * nr)
    emp = vec[:, :, None] * np.conj(vec[:, None, :])
    emp = emp.mean(axis=0) / 2.0                 # E|tap|^2 = 2
    np.testing.assert_allclose(emp, rspat, atol=0.08)


def test_tdl_profile_power_delay():
    """TDL-A tap list: delays scale with DSdesired, powers match 38.901."""
    taps = chan_mod.get_tdl_model_config("TDL-A", 100.0, 10.0)
    assert len(taps) == 23
    delays = np.array([t[0] for t in taps])
    powers = np.array([t[1] for t in taps])
    assert delays[0] == 0.0
    # 38.901 Table 7.7.2-1: last normalized delay 9.6586 x DSdesired
    np.testing.assert_allclose(delays[-1], 965.86, atol=0.5)
    assert powers.min() < -20 and powers.max() <= 0.0
    assert all(t[2] == "Rayleigh" for t in taps)


# ---------------------------------------------------------------------------
# PDSCH end-to-end through fading channels with TO/FO impairments
# ---------------------------------------------------------------------------

def _pdsch_cfg():
    carrier = merged(get_default_config("dl_carrier"),
                     dict(num_of_ant=2, Nr=2, maxMIMO_layers=2, BW=20,
                          scs=30))
    cfg = get_default_config("pdsch")
    cfg["mcs_table"] = "64QAM"
    cfg["mcs_index"] = 5                  # QPSK, R~0.44: decode margin
    cfg["num_of_layers"] = 2
    cfg["ResAlloType1"]["RBSize"] = 51
    cfg["data_source"] = [1, 0, 0, 1]
    # 3 DMRS symbols so cross-symbol FO estimation is possible
    cfg["DMRS"]["DMRSAddPos"] = 2
    return carrier, cfg


# nonzero impairments: 50 ns timing offset exercises TO est/comp, and
# rho=1e-7 (384 Hz CFO at 3.84 GHz + timing drift Dm) exercises FO
# est/comp — within the estimator's unambiguous range for this DMRS
# spacing (~+-2.8 kHz).
_IMPAIR = dict(Timeoff_ns=50, rho=1e-7, fm_inHz=5)


def _run(chan_cfg, algos, n_slots, snr_db=20.0, seed=3):
    from scripts.internal.sim_pdsch_throughput_internal import (
        pdsch_before_ceq_processing, DEFAULT_LDPC_CONFIG)

    carrier, cfg = _pdsch_cfg()
    pd, slots = pdsch_before_ceq_processing(
        carrier, cfg, chan_cfg, -snr_db, n_slots=n_slots, seed=seed,
        ce_config=dict(L_symm_right_in_ns=500))
    out = {}
    fo = None
    for algo in algos:
        pd.rvidx = -1
        npass = ntot = 0
        for rx, H, cov, est, slot in slots:
            if H is None:
                continue
            ok, tb, _ = pd.RX_process(rx, slot, {"algo": algo}, H, cov,
                                      dict(DEFAULT_LDPC_CONFIG), est)
            if ok:
                np.testing.assert_array_equal(tb, pd.trblk)
            npass += int(ok)
            ntot += 1
            fo = est.FO_est
        out[algo] = (npass, ntot)
    return out, fo


def test_pdsch_rx_one_tap_rayleigh_correlated():
    """One-tap Rayleigh, medium-correlated 2x2 MIMO, TO+FO impairments,
    MMSE-IRC and ML-IRC-soft over 10 slots."""
    chan_cfg = chan_mod.gen_channel_model_config(
        model_format="customized",
        Rspat_config=("medium", "uniform", "DL", (0, 0)),
        Nt=2, Nr=2, multi_paths=[[0, 0, "Rayleigh", 0, 0]], **_IMPAIR)
    res, fo = _run(chan_cfg, ["MMSE-IRC", "ML-IRC-soft"], n_slots=10)
    # FO estimator must have locked near the injected 384 Hz CFO
    assert fo is not None and 200 < fo < 600, fo
    for algo, (npass, ntot) in res.items():
        assert ntot == 10
        assert npass >= 8, (algo, npass, ntot)


def test_pdsch_rx_tdl_a():
    """TDL-A (DS 100 ns, 23 Rayleigh taps), correlated 2x2, MMSE-IRC."""
    chan_cfg = chan_mod.gen_channel_model_config(
        model_format="TDL-A",
        Rspat_config=("medium", "uniform", "DL", (0, 0)),
        Nt=2, Nr=2, DSdesired=100, **_IMPAIR)
    res, fo = _run(chan_cfg, ["MMSE-IRC"], n_slots=10, seed=5)
    assert fo is not None and 200 < fo < 600, fo
    npass, ntot = res["MMSE-IRC"]
    assert ntot == 10
    assert npass >= 8, (npass, ntot)
