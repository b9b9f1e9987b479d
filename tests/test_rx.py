"""Receiver stack tests: demod/equalizer parity + PDSCH TX->RX end-to-end."""
import copy
import json

import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.rx import demod as demod_mod
from python_5gtoolbox_tpu.rx import equalize as eq_mod
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size


MODTYPES = ["bpsk", "pi/2-bpsk", "qpsk", "16qam", "64qam", "256qam",
            "1024qam"]


def _gen_demod_goldens():
    from py5gphy.demodulation import nr_Demodulation
    rng = np.random.default_rng(91)
    out = {}
    for i, mt in enumerate(MODTYPES):
        syms = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype("c8")
        nv = rng.uniform(0.1, 2.0, 64).astype("f")
        hard, llr = nr_Demodulation.nrDemodulate(syms.copy(), mt, nv.copy())
        out[f"sym_{i}"], out[f"nv_{i}"] = syms, nv
        out[f"hard_{i}"], out[f"llr_{i}"] = hard, llr
    return out


@pytest.fixture(scope="module")
def demod_goldens():
    return get_golden("demod_cases", _gen_demod_goldens)


@pytest.mark.parametrize("i", range(len(MODTYPES)))
def test_demod(demod_goldens, i):
    mt = MODTYPES[i]
    syms = demod_goldens[f"sym_{i}"]
    nv = demod_goldens[f"nv_{i}"]
    hard, llr = demod_mod.demodulate_np(syms, mt, np.repeat(nv, 1))
    # noise_var per symbol must broadcast per-bit like the reference
    qm = demod_mod._QM[mt]
    if qm > 1:
        nv_bits = np.repeat(nv, 1)
    np.testing.assert_allclose(llr, demod_goldens[f"llr_{i}"], rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_array_equal(hard, demod_goldens[f"hard_{i}"])


EQ_CASES = [
    ("ZF", 2, 2), ("ZF-IRC", 4, 2), ("MMSE", 2, 2), ("MMSE-IRC", 4, 2),
    ("MMSE", 4, 4),
]


def _gen_eq_goldens():
    from py5gphy.channel_equalization import nr_channel_eq
    rng = np.random.default_rng(93)
    out = {}
    for i, (algo, nr, nl) in enumerate(EQ_CASES):
        n = 16
        y = (rng.normal(size=(n, nr)) + 1j * rng.normal(size=(n, nr)))
        h = (rng.normal(size=(n, nr, nl)) + 1j * rng.normal(size=(n, nr, nl)))
        cov = np.zeros((n, nr, nr), complex)
        for m in range(n):
            a = (rng.normal(size=(nr, nr)) + 1j * rng.normal(size=(nr, nr)))
            cov[m] = a @ a.conj().T / 8 + 0.1 * np.eye(nr)
        s_all = np.zeros((n, nl), complex)
        nv_all = np.zeros((n, nl))
        llr_all = []
        for m in range(n):
            s, nv, hb, llr = nr_channel_eq.channel_equ_and_demod(
                y[m].copy(), h[m].copy(), cov[m].copy(), "16qam",
                {"algo": algo})
            s_all[m] = s.reshape(-1)
            nv_all[m] = np.real(nv).reshape(-1)
            llr_all.append(llr)
        out[f"y_{i}"], out[f"h_{i}"], out[f"cov_{i}"] = y, h, cov
        out[f"s_{i}"], out[f"nv_{i}"] = s_all, nv_all
        out[f"llr_{i}"] = np.concatenate(llr_all)
    return out


@pytest.fixture(scope="module")
def eq_goldens():
    return get_golden("equalize_cases", _gen_eq_goldens)


@pytest.mark.parametrize("i", range(len(EQ_CASES)))
def test_equalize(eq_goldens, i):
    algo, nr, nl = EQ_CASES[i]
    s, nv, hard, llr = eq_mod.channel_equ_and_demod(
        eq_goldens[f"y_{i}"], eq_goldens[f"h_{i}"], eq_goldens[f"cov_{i}"],
        "16qam", {"algo": algo})
    np.testing.assert_allclose(np.asarray(s), eq_goldens[f"s_{i}"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(nv), eq_goldens[f"nv_{i}"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(llr), eq_goldens[f"llr_{i}"],
                               rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# PDSCH TX -> AWGN -> RX end-to-end (our stack only; decode must succeed)
# ---------------------------------------------------------------------------

def test_pdsch_tx_rx_awgn():
    import jax
    from python_5gtoolbox_tpu.phy.pdsch import Pdsch
    from python_5gtoolbox_tpu.rx.channel_estimate import NrChannelEstimation

    rng = np.random.default_rng(7)
    carrier = merged(get_default_config("dl_carrier"),
                     dict(num_of_ant=2, Nr=2, maxMIMO_layers=2, BW=40,
                          scs=30))
    cfg = get_default_config("pdsch")
    cfg["mcs_table"] = "64QAM"
    cfg["mcs_index"] = 10
    cfg["num_of_layers"] = 2
    cfg["ResAlloType1"]["RBSize"] = 51
    cfg["data_source"] = [1, 0, 0, 1]
    ch = Pdsch(cfg, carrier)
    prb = carrier_prb_size(30, 40)
    n_sc = 12 * prb
    fd = np.zeros((2, 14 * n_sc), np.complex64)
    usage = np.zeros((2, 14 * n_sc), np.int8)
    fd, usage = ch.process(fd, usage, 0)

    # identity channel + mild AWGN
    snr_db = 25.0
    sigma = 10 ** (-snr_db / 20)
    rx = fd + sigma / np.sqrt(2) * (
        rng.normal(size=fd.shape) + 1j * rng.normal(size=fd.shape)
    ).astype(np.complex64)

    h_ls, rs_info = ch.H_LS_est(rx, 0)
    rs_info["scs"] = 30
    ce_cfg = dict(enable_TO_comp=True, enable_FO_est=True,
                  enable_FO_comp=True, CE_algo="DFT",
                  L_symm_left_in_ns=200, L_symm_right_in_ns=200, eRB=2)
    est = NrChannelEstimation(h_ls, rs_info, ce_cfg)
    H, cov = est.channel_est()

    ldpc_cfg = dict(L=16, algo="min-sum", alpha=1.0, beta=0.0)
    ch.rvidx = -1  # reset rv cycling for RX
    ok, tbblk, _ = ch.RX_process(rx, 0, {"algo": "MMSE-IRC"}, H, cov,
                                 ldpc_cfg, est)
    assert ok
    np.testing.assert_array_equal(tbblk, ch.trblk)
