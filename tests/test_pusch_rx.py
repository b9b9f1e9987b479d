"""PUSCH receive path: separate parity vs reference + TX->RX round trips."""
import copy
import json

import numpy as np
import pytest

from tests.golden import get_golden
from tests.test_pusch import PUSCH_CASES, _mk_cfg

from python_5gtoolbox_tpu.phy import pusch as pusch_mod
from python_5gtoolbox_tpu.phy import pusch_rx as rx_mod
from python_5gtoolbox_tpu.phy.pusch import pusch_dmrs_symlist, ulsch_crc_segment
from python_5gtoolbox_tpu.phy.pusch_uci import get_ulsch_rm_info
from python_5gtoolbox_tpu.phy import tbsize as tbs_mod
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size

# UCI-bearing cases from the TX suite
UCI_CASE_IDS = [4, 5, 6]


def _gen_separate_goldens():
    from py5gphy.nr_pusch import (nr_pusch_datactrl_multiplex, nr_pusch_dmrs,
                                  nr_ulsch, nr_ulsch_info, ul_tbsize)
    base = json.load(open("/root/reference/py5gphy/nr_default_config/"
                          "default_pusch_config.json"))
    base["DMRS"]["transformPrecodingDisabled"]["NID0"] = 1
    base["DMRS"]["transformPrecodingDisabled"]["NID1"] = 1
    rng = np.random.default_rng(3)
    out = {}
    for i in UCI_CASE_IDS:
        cfg = _mk_cfg(base, PUSCH_CASES[i])
        tbsize, qm, rate = ul_tbsize.gen_tbsize(cfg)
        ld = cfg["StartSymbolIndex"] + cfg["NrOfSymbols"]
        symlist = nr_pusch_dmrs.get_DMRS_symlist(ld, cfg["DMRS"]["DMRSAddPos"])
        cbs, _, _ = nr_ulsch.ULSCH_Crc_CodeBlockSegment(
            np.zeros(tbsize, "i1"), tbsize, rate)
        ulsch_size = cbs.shape[0] * cbs.shape[1]
        ncdm = cfg["DMRS"]["NumCDMGroupsWithoutData"]
        data_re = 6 if ncdm == 1 else 0
        n_data = sum(
            cfg["ResAlloType1"]["RBSize"] * (data_re if (s in symlist)
                                             else 12)
            for s in range(cfg["StartSymbolIndex"], ld))
        g_total = qm * cfg["num_of_layers"] * n_data
        rm = nr_ulsch_info.getULSCH_RM_info(cfg, symlist, ulsch_size, qm,
                                            rate, g_total)
        llr = rng.normal(size=g_total).astype(np.float64)
        g_ulsch, g_ack, g_csi1, g_csi2 = \
            nr_pusch_datactrl_multiplex.data_control_separate(
                llr, cfg, symlist, rm, qm)
        out[f"llr_{i}"] = llr
        for name, arr in [("ulsch", g_ulsch), ("ack", g_ack),
                          ("csi1", g_csi1), ("csi2", g_csi2)]:
            out[f"{name}_{i}"] = np.asarray(arr, np.float64)
    return out


@pytest.fixture(scope="module")
def separate_goldens():
    return get_golden("pusch_separate", _gen_separate_goldens)


@pytest.mark.parametrize("i", UCI_CASE_IDS)
def test_data_control_separate_parity(separate_goldens, i):
    cfg = _mk_cfg(get_default_config("pusch"), PUSCH_CASES[i])
    tbsize, qm, rate = tbs_mod.ulsch_tbsize(cfg)
    ld = cfg["StartSymbolIndex"] + cfg["NrOfSymbols"]
    symlist = pusch_dmrs_symlist(ld, cfg["DMRS"]["DMRSAddPos"])
    _, info, _ = ulsch_crc_segment(np.zeros(tbsize, np.int8), tbsize, rate)
    llr = separate_goldens[f"llr_{i}"]
    rm = get_ulsch_rm_info(cfg, symlist, info.C * info.K, qm, rate, llr.size)
    g_ulsch, g_ack, g_csi1, g_csi2 = rx_mod.data_control_separate(
        llr, cfg, symlist, rm, qm)
    for name, arr in [("ulsch", g_ulsch), ("ack", g_ack),
                      ("csi1", g_csi1), ("csi2", g_csi2)]:
        np.testing.assert_array_equal(arr, separate_goldens[f"{name}_{i}"],
                                      err_msg=name)


# ---------------------------------------------------------------------------
# PUSCH TX -> AWGN -> RX end-to-end (our stack only)
# ---------------------------------------------------------------------------

def _run_tx_rx(case, snr_db=28.0, seed=11):
    from python_5gtoolbox_tpu.rx.channel_estimate import NrChannelEstimation

    rng = np.random.default_rng(seed)
    cfg = _mk_cfg(get_default_config("pusch"), case)
    nports = case[3]
    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=40, scs=30, num_of_ant=nports, Nr=nports))
    ch = pusch_mod.NrPUSCH(carrier, cfg)
    prb = carrier_prb_size(30, 40)
    fd = np.zeros((nports, 14 * 12 * prb), np.complex64)
    usage = np.zeros((nports, 14 * 12 * prb), np.int8)
    fd, usage = ch.process(fd, usage, 0)

    sigma = 10 ** (-snr_db / 20)
    rx = fd + sigma / np.sqrt(2) * (
        rng.normal(size=fd.shape) + 1j * rng.normal(size=fd.shape)
    ).astype(np.complex64)

    h_ls, rs_info = ch.H_LS_est(rx, 0)
    ce_cfg = dict(enable_TO_comp=True, enable_FO_est=True,
                  enable_FO_comp=True, CE_algo="DFT",
                  L_symm_left_in_ns=200, L_symm_right_in_ns=200, eRB=2)
    est = NrChannelEstimation(h_ls, rs_info, ce_cfg)
    H, cov = est.channel_est()

    ldpc_cfg = dict(L=16, algo="min-sum", alpha=1.0, beta=0.0)
    ch.rvidx = -1
    ok, tbblk, _, uci = ch.RX_process(rx, 0, {"algo": "MMSE-IRC"}, H, cov,
                                      ldpc_cfg, est)
    return ch, cfg, ok, tbblk, uci


def test_pusch_tx_rx_awgn_basic():
    ch, cfg, ok, tbblk, uci = _run_tx_rx(PUSCH_CASES[0])
    assert ok
    np.testing.assert_array_equal(tbblk, ch.trblk)
    assert uci == {}


def test_pusch_tx_rx_awgn_2layer():
    ch, cfg, ok, tbblk, uci = _run_tx_rx(PUSCH_CASES[2])
    assert ok
    np.testing.assert_array_equal(tbblk, ch.trblk)


def test_pusch_tx_rx_awgn_transform_precoding():
    ch, cfg, ok, tbblk, uci = _run_tx_rx(PUSCH_CASES[3])
    assert ok
    np.testing.assert_array_equal(tbblk, ch.trblk)


def test_pusch_tx_rx_awgn_uci_small():
    # 2-bit ACK on reserved positions (small-block special table)
    ch, cfg, ok, tbblk, uci = _run_tx_rx(PUSCH_CASES[4])
    assert ok
    np.testing.assert_array_equal(tbblk, ch.trblk)
    bits, crc_ok = uci["ack"]
    np.testing.assert_array_equal(bits, cfg["ACKbits"])


def test_pusch_tx_rx_awgn_uci_smallblock():
    # 5-bit ACK + 4-bit CSI1 (32,K) small-block ML decode
    ch, cfg, ok, tbblk, uci = _run_tx_rx(PUSCH_CASES[5])
    assert ok
    np.testing.assert_array_equal(tbblk, ch.trblk)
    np.testing.assert_array_equal(uci["ack"][0], cfg["ACKbits"])
    np.testing.assert_array_equal(uci["csi1"][0], cfg["CSI1bits"])


def test_pusch_tx_rx_awgn_uci_polar():
    # 14-bit ACK / 25-bit CSI1 (polar CA-SCL) + 4-bit CSI2 (small block)
    ch, cfg, ok, tbblk, uci = _run_tx_rx(PUSCH_CASES[6])
    assert ok
    np.testing.assert_array_equal(tbblk, ch.trblk)
    ack_bits, ack_ok = uci["ack"]
    csi1_bits, csi1_ok = uci["csi1"]
    assert ack_ok and csi1_ok
    np.testing.assert_array_equal(ack_bits, cfg["ACKbits"])
    np.testing.assert_array_equal(csi1_bits, cfg["CSI1bits"])
    np.testing.assert_array_equal(uci["csi2"][0], cfg["CSI2bits"])
