"""HARQ retransmission sweep: batched RX chain == per-slot outcomes.

VERDICT r4 item 3: the slot-batched RX must carry the (S, C, N) LLR
buffer across rv-cycled transmissions (reference chain
py5gphy/nr_pdsch/nr_dlsch_decode.py:72-88). This test runs a 4-rv HARQ
cycle end to end (TX -> AWGN channel -> RX) at an SNR where the first
transmission fails and soft combining recovers, and pins the batched
chain's per-transmission outcomes to the per-slot RX_process chain.
"""
import numpy as np
import pytest

from python_5gtoolbox_tpu.models import channel as chan_mod
from python_5gtoolbox_tpu.phy.pdsch import Pdsch
from python_5gtoolbox_tpu.rx.channel_estimate import NrChannelEstimation
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size, fft_size
from python_5gtoolbox_tpu.waveform import dl as dl_wf
from python_5gtoolbox_tpu.waveform import rx as rx_wf

RV_CYCLE = [0, 2, 3, 1]
# noise power (dB) for the AWGN cell: calibrated so the first
# transmission fails at every slot and the rv-2 combine decodes
# (measured window: -3 -> tx0/tx1 fail; -5..-7 -> tx0 fails, tx1+ pass)
SNR_DB = -6.0
S = 3                  # slots (independent noise realizations) per tx
CE = dict(CE_algo="DFT_symmetric", L_symm_left_in_ns=1400,
          L_symm_right_in_ns=1200, eRB=4, enable_TO_comp=True,
          enable_FO_est=False, enable_FO_comp=False)
LDPC = dict(L=16, algo="min-sum", alpha=0.8, beta=0.3)


def _configs():
    carrier = merged(get_default_config("dl_carrier"),
                     dict(BW=20, scs=30, num_of_ant=2, Nr=2,
                          maxMIMO_layers=2, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    rng = np.random.default_rng(9)
    payload = rng.integers(0, 2, 256).tolist()
    pdsch = merged(get_default_config("pdsch"),
                   dict(mcs_index=10, mcs_table="256QAM",
                        num_of_layers=2, data_source=payload,
                        StartSymbolIndex=2, NrOfSymbols=12))
    pdsch["ResAlloType1"].update(RBStart=0, RBSize=10)
    pdsch["DMRS"].update(nNIDnSCID=1, NumCDMGroupsWithoutData=1,
                         DMRSAddPos=1)
    pdsch["precoding_matrix"] = np.empty(0)
    return carrier, pdsch


@pytest.mark.slow
def test_harq_batched_matches_per_slot():
    carrier, pdsch_cfg = _configs()
    prb = carrier_prb_size(30, 20)
    fs_hz = fft_size(prb) * 30 * 1000.0
    slot_size = 14 * 12 * prb
    wf_cfg = dict(numofslots=S, startSFN=0, startslot=0,
                  samplerate_in_mhz=fs_hz / 1e6)
    chan_cfg = chan_mod.gen_channel_model_config(
        model_format="AWGN", Nt=2, Nr=2)

    # one received stack per transmission (same TB payload, cycled rv)
    rx_stacks = []
    for t, rv in enumerate(RV_CYCLE):
        tx = Pdsch(merged(pdsch_cfg, dict(rv=[rv])), carrier)
        _, _, dl, _ = dl_wf.gen_dl_waveform(wf_cfg, carrier,
                                            nrPdsch_list=[tx])
        model = chan_mod.NrChannelModel(
            chan_cfg, float(SNR_DB), 3840e6, fs_hz, 30, seed=101 + t)
        rxw = model.filter(np.asarray(dl))
        _, rx_fd = rx_wf.waveform_rx_processing(rxw, carrier, fs_hz)
        rx_stacks.append(np.stack(
            [np.asarray(rx_fd[:, i * slot_size:(i + 1) * slot_size])
             for i in range(S)]))

    # batched HARQ chain (device LLR carry)
    rx_b = Pdsch(merged(pdsch_cfg, dict(rv=RV_CYCLE)), carrier)
    ok_hist_b = []
    llr = None
    for t, rv in enumerate(RV_CYCLE):
        ok, _, llr = rx_b.rx_process_batch(
            rx_stacks[t], list(range(S)), {"algo": "MMSE-IRC"},
            dict(LDPC), dict(CE), rv=rv, llr_prev=llr, return_llr=True)
        ok_hist_b.append(np.asarray(ok))

    # per-slot HARQ chain (NumPy CE + RX_process with LLR carry)
    ok_hist_s = np.zeros((len(RV_CYCLE), S), bool)
    for i in range(S):
        rx_i = Pdsch(merged(pdsch_cfg, dict(rv=RV_CYCLE)), carrier)
        prev = None
        for t in range(len(RV_CYCLE)):
            rx_slot = rx_stacks[t][i]
            h_ls, rs_info = rx_i.H_LS_est(rx_slot, i)
            rs_info["scs"] = 30
            est = NrChannelEstimation(h_ls, rs_info, dict(CE))
            H, cov = est.channel_est()
            ok, _, prev = rx_i.RX_process(
                rx_slot, i, {"algo": "MMSE-IRC"}, H, cov, dict(LDPC),
                est, HARQ_on=True, current_LLr_dns=prev)
            ok_hist_s[t, i] = ok

    ok_hist_b = np.stack(ok_hist_b)
    # the CI pin: batched == per-slot outcome at every (tx, slot)
    np.testing.assert_array_equal(ok_hist_b, ok_hist_s)
    # scenario sanity: soft combining recovers what single-tx lost
    assert not ok_hist_b[0].any(), "first transmission should fail"
    assert ok_hist_b[-1].all(), "rv combining should decode"
