"""UCI-on-PUSCH in the slot-batched RX == per-slot decode (r4 item 3).

The batched UL core now runs the 38.212 6.2.7 data/control demultiplex
and the smallblock/polar UCI decoders inside the traced program (the
reference leaves UCI decode as a TODO, nr_pusch_uci_decode.py:19; the
per-slot repo path implements it and is the parity target here).
"""
import numpy as np
import pytest

from python_5gtoolbox_tpu.models import channel as chan_mod
from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
from python_5gtoolbox_tpu.rx.channel_estimate import NrChannelEstimation
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size, fft_size
from python_5gtoolbox_tpu.waveform import rx as rx_wf
from python_5gtoolbox_tpu.waveform import ul as ul_wf

CE = dict(CE_algo="DFT_symmetric", L_symm_left_in_ns=1400,
          L_symm_right_in_ns=1200, eRB=4, enable_TO_comp=True,
          enable_FO_est=False, enable_FO_comp=False)
LDPC = dict(L=16, algo="min-sum", alpha=0.8, beta=0.3)
S = 3


def _run_case(ack_bits, csi1_bits, csi1_payload):
    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=10, scs=30, num_of_ant=2, Nr=4,
                          maxMIMO_layers=2, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    pusch = merged(get_default_config("pusch"),
                   dict(mcs_index=4, mcs_table="256QAM",
                        num_of_layers=2, rv=[0], data_source=[1, 0, 1],
                        StartSymbolIndex=0, NrOfSymbols=14,
                        nTransPrecode=0, EnableULSCH=1,
                        EnableACK=1 if ack_bits else 0,
                        NumACKBits=len(ack_bits),
                        ACKbits=list(ack_bits),
                        EnableCSI1=1 if csi1_bits else 0,
                        NumCSI1Bits=csi1_bits,
                        CSI1bits=csi1_payload,
                        EnableCSI2=0, NumCSI2Bits=0))
    pusch["ResAlloType1"].update(RBStart=0, RBSize=12)
    pusch["DMRS"].update(NumCDMGroupsWithoutData=1, DMRSAddPos=1)

    prb = carrier_prb_size(30, 10)
    fs_hz = fft_size(prb) * 30 * 1000.0
    slot_size = 14 * 12 * prb
    wf_cfg = dict(numofslots=S, startSFN=0, startslot=0,
                  samplerate_in_mhz=fs_hz / 1e6)
    chan_cfg = chan_mod.gen_channel_model_config(
        model_format="customized", Nt=2, Nr=4,
        multi_paths=[[0, 0, "Rayleigh", 0, 0]])

    tx = NrPUSCH(dict(carrier), dict(pusch))
    _, _, ul = ul_wf.gen_ul_waveform(wf_cfg, dict(carrier),
                                     nrPusch_list=[tx])
    model = chan_mod.NrChannelModel(chan_cfg, -8.0, 3840e6, fs_hz, 30,
                                    seed=42)
    rxw = model.filter(np.asarray(ul))
    _, rx_fd = rx_wf.waveform_rx_processing(rxw, dict(carrier), fs_hz)
    slots = [np.asarray(rx_fd[:, i * slot_size:(i + 1) * slot_size])
             for i in range(S)]

    # batched: demux + UCI decode inside the traced core
    rx_b = NrPUSCH(dict(carrier), dict(pusch))
    ok_b, _, uci_b = rx_b.rx_process_batch(
        np.stack(slots), list(range(S)), {"algo": "MMSE-IRC"},
        dict(LDPC), dict(CE))

    # per-slot: NumPy CE + RX_process(decode_uci=True)
    rx_s = NrPUSCH(dict(carrier), dict(pusch))
    for i in range(S):
        h_ls, rs_info = rx_s.H_LS_est(slots[i], i)
        est = NrChannelEstimation(h_ls, rs_info, dict(CE))
        H, cov = est.channel_est()
        rx_s.rvidx = -1
        ok_s, _, _, uci_s = rx_s.RX_process(
            slots[i], i, {"algo": "MMSE-IRC"}, H, cov, dict(LDPC), est,
            decode_uci=True)
        assert bool(ok_b[i]) == bool(ok_s)
        for name in uci_s:
            bits_s, okk_s = uci_s[name]
            bits_b, okk_b = uci_b[name]
            np.testing.assert_array_equal(bits_b[i], bits_s, err_msg=name)
            assert bool(okk_b[i]) == bool(okk_s), name
    # decode sanity: the operating point is clean enough that the TB
    # and the transmitted UCI payloads actually come back
    assert np.all(ok_b)
    if "ack" in uci_b:
        np.testing.assert_array_equal(
            uci_b["ack"][0], np.tile(ack_bits, (S, 1)))


def test_uci_ack2_csi1_smallblock():
    """2-bit ACK (special table) + 5-bit CSI1 (Reed-Muller ML)."""
    _run_case(ack_bits=[1, 0], csi1_bits=5, csi1_payload=[1, 0, 1, 1, 0])


def test_uci_csi1_polar():
    """14-bit CSI1 -> polar CA-SCL UCI path in the traced core."""
    rng = np.random.default_rng(6)
    _run_case(ack_bits=[], csi1_bits=14,
              csi1_payload=rng.integers(0, 2, 14).tolist())
