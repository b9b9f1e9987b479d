"""Slot-batched one-dispatch RX == per-slot RX (PDSCH and PUSCH).

The batched path (rx_process_batch) traces LS-est -> ce_jax CE ->
equalize -> demod -> descramble -> rate-recover -> LDPC -> TB CRC into
one executable; these tests pin its end-to-end decode outcomes to the
reference-shaped per-slot loop (NumPy CE + RX_process) on identical
received waveforms.
"""
import numpy as np
import pytest

from python_5gtoolbox_tpu.models import channel as chan_mod
from python_5gtoolbox_tpu.utils.config import get_default_config, merged

from scripts.internal import sim_pdsch_throughput_internal as pdsim
from scripts.internal import sim_pusch_throughput_internal as pusim

CE = dict(CE_algo="DFT_symmetric", L_symm_left_in_ns=1400,
          L_symm_right_in_ns=1200, eRB=4, enable_TO_comp=True,
          enable_FO_est=False, enable_FO_comp=False)
LDPC = dict(L=16, algo="min-sum", alpha=0.8, beta=0.3)


def _chan(nt, nr):
    return chan_mod.gen_channel_model_config(
        model_format="customized", Nt=nt, Nr=nr,
        multi_paths=[[0, 0, "Rayleigh", 0, 0]])


@pytest.mark.parametrize("algo", ["MMSE-IRC", "ZF"])
def test_pdsch_batch_matches_per_slot(algo):
    carrier = merged(get_default_config("dl_carrier"),
                     dict(BW=10, scs=30, num_of_ant=2, Nr=4,
                          maxMIMO_layers=2, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    pdsch = merged(get_default_config("pdsch"),
                   dict(mcs_index=2, mcs_table="256QAM", num_of_layers=2,
                        rv=[0], data_source=[], StartSymbolIndex=2,
                        NrOfSymbols=12))
    pdsch["ResAlloType1"].update(RBStart=0, RBSize=12)
    pdsch["DMRS"].update(nNIDnSCID=1, NumCDMGroupsWithoutData=1,
                         DMRSAddPos=1)
    pdsch["precoding_matrix"] = np.empty(0)
    kw = dict(snr_db_list=[2.0], ceq_algo_list=[algo], n_slots=4,
              ce_config=dict(CE), ldpc_config=dict(LDPC), seed=7)
    r_slot = pdsim.run_pdsch_throughput(carrier, pdsch, _chan(2, 4),
                                        use_batch=False, **kw)
    r_batch = pdsim.run_pdsch_throughput(carrier, pdsch, _chan(2, 4),
                                         use_batch=True, **kw)
    assert r_slot[algo] == r_batch[algo]


def test_pusch_batch_matches_per_slot():
    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=10, scs=30, num_of_ant=2, Nr=4,
                          maxMIMO_layers=2, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    pusch = merged(get_default_config("pusch"),
                   dict(mcs_index=2, mcs_table="256QAM",
                        num_of_layers=2, rv=[0], data_source=[],
                        StartSymbolIndex=0, NrOfSymbols=14,
                        nTransPrecode=0, EnableULSCH=1, EnableACK=0,
                        EnableCSI1=0, EnableCSI2=0))
    pusch["ResAlloType1"].update(RBStart=0, RBSize=12)
    pusch["DMRS"].update(NumCDMGroupsWithoutData=1, DMRSAddPos=1)
    assert pusim.can_batch_pusch_rx(pusch)
    kw = dict(snr_db_list=[4.0], ceq_algo_list=["MMSE-IRC"], n_slots=4,
              ce_config=dict(CE), ldpc_config=dict(LDPC), seed=11)
    r_slot = pusim.run_pusch_throughput(carrier, pusch, _chan(2, 4),
                                        use_batch=False, **kw)
    r_batch = pusim.run_pusch_throughput(carrier, pusch, _chan(2, 4),
                                         use_batch=True, **kw)
    assert r_slot["MMSE-IRC"] == r_batch["MMSE-IRC"]


@pytest.mark.parametrize("mcs_kw", [
    dict(mcs_table="MCStable61411", mcs_index=0, nTpPi2BPSK=1),  # pi/2-BPSK
    dict(mcs_table="MCStable61411", mcs_index=2, nTpPi2BPSK=0),  # QPSK
], ids=["pi2bpsk", "qpsk"])
def test_pusch_batch_transform_precoding(mcs_kw):
    """DFT-s-OFDM transform-precoded sweep: batched IDFT-de-precode RX
    == per-slot RX_process (VERDICT r4 item 3)."""
    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=10, scs=30, num_of_ant=1, Nr=2,
                          maxMIMO_layers=1, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    pusch = merged(get_default_config("pusch"),
                   dict(num_of_layers=1, rv=[0], data_source=[],
                        StartSymbolIndex=0, NrOfSymbols=14,
                        nTransPrecode=1, EnableULSCH=1, EnableACK=0,
                        EnableCSI1=0, EnableCSI2=0, PortIndexList=[1000],
                        nNrOfAntennaPorts=1, nPMI=0, **mcs_kw))
    pusch["ResAlloType1"].update(RBStart=0, RBSize=12)   # 12 = 2^2*3 ok
    pusch["DMRS"].update(NumCDMGroupsWithoutData=2, DMRSAddPos=1)
    assert pusim.can_batch_pusch_rx(pusch, ["MMSE-IRC"])
    assert not pusim.can_batch_pusch_rx(pusch, ["ML-soft"])
    kw = dict(snr_db_list=[3.0], ceq_algo_list=["MMSE-IRC"], n_slots=4,
              ce_config=dict(CE), ldpc_config=dict(LDPC), seed=13)
    r_slot = pusim.run_pusch_throughput(carrier, pusch, _chan(1, 2),
                                        use_batch=False, **kw)
    r_batch = pusim.run_pusch_throughput(carrier, pusch, _chan(1, 2),
                                         use_batch=True, **kw)
    assert r_slot["MMSE-IRC"] == r_batch["MMSE-IRC"]
    # the operating point must discriminate (decodes at this SNR)
    assert r_batch["MMSE-IRC"][0] > 0.0
