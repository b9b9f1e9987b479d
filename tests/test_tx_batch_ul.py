"""Slot-batched device UL TX (NrPUSCH.tx_grid_batch) == per-slot process().

UL analogue of tests/test_tx_batch.py: the batched PUSCH TX must
reproduce the reference-shaped per-slot grid composition exactly —
same ULSCH bits, same QAM/DFT-precoded values, same DMRS placement
(PRBS- and ZC-based), same rv/trblk cycling — with only the execution
shape changed (one traced program over all slots vs. a host loop).
"""
import numpy as np
import pytest

from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size, fft_size


def _carrier(nant=1, layers=1):
    return merged(get_default_config("ul_carrier"),
                  dict(BW=20, scs=30, num_of_ant=nant, Nr=2,
                       maxMIMO_layers=layers, PCI=1,
                       carrier_frequency_in_mhz=3840.0))


def _pusch(**kw):
    cfg = merged(get_default_config("pusch"),
                 dict(mcs_table="MCStable61411", mcs_index=2,
                      nTpPi2BPSK=0, num_of_layers=1, rv=[0],
                      data_source=[], StartSymbolIndex=0, NrOfSymbols=14,
                      nTransPrecode=0, EnableULSCH=1, EnableACK=0,
                      EnableCSI1=0, EnableCSI2=0, PortIndexList=[1000],
                      nNrOfAntennaPorts=1, nPMI=0))
    cfg["ResAlloType1"].update(RBStart=0, RBSize=48)
    cfg["DMRS"].update(NumCDMGroupsWithoutData=2, DMRSAddPos=1)
    for k, v in kw.items():
        if k in ("DMRSAddPos", "NumCDMGroupsWithoutData", "nSCID"):
            cfg["DMRS"][k] = v
        elif k in ("RBStart", "RBSize"):
            cfg["ResAlloType1"][k] = v
        else:
            cfg[k] = v
    return cfg


def _per_slot_grids(cfg, carrier, slots, seed):
    np.random.seed(seed)
    p = NrPUSCH(carrier, dict(cfg))
    n_sc = 12 * carrier_prb_size(carrier["scs"], carrier["BW"])
    nant = carrier["num_of_ant"]
    grids = np.zeros((len(slots), nant, 14 * n_sc), np.complex64)
    usages = np.zeros((len(slots), nant, 14 * n_sc), np.int8)
    for i, slot in enumerate(slots):
        grids[i], usages[i] = p.process(grids[i], usages[i], slot)
    return grids.reshape(len(slots), nant, 14, n_sc)


def _batch_grids(cfg, carrier, slots, seed):
    np.random.seed(seed)
    p = NrPUSCH(carrier, dict(cfg))
    assert p.tx_batch_supported()
    return np.asarray(p.tx_grid_batch(list(slots)))


CASES = [
    ("baseline_tp0_cdm2", {}, {}),
    ("transform_precoding", dict(nTransPrecode=1), {}),
    ("cdm1_data_on_dmrs_sym", dict(NumCDMGroupsWithoutData=1), {}),
    ("two_layers_2ports",
     dict(num_of_layers=2, PortIndexList=[1000, 1001],
          nNrOfAntennaPorts=2, nPMI=0, mcs_index=5),
     dict(nant=2, layers=2)),
    ("codebook_1layer_2ports",
     dict(num_of_layers=1, nNrOfAntennaPorts=2, nPMI=2),
     dict(nant=2, layers=1)),
    ("rbstart_offset_addpos2", dict(RBStart=7, RBSize=24, DMRSAddPos=2),
     {}),
    ("short_alloc", dict(StartSymbolIndex=0, NrOfSymbols=7,
                         DMRSAddPos=0), {}),
]


@pytest.mark.parametrize("name,pu_kw,car_kw",
                         CASES, ids=[c[0] for c in CASES])
def test_ul_tx_batch_matches_per_slot(name, pu_kw, car_kw):
    carrier = _carrier(**car_kw)
    cfg = _pusch(**pu_kw)
    slots = [0, 1, 2, 3]
    ref = _per_slot_grids(cfg, carrier, slots, seed=4321)
    got = _batch_grids(cfg, carrier, slots, seed=4321)
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


def test_ul_tx_batch_rejects_uci():
    cfg = _pusch(EnableACK=1, NumACKBits=2, ACKbits=[1, 0])
    p = NrPUSCH(_carrier(), cfg)
    assert not p.tx_batch_supported()


def test_ul_tx_batch_rv_cycling_and_gating():
    """rv=[0,2,3,1] HARQ cycling + slot gating match the per-slot path;
    gated slots come back all-zero."""
    carrier = _carrier()
    cfg = _pusch(rv=[0, 2, 3, 1], period_in_slot=5,
                 allocated_slots=[0, 1, 2, 3])
    slots = list(range(10))       # slots 4 and 9 gated
    ref = _per_slot_grids(cfg, carrier, slots, seed=77)
    got = _batch_grids(cfg, carrier, slots, seed=77)
    assert np.all(got[4] == 0) and np.all(got[9] == 0)
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)


def test_ul_tx_batch_in_gen_ul_waveform():
    """gen_ul_waveform's fast path == the per-slot loop end to end,
    both host-return and the fused return_device variant."""
    from python_5gtoolbox_tpu.waveform import ul as ul_wf

    carrier = _carrier()
    prb = carrier_prb_size(30, 20)
    fs = 2 * 1000 * 30 * fft_size(prb)
    wf_cfg = dict(numofslots=3, startSFN=0, startslot=0,
                  samplerate_in_mhz=fs / 1e6)
    cfg = _pusch(data_source=[1, 0, 1, 1])   # deterministic payload

    p_fast = NrPUSCH(carrier, dict(cfg))
    assert p_fast.tx_batch_supported()
    fd_f, td_f, ul_f = ul_wf.gen_ul_waveform(wf_cfg, carrier,
                                             nrPusch_list=[p_fast])

    p_slow = NrPUSCH(carrier, dict(cfg))
    p_slow.tx_batch_supported = lambda: False
    fd_s, td_s, ul_s = ul_wf.gen_ul_waveform(wf_cfg, carrier,
                                             nrPusch_list=[p_slow])
    np.testing.assert_allclose(np.asarray(fd_f), fd_s, atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(td_f), np.asarray(td_s),
                               atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(ul_f), np.asarray(ul_s),
                               atol=1e-4, rtol=0)

    p_dev = NrPUSCH(carrier, dict(cfg))
    fd_d, td_d, ul_d = ul_wf.gen_ul_waveform(wf_cfg, carrier,
                                             nrPusch_list=[p_dev],
                                             return_device=True)
    assert td_d is None
    np.testing.assert_allclose(np.asarray(fd_d), fd_s, atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(ul_d), np.asarray(ul_s),
                               atol=1e-4, rtol=0)
