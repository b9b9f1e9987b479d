"""PUCCH formats 0-4, SRS, and UL waveform parity tests vs the reference."""
import copy
import json

import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.phy import pucch as pucch_mod
from python_5gtoolbox_tpu.phy import srs as srs_mod
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size


def _ref_cfg(name):
    with open(f"/root/reference/py5gphy/nr_default_config/{name}") as f:
        return json.load(f)


# (format, overrides, sfn, slot)
PUCCH_CASES = [
    (0, dict(numHARQbits=2, HARQbits=[1, 0], SR="positive", nrofSymbols=2,
             slotoffset=0), 0, 0),
    (0, dict(numHARQbits=1, HARQbits=[1], SR="negative", nrofSymbols=1,
             intraSlotFrequencyHopping="disabled", slotoffset=0,
             pucch_GroupHopping="enable"), 1, 0),
    (1, dict(numHARQbits=2, HARQbits=[1, 1], nrofSymbols=8,
             startingSymbolIndex=4, timeDomainOCC=1, slotoffset=0), 0, 0),
    (1, dict(numHARQbits=1, HARQbits=[0], nrofSymbols=14,
             startingSymbolIndex=0, intraSlotFrequencyHopping="disabled",
             slotoffset=0), 0, 0),
    (2, dict(NumUCIBits=10, UCIbits=[1, 0, 1, 0, 1, 1, 0, 0, 1, 0],
             nrofSymbols=2, nrofPRBs=3, slotoffset=0), 0, 0),
    (2, dict(NumUCIBits=30, UCIbits=[1, 0, 1] * 10, nrofSymbols=2,
             nrofPRBs=9, intraSlotFrequencyHopping="disabled",
             slotoffset=0), 0, 0),
    (3, dict(NumUCIBits=10, UCIbits=[1, 0, 1, 0, 1, 1, 0, 0, 1, 0],
             nrofSymbols=5, startingSymbolIndex=9, additionalDMRS="false",
             nrofPRBs=1, slotoffset=0), 0, 0),
    (3, dict(NumUCIBits=40, UCIbits=[1, 1, 0, 1] * 10, nrofSymbols=10,
             startingSymbolIndex=4, additionalDMRS="true", nrofPRBs=2,
             pi2BPSK="enabled", slotoffset=0), 0, 0),
    (4, dict(NumUCIBits=16, UCIbits=[1, 0, 1, 1] * 4, nrofSymbols=9,
             startingSymbolIndex=5, occ_Length=2, occ_index=1,
             additionalDMRS="false", slotoffset=0), 0, 0),
    (4, dict(NumUCIBits=12, UCIbits=[0, 1] * 6, nrofSymbols=14,
             startingSymbolIndex=0, occ_Length=4, occ_index=2,
             additionalDMRS="true", slotoffset=0), 0, 0),
]

SRS_CASES = [
    dict(nrofSRSPorts=2, KTC=2, cSRS=5, bSRS=0, nrofSymbols=1),
    dict(nrofSRSPorts=4, KTC=4, cSRS=10, bSRS=1, nrofSymbols=2,
         startPosition=1, cyclicShift=7, freqDomainShift=2,
         freqDomainPosition=1),
    dict(nrofSRSPorts=1, KTC=2, cSRS=12, bSRS=2, nrofSymbols=4,
         startPosition=3, groupOrSequenceHopping="groupHopping"),
]


def _gen_ulch_goldens():
    from py5gphy.nr_pucch import (nr_pucch_format0, nr_pucch_format1,
                                  nr_pucch_format2, nr_pucch_format3,
                                  nr_pucch_format4)
    from py5gphy.nr_srs import nr_srs
    from py5gphy.common import nr_slot
    carrier = dict(_ref_cfg("default_UL_carrier_config.json"), BW=40,
                   scs=30, num_of_ant=4, Nr=4)
    classes = {0: nr_pucch_format0.NrPUCCHFormat0,
               1: nr_pucch_format1.NrPUCCHFormat1,
               2: nr_pucch_format2.NrPUCCHFormat2,
               3: nr_pucch_format3.NrPUCCHFormat3,
               4: nr_pucch_format4.NrPUCCHFormat4}
    out = {}
    prb = nr_slot.get_carrier_prb_size(30, 40)
    for i, (fmt, over, sfn, slot) in enumerate(PUCCH_CASES):
        cfg = dict(_ref_cfg(f"default_pucch_format{fmt}_config.json"), **over)
        for key in ("UCIbits", "HARQbits"):
            if key in cfg:
                cfg[key] = np.asarray(cfg[key], "i1")
        ch = classes[fmt](carrier, cfg)
        fd, usage = nr_slot.init_fd_slot(1, prb)
        fd, usage = ch.process(fd, usage, sfn, slot)
        out[f"pucch_fd_{i}"], out[f"pucch_usage_{i}"] = fd, usage
    for i, over in enumerate(SRS_CASES):
        cfg = dict(_ref_cfg("default_srs_config.json"), **over)
        ch = nr_srs.NrSRS(carrier, cfg)
        fd, usage = nr_slot.init_fd_slot(4, prb)
        fd, usage = ch.process(fd, usage, 0, 0)
        out[f"srs_fd_{i}"], out[f"srs_usage_{i}"] = fd, usage
    return out


@pytest.fixture(scope="module")
def ulch_goldens():
    return get_golden("ul_channels", _gen_ulch_goldens)


_MY_CLASSES = {0: pucch_mod.NrPUCCHFormat0, 1: pucch_mod.NrPUCCHFormat1,
               2: pucch_mod.NrPUCCHFormat2, 3: pucch_mod.NrPUCCHFormat3,
               4: pucch_mod.NrPUCCHFormat4}


@pytest.mark.parametrize("i", range(len(PUCCH_CASES)))
def test_pucch(ulch_goldens, i):
    fmt, over, sfn, slot = PUCCH_CASES[i]
    cfg = merged(get_default_config(f"pucch_format{fmt}"), over)
    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=40, scs=30, num_of_ant=1, Nr=1))
    ch = _MY_CLASSES[fmt](carrier, cfg)
    prb = carrier_prb_size(30, 40)
    fd = np.zeros((1, 14 * 12 * prb), np.complex64)
    usage = np.zeros((1, 14 * 12 * prb), np.int8)
    fd, usage = ch.process(fd, usage, sfn, slot)
    np.testing.assert_array_equal(usage, ulch_goldens[f"pucch_usage_{i}"])
    np.testing.assert_allclose(fd, ulch_goldens[f"pucch_fd_{i}"], atol=3e-5)


@pytest.mark.parametrize("i", range(len(SRS_CASES)))
def test_srs(ulch_goldens, i):
    cfg = merged(get_default_config("srs"), SRS_CASES[i])
    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=40, scs=30, num_of_ant=4, Nr=4))
    ch = srs_mod.NrSRS(carrier, cfg)
    prb = carrier_prb_size(30, 40)
    fd = np.zeros((4, 14 * 12 * prb), np.complex64)
    usage = np.zeros((4, 14 * 12 * prb), np.int8)
    fd, usage = ch.process(fd, usage, 0, 0)
    np.testing.assert_array_equal(usage, ulch_goldens[f"srs_usage_{i}"])
    np.testing.assert_allclose(fd, ulch_goldens[f"srs_fd_{i}"], atol=3e-5)


def _gen_ul_waveform_golden():
    from py5gphy.nr_pusch import nr_pusch
    from py5gphy.nr_waveform import nr_ul_waveform
    carrier = dict(_ref_cfg("default_UL_carrier_config.json"), BW=40,
                   scs=30, num_of_ant=1, Nr=1)
    pusch_cfg = _ref_cfg("default_pusch_config.json")
    pusch_cfg["DMRS"]["transformPrecodingDisabled"]["NID0"] = 1
    pusch_cfg["DMRS"]["transformPrecodingDisabled"]["NID1"] = 1
    pusch_cfg["nNrOfAntennaPorts"] = 1
    pusch_cfg["nPMI"] = 0
    pusch_cfg["ResAlloType1"]["RBSize"] = 24
    pusch_cfg["data_source"] = [1, 0, 0, 1]
    wf = dict(_ref_cfg("default_UL_waveform_config.json"), numofslots=2)
    ch = nr_pusch.NrPUSCH(carrier, pusch_cfg)
    fd, td, ul = nr_ul_waveform.gen_ul_waveform(wf, carrier, [ch])
    return {"fd": fd, "td": td, "ul": ul}


@pytest.fixture(scope="module")
def ul_wave_golden():
    return get_golden("ul_waveform", _gen_ul_waveform_golden)


def test_ul_waveform(ul_wave_golden):
    from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
    from python_5gtoolbox_tpu.waveform.ul import gen_ul_waveform
    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=40, scs=30, num_of_ant=1, Nr=1))
    cfg = get_default_config("pusch")
    cfg["nNrOfAntennaPorts"] = 1
    cfg["nPMI"] = 0
    cfg["ResAlloType1"]["RBSize"] = 24
    cfg["data_source"] = [1, 0, 0, 1]
    wf = merged(get_default_config("ul_waveform"), dict(numofslots=2))
    ch = NrPUSCH(carrier, cfg)
    fd, td, ul = gen_ul_waveform(wf, carrier, [ch])
    np.testing.assert_allclose(fd, ul_wave_golden["fd"], atol=3e-5)
    np.testing.assert_allclose(td, ul_wave_golden["td"], atol=3e-4)
    np.testing.assert_allclose(ul, ul_wave_golden["ul"], atol=3e-4)
