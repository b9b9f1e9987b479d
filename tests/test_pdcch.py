"""PDCCH chain parity tests vs the reference."""
import copy
import json

import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.phy import pdcch as pdcch_mod
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size


def _ref_cfgs():
    base = "/root/reference/py5gphy/nr_default_config/"
    out = {}
    for name, f in [("carrier", "default_DL_carrier_config.json"),
                    ("coreset", "default_coreset_config.json"),
                    ("ss", "default_search_space.json"),
                    ("pdcch", "default_pdcch_config.json")]:
        with open(base + f) as fh:
            out[name] = json.load(fh)
    return out


DCI_CASES = [(12, 1, 108), (30, 4567, 216), (60, 65535, 432), (20, 0, 864)]


def _gen_dci_goldens():
    from py5gphy.nr_pdcch import nr_dci_encoder
    rng = np.random.default_rng(31)
    out = {}
    for i, (nbits, rnti, E) in enumerate(DCI_CASES):
        bits = rng.integers(0, 2, nbits).astype("i1")
        out[f"in_{i}"] = bits
        out[f"out_{i}"] = nr_dci_encoder.nrDCIEncode(bits, rnti, E)
    return out


@pytest.fixture(scope="module")
def dci_goldens():
    return get_golden("pdcch_dci", _gen_dci_goldens)


@pytest.mark.parametrize("i", range(len(DCI_CASES)))
def test_dci_encode(dci_goldens, i):
    _, rnti, E = DCI_CASES[i]
    got = pdcch_mod.dci_encode(dci_goldens[f"in_{i}"], rnti, E)
    np.testing.assert_array_equal(got, dci_goldens[f"out_{i}"])


PDCCH_SLOT_CASES = [
    # (aggregation, candidate, interleaved, symdur, precoder_gran, slot)
    (1, 0, False, 1, "sameAsREG-bundle", 0),
    (4, 1, False, 2, "allContiguousRBs", 3),
    (8, 0, True, 1, "sameAsREG-bundle", 5),
    (2, 3, True, 2, "sameAsREG-bundle", 1),
]


def _mk_cfgs(cfgs, case, for_ref):
    agg, cand, interleaved, symdur, gran, slot = case
    carrier = dict(cfgs["carrier"], BW=40, scs=30)
    coreset = copy.deepcopy(cfgs["coreset"])
    coreset["symduration"] = symdur
    coreset["precoder_granularity"] = gran
    if interleaved:
        coreset["CCE_REG_mapping_type"] = "interleaved"
        coreset["REG_bundle_size"] = 6
        coreset["interleaver_size"] = 3
        coreset["frequencyDomainResources"] = [1] * 12 + [0] * 33
    else:
        coreset["frequencyDomainResources"] = [1] * 17 + [0] * 28
    ss = copy.deepcopy(cfgs["ss"])
    ss["NrofCandidatesPerAggregationLevel"] = [4, 4, 2, 1, 0]
    pd = copy.deepcopy(cfgs["pdcch"])
    pd["AggregationLevel"] = agg
    pd["AllocatedCandidate"] = cand
    pd["NumDCIBits"] = 30
    pd["data_source"] = [1, 1, 0, 1]
    pd["allocated_slots"] = [slot]
    return carrier, coreset, ss, pd


def _gen_pdcch_slot_goldens():
    from py5gphy.nr_pdcch import nr_pdcch, nr_searchspace
    from py5gphy.common import nr_slot
    cfgs = _ref_cfgs()
    out = {}
    for i, case in enumerate(PDCCH_SLOT_CASES):
        carrier, coreset, ss, pd = _mk_cfgs(cfgs, case, True)
        slot = case[-1]
        nrss = nr_searchspace.NrSearchSpace(carrier, ss, coreset)
        ch = nr_pdcch.Pdcch(pd, nrss)
        prb = nr_slot.get_carrier_prb_size(30, 40)
        fd, usage = nr_slot.init_fd_slot(1, prb)
        fd, usage = ch.process(fd, usage, 0, slot)
        out[f"fd_{i}"], out[f"usage_{i}"] = fd, usage
    return out


@pytest.fixture(scope="module")
def pdcch_slot_goldens():
    return get_golden("pdcch_slot", _gen_pdcch_slot_goldens)


@pytest.mark.parametrize("i", range(len(PDCCH_SLOT_CASES)))
def test_pdcch_slot(pdcch_slot_goldens, i):
    cfgs = dict(
        carrier=get_default_config("dl_carrier"),
        coreset=get_default_config("coreset"),
        ss=get_default_config("search_space"),
        pdcch=get_default_config("pdcch"),
    )
    carrier, coreset, ss, pd = _mk_cfgs(cfgs, PDCCH_SLOT_CASES[i], False)
    slot = PDCCH_SLOT_CASES[i][-1]
    nrss = pdcch_mod.NrSearchSpace(carrier, ss, coreset)
    ch = pdcch_mod.Pdcch(pd, nrss)
    prb = carrier_prb_size(30, 40)
    fd = np.zeros((1, 14 * 12 * prb), np.complex64)
    usage = np.zeros((1, 14 * 12 * prb), np.int8)
    fd, usage = ch.process(fd, usage, 0, slot)
    np.testing.assert_array_equal(usage, pdcch_slot_goldens[f"usage_{i}"])
    np.testing.assert_allclose(fd, pdcch_slot_goldens[f"fd_{i}"], atol=2e-5)
