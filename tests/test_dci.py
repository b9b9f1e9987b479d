"""DCI payload generators bit-parity vs the reference dciformat modules."""
import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.phy import dci as dci_mod

CASES = [
    # (n_bwp_prb, riv, imcs, rv, harqid)
    (273, 20, 5, 2, 1),
    (11, 20, 5, 2, 1),
    (51, 1000, 27, 0, 15),
]


def _gen_goldens():
    from py5gphy.nr_pdcch import (dciformat00, dciformat01, dciformat10,
                                  dciformat11)
    out = {}
    for i, (prb, riv, imcs, rv, hid) in enumerate(CASES):
        out[f"d00_{i}"] = dciformat00.gen_dciformat00(prb, riv, imcs, rv, hid)
        out[f"d01_{i}"] = dciformat01.gen_dciformat01(prb, riv, imcs, rv, hid)
        out[f"d10_{i}"] = dciformat10.gen_dciformat10(prb, riv, 2, 12,
                                                      imcs, rv, hid)
        out[f"d11_{i}"] = dciformat11.gen_dciformat11(prb, riv, 2, 12,
                                                      imcs, rv, hid)
        out[f"riv_{i}"] = np.array(
            [dciformat10.type1_RIV_gen(2, min(prb - 2, 20), prb)])
    return out


@pytest.fixture(scope="module")
def goldens():
    return get_golden("dci_formats", _gen_goldens)


def test_dci_formats_match_reference(goldens):
    for i, (prb, riv, imcs, rv, hid) in enumerate(CASES):
        np.testing.assert_array_equal(
            dci_mod.gen_dciformat00(prb, riv, imcs, rv, hid),
            goldens[f"d00_{i}"])
        np.testing.assert_array_equal(
            dci_mod.gen_dciformat01(prb, riv, imcs, rv, hid),
            goldens[f"d01_{i}"])
        np.testing.assert_array_equal(
            dci_mod.gen_dciformat10(prb, riv, 2, 12, imcs, rv, hid),
            goldens[f"d10_{i}"])
        np.testing.assert_array_equal(
            dci_mod.gen_dciformat11(prb, riv, 2, 12, imcs, rv, hid),
            goldens[f"d11_{i}"])
        assert dci_mod.type1_riv(2, min(prb - 2, 20), prb) == \
            goldens[f"riv_{i}"][0]


def test_dci_sizes():
    # sizes stated in the reference __main__ blocks
    assert dci_mod.gen_dciformat00(273, 20, 5, 2, 1).size == 36
    assert dci_mod.gen_dciformat00(11, 20, 5, 2, 1).size == 27
    assert dci_mod.gen_dciformat10(273, 20, 2, 12, 5, 2, 1).size == 44
    assert dci_mod.gen_dciformat10(11, 20, 2, 12, 5, 2, 1).size == 35
    assert dci_mod.gen_dciformat11(273, 20, 2, 12, 5, 2, 1).size == 51
    assert dci_mod.gen_dciformat11(11, 20, 2, 12, 5, 2, 1).size == 42


def test_coreset0_config():
    cfg = dci_mod.gen_coreset0_config(4, 6, 15, 101)
    assert cfg["CORESET_startingPRB"] == 4 + 12
    assert sum(cfg["frequencyDomainResources"]) == 48 // 6
    assert cfg["symduration"] == 1
    cfg30 = dci_mod.gen_coreset0_config(0, 15, 30, 7)
    assert cfg30["CORESET_startingPRB"] == 16
    assert cfg30["shift_index"] == 7
