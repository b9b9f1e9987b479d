"""Test-model config generation parity vs the reference."""
import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.phy.testmodel import gen_nr_tm_cfg


TM_CASES = [
    (30, 40, "TDD", "NR-FR1-TM1.1", 1, 3840),
    (30, 100, "TDD", "NR-FR1-TM3.1", 17, 3500.1),
    (15, 20, "FDD", "NR-FR1-TM2", 100, 1900.05),
    (30, 40, "TDD", "NR-FR1-TM2a", 1, 3840),
    (15, 10, "TDD", "NR-FR1-TM3.1a", 5, 1900.05),
]

_KEYS = ["rnti", "mcs_table", "mcs_index", "rv", "num_of_layers",
         "StartSymbolIndex", "NrOfSymbols", "period_in_slot",
         "allocated_slots", "nID"]


def _pdsch_fingerprint(cfg_list):
    rows = []
    for c in cfg_list:
        row = [c["rnti"], c["mcs_index"], c["num_of_layers"],
               c["StartSymbolIndex"], c["NrOfSymbols"],
               c["ResAlloType1"]["RBStart"], c["ResAlloType1"]["RBSize"],
               c["period_in_slot"], c["nID"]] + list(c["allocated_slots"])
        rows.append(np.asarray(row))
    return rows


def _gen_tm_goldens():
    from py5gphy.nr_testmodel import nr_testmodel_cfg
    out = {}
    for i, (scs, bw, duplex, tm, cid, fc) in enumerate(TM_CASES):
        wf, carrier, ssb, csirs, coreset, ss, pdcch, pdsch = \
            nr_testmodel_cfg.gen_nr_TM_cfg(scs, bw, duplex, tm, cid, fc)
        out[f"wf_{i}"] = np.array([wf["numofslots"],
                                   wf["samplerate_in_mhz"] * 100])
        out[f"n_pdsch_{i}"] = np.array([len(pdsch)])
        for j, row in enumerate(_pdsch_fingerprint(pdsch)):
            out[f"pdsch_{i}_{j}"] = row
        out[f"pdcch_{i}"] = np.array(
            [pdcch[0]["period_in_slot"]] + list(pdcch[0]["allocated_slots"]))
    return out


@pytest.fixture(scope="module")
def tm_goldens():
    return get_golden("testmodel_cfg", _gen_tm_goldens)


@pytest.mark.parametrize("i", range(len(TM_CASES)))
def test_tm_cfg(tm_goldens, i):
    scs, bw, duplex, tm, cid, fc = TM_CASES[i]
    wf, carrier, ssb, csirs, coreset, ss, pdcch, pdsch = gen_nr_tm_cfg(
        scs, bw, duplex, tm, cid, fc)
    np.testing.assert_allclose(
        np.array([wf["numofslots"], wf["samplerate_in_mhz"] * 100]),
        tm_goldens[f"wf_{i}"])
    assert len(pdsch) == tm_goldens[f"n_pdsch_{i}"][0]
    for j, row in enumerate(_pdsch_fingerprint(pdsch)):
        np.testing.assert_array_equal(row, tm_goldens[f"pdsch_{i}_{j}"])
    np.testing.assert_array_equal(
        np.array([pdcch[0]["period_in_slot"]]
                 + list(pdcch[0]["allocated_slots"])),
        tm_goldens[f"pdcch_{i}"])


def test_tm_waveform_runs():
    """TM3.1 waveform generates end-to-end through our stack."""
    import jax
    from python_5gtoolbox_tpu.phy.pdsch import Pdsch
    from python_5gtoolbox_tpu.phy.pdcch import NrSearchSpace, Pdcch
    from python_5gtoolbox_tpu.waveform.dl import gen_dl_waveform

    wf, carrier, ssb, csirs, coresets, sss, pdcchs, pdschs = gen_nr_tm_cfg(
        30, 20, "TDD", "NR-FR1-TM3.1", 1, 3840)
    wf["numofslots"] = 4
    pdsch_objs = [Pdsch(c, carrier) for c in pdschs]
    nrss = NrSearchSpace(carrier, sss[0], coresets[0])
    pdcch_objs = [Pdcch(c, nrss) for c in pdcchs]
    fd, td, dl, fs = gen_dl_waveform(wf, carrier, [], pdsch_objs, [],
                                     pdcch_objs)
    assert np.abs(fd).max() > 0 and dl.shape[-1] > 0
