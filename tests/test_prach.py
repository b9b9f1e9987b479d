"""PRACH parity tests vs the reference."""
import copy
import json

import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.phy import prach as prach_mod
from python_5gtoolbox_tpu.utils.config import get_default_config, merged


SEQ_CASES = [
    (1, 839, 1, 0), (100, 839, 5, 20), (837, 839, 0, 63),
    (1, 139, 1, 0), (50, 139, 11, 33), (137, 139, 15, 63),
]


def _gen_prach_seq_goldens():
    from py5gphy.nr_prach import nr_prach_seq
    out = {}
    for i, (root, lra, zone, pi) in enumerate(SEQ_CASES):
        out[f"seq_{i}"] = nr_prach_seq.PRACH_seq_gen(root, lra, zone, pi)
    return out


@pytest.fixture(scope="module")
def prach_seq_goldens():
    return get_golden("prach_seq", _gen_prach_seq_goldens)


@pytest.mark.parametrize("i", range(len(SEQ_CASES)))
def test_prach_seq(prach_seq_goldens, i):
    root, lra, zone, pi = SEQ_CASES[i]
    got = prach_mod.prach_seq_gen(root, lra, zone, pi)
    np.testing.assert_allclose(got, prach_seq_goldens[f"seq_{i}"],
                               atol=1e-6)


PRACH_CASES = [
    # (cfg_index, duplex, carrier_scs, msg1_scs, sfn, subframe, preamble)
    (16, "FDD", 15, 15, 1, 1, 0),     # format 0, LRA 839
    (100, "TDD", 30, 30, 0, 9, 11),   # format A2, LRA 139
    (201, "TDD", 30, 30, 0, 9, 3),
]


def _gen_prach_goldens():
    from py5gphy.nr_prach import nr_prach
    with open("/root/reference/py5gphy/nr_default_config/"
              "default_prach_config.json") as f:
        base = json.load(f)
    with open("/root/reference/py5gphy/nr_default_config/"
              "default_UL_carrier_config.json") as f:
        carrier0 = json.load(f)
    out = {}
    for i, (ci, duplex, cscs, mscs, sfn, sub, pi) in enumerate(PRACH_CASES):
        carrier = dict(carrier0, scs=cscs, BW=40, duplex_type=duplex)
        cfg = copy.deepcopy(base["config"])
        cfg["prach_ConfigurationIndex"] = ci
        cfg["msg1_SubcarrierSpacing"] = mscs
        par = copy.deepcopy(base["parameters"])
        par["PRACH_subframe"] = sub
        par["PreambleIndex"] = pi
        ch = nr_prach.Prach(carrier, cfg, par)
        wav, data, active = ch.process(sfn)
        out[f"wav_{i}"] = wav
        out[f"active_{i}"] = np.array([active])
        if active:
            out[f"data_{i}"] = data
    return out


@pytest.fixture(scope="module")
def prach_goldens():
    return get_golden("prach_process", _gen_prach_goldens)


@pytest.mark.parametrize("i", range(len(PRACH_CASES)))
def test_prach_process(prach_goldens, i):
    ci, duplex, cscs, mscs, sfn, sub, pi = PRACH_CASES[i]
    base = get_default_config("prach")
    carrier = merged(get_default_config("ul_carrier"),
                     dict(scs=cscs, BW=40, duplex_type=duplex))
    cfg = merged(base["config"], dict(prach_ConfigurationIndex=ci,
                                      msg1_SubcarrierSpacing=mscs))
    par = merged(base["parameters"], dict(PRACH_subframe=sub,
                                          PreambleIndex=pi))
    ch = prach_mod.Prach(carrier, cfg, par)
    wav, data, active = ch.process(sfn)
    assert active == prach_goldens[f"active_{i}"][0]
    np.testing.assert_allclose(wav, prach_goldens[f"wav_{i}"], atol=2e-4)
    if active:
        np.testing.assert_allclose(data, prach_goldens[f"data_{i}"],
                                   atol=2e-4)


def _gen_prach_wave_golden():
    from py5gphy.nr_waveform import nr_prach_waveform
    import os
    with open("/root/reference/py5gphy/nr_default_config/"
              "default_prach_config.json") as f:
        base = json.load(f)
    with open("/root/reference/py5gphy/nr_default_config/"
              "default_UL_carrier_config.json") as f:
        carrier = json.load(f)
    with open("/root/reference/py5gphy/nr_default_config/"
              "default_UL_waveform_config.json") as f:
        wf = json.load(f)
    wf = dict(wf, numofslots=5, samplerate_in_mhz=61.44)
    carrier = dict(carrier, scs=30, BW=40, duplex_type="FDD")
    cfg = dict(base["config"], prach_ConfigurationIndex=16,
               msg1_SubcarrierSpacing=15)
    td, datas = nr_prach_waveform.gen_prach_waveform(
        wf, carrier, cfg, base["parameters"])
    return {"td": td, "datas": np.asarray(datas)}


@pytest.fixture(scope="module")
def prach_wave_golden():
    return get_golden("prach_waveform", _gen_prach_wave_golden)


def test_prach_waveform(prach_wave_golden):
    base = get_default_config("prach")
    carrier = merged(get_default_config("ul_carrier"),
                     dict(scs=30, BW=40, duplex_type="FDD"))
    wf = merged(get_default_config("ul_waveform"),
                dict(numofslots=5, samplerate_in_mhz=61.44))
    cfg = merged(base["config"], dict(prach_ConfigurationIndex=16,
                                      msg1_SubcarrierSpacing=15))
    td, datas = prach_mod.gen_prach_waveform(wf, carrier, cfg,
                                             base["parameters"])
    np.testing.assert_allclose(td, prach_wave_golden["td"], atol=3e-4)
    np.testing.assert_allclose(np.asarray(datas),
                               prach_wave_golden["datas"], atol=3e-4)
