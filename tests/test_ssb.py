"""SSB/PBCH chain parity tests vs the reference (end-to-end slice)."""
import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.phy import ssb as ssb_mod
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.waveform import dl as dl_mod


def _ref_configs():
    import json
    base = "/root/reference/py5gphy/nr_default_config/"
    with open(base + "default_DL_carrier_config.json") as f:
        carrier = json.load(f)
    with open(base + "default_ssb_config.json") as f:
        ssb = json.load(f)
    with open(base + "default_DL_waveform_config.json") as f:
        wf = json.load(f)
    return carrier, ssb, wf


SSB_CASES = [
    # (pci, sfn, slot, scs, bw, fc_mhz, kssb, n_crb)
    (1, 0, 0, 30, 40, 3840, 16, 20),
    (500, 5, 0, 30, 40, 3840, 0, 22),
    (1007, 12, 1, 30, 100, 3500.1, 2, 10),
    (17, 3, 0, 15, 20, 1900.05, 5, 8),
]


def _gen_ssb_goldens():
    from py5gphy.nr_ssb import nr_ssb
    from py5gphy.common import nr_slot
    carrier0, ssb0, _ = _ref_configs()
    out = {}
    for i, (pci, sfn, slot, scs, bw, fc, kssb, ncrb) in enumerate(SSB_CASES):
        carrier = dict(carrier0)
        carrier.update(PCI=pci, scs=scs, BW=bw, carrier_frequency_in_mhz=fc,
                       num_of_ant=2)
        ssb_cfg = dict(ssb0)
        ssb_cfg.update(kSSB=kssb, NSSB_CRB=ncrb)
        if scs == 15:
            ssb_cfg["SSBPattern"] = "Case A"
            ssb_cfg["MIB"] = dict(ssb_cfg["MIB"],
                                  subCarrierSpacingCommon=0)
        nrssb = nr_ssb.NrSSB(carrier, ssb_cfg)
        prb = nr_slot.get_carrier_prb_size(scs, bw)
        fd, usage = nr_slot.init_fd_slot(2, prb)
        fd, usage = nrssb.process(fd, usage, sfn, slot)
        out[f"fd_{i}"] = fd
        out[f"usage_{i}"] = usage
    return out


@pytest.fixture(scope="module")
def ssb_goldens():
    return get_golden("ssb_slot", _gen_ssb_goldens)


@pytest.mark.parametrize("i", range(len(SSB_CASES)))
def test_ssb_slot_grid(ssb_goldens, i):
    pci, sfn, slot, scs, bw, fc, kssb, ncrb = SSB_CASES[i]
    carrier = merged(get_default_config("dl_carrier"),
                     dict(PCI=pci, scs=scs, BW=bw,
                          carrier_frequency_in_mhz=fc, num_of_ant=2))
    ssb_cfg = merged(get_default_config("ssb"),
                     dict(kSSB=kssb, NSSB_CRB=ncrb))
    if scs == 15:
        ssb_cfg["SSBPattern"] = "Case A"
        ssb_cfg["MIB"]["subCarrierSpacingCommon"] = 0
    ch = ssb_mod.NrSSB(carrier, ssb_cfg)
    from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size
    n_sc = 12 * carrier_prb_size(scs, bw)
    fd = np.zeros((2, 14 * n_sc), np.complex64)
    usage = np.zeros((2, 14 * n_sc), np.int8)
    fd, usage = ch.process(fd, usage, sfn, slot)
    np.testing.assert_allclose(fd, ssb_goldens[f"fd_{i}"], atol=2e-5)
    np.testing.assert_array_equal(usage, ssb_goldens[f"usage_{i}"])


def _gen_ssb_waveform_golden():
    from py5gphy.nr_ssb import nr_ssb
    from py5gphy.nr_waveform import nr_dl_waveform
    carrier, ssb_cfg, wf = _ref_configs()
    wf = dict(wf, numofslots=4)
    carrier = dict(carrier, num_of_ant=2)
    nrssb = nr_ssb.NrSSB(carrier, ssb_cfg)
    fd, td, dl, fs = nr_dl_waveform.gen_dl_waveform(wf, carrier, [nrssb])
    return {"fd": fd, "td": td, "dl": dl, "fs": np.array([fs])}


@pytest.fixture(scope="module")
def ssb_wave_golden():
    return get_golden("ssb_waveform", _gen_ssb_waveform_golden)


def test_ssb_only_waveform(ssb_wave_golden):
    carrier = merged(get_default_config("dl_carrier"), dict(num_of_ant=2))
    ssb_cfg = get_default_config("ssb")
    wf = merged(get_default_config("dl_waveform"), dict(numofslots=4))
    ch = ssb_mod.NrSSB(carrier, ssb_cfg)
    fd, td, dl, fs = dl_mod.gen_dl_waveform(wf, carrier, [ch])
    assert fs == ssb_wave_golden["fs"][0]
    np.testing.assert_allclose(fd, ssb_wave_golden["fd"], atol=2e-5)
    np.testing.assert_allclose(td, ssb_wave_golden["td"], atol=2e-4)
    np.testing.assert_allclose(dl, ssb_wave_golden["dl"], atol=2e-4)


def _gen_ssb_standalone_golden():
    from py5gphy.nr_ssb import nr_ssb
    carrier, ssb_cfg, _ = _ref_configs()
    out = {}
    for i, (nant, sr, fc) in enumerate([(2, 30.72, 3840), (1, 61.44, 0),
                                        (4, 30.72, 3610.08)]):
        c = dict(carrier, num_of_ant=nant, carrier_frequency_in_mhz=fc)
        nrssb = nr_ssb.NrSSB(c, dict(ssb_cfg))
        wf = dict(samplerate_in_mhz=sr, numofslots=4, startSFN=0,
                  startslot=0)
        out[f"td_{i}"] = nrssb.waveform_gen(wf)
    return out


@pytest.fixture(scope="module")
def ssb_standalone_golden():
    return get_golden("ssb_standalone_waveform", _gen_ssb_standalone_golden)


HIFS_CASES = [
    # (nant, samplerate_mhz, fc_mhz, ssb_scs) -> ifftsize 8192 (> 4096 CP
    # base), the case where an integer floor-divide CP scale would yield
    # all-zero CP lengths (reference uses float division)
    (2, 245.76, 3840, 30),
    (1, 122.88, 1900.05, 15),
]


def _gen_ssb_hifs_golden():
    from py5gphy.nr_ssb import nr_ssb
    carrier0, ssb0, _ = _ref_configs()
    out = {}
    for i, (nant, sr, fc, ssbscs) in enumerate(HIFS_CASES):
        c = dict(carrier0, num_of_ant=nant, carrier_frequency_in_mhz=fc)
        ssb_cfg = dict(ssb0)
        if ssbscs == 15:
            c["scs"] = 15
            ssb_cfg["SSBPattern"] = "Case A"
            ssb_cfg["MIB"] = dict(ssb_cfg["MIB"], subCarrierSpacingCommon=0)
        nrssb = nr_ssb.NrSSB(c, ssb_cfg)
        wf = dict(samplerate_in_mhz=sr, numofslots=2, startSFN=0, startslot=0)
        out[f"td_{i}"] = nrssb.waveform_gen(wf)
    return out


@pytest.fixture(scope="module")
def ssb_hifs_golden():
    return get_golden("ssb_waveform_hifs", _gen_ssb_hifs_golden)


def test_ssb_waveform_gen_large_ifft(ssb_hifs_golden):
    """waveform_gen at ifftsize 8192 (CP table scaled UP from 4096 base)."""
    carrier0 = get_default_config("dl_carrier")
    ssb0 = get_default_config("ssb")
    for i, (nant, sr, fc, ssbscs) in enumerate(HIFS_CASES):
        carrier = merged(carrier0, dict(num_of_ant=nant,
                                        carrier_frequency_in_mhz=fc))
        ssb_cfg = dict(ssb0)
        if ssbscs == 15:
            carrier["scs"] = 15
            ssb_cfg["SSBPattern"] = "Case A"
            ssb_cfg["MIB"] = dict(ssb_cfg["MIB"], subCarrierSpacingCommon=0)
        ch = ssb_mod.NrSSB(carrier, ssb_cfg)
        td = ch.waveform_gen(dict(samplerate_in_mhz=sr, numofslots=2,
                                  startSFN=0, startslot=0))
        golden = ssb_hifs_golden[f"td_{i}"]
        assert td.shape == golden.shape
        assert np.abs(golden).max() > 0
        np.testing.assert_allclose(td, golden, atol=2e-6)


def test_ssb_waveform_gen(ssb_standalone_golden):
    carrier0 = get_default_config("dl_carrier")
    ssb_cfg = get_default_config("ssb")
    for i, (nant, sr, fc) in enumerate([(2, 30.72, 3840), (1, 61.44, 0),
                                        (4, 30.72, 3610.08)]):
        carrier = merged(carrier0, dict(num_of_ant=nant,
                                        carrier_frequency_in_mhz=fc))
        ch = ssb_mod.NrSSB(carrier, ssb_cfg)
        td = ch.waveform_gen(dict(samplerate_in_mhz=sr, numofslots=4,
                                  startSFN=0, startslot=0))
        golden = ssb_standalone_golden[f"td_{i}"]
        assert td.shape == golden.shape
        np.testing.assert_allclose(td, golden, atol=2e-6)
