"""Config-validation layer: named errors at construction.

Reference parity: py5gphy/nr_ssb/nr_ssb_validate.py:6,
nr_pusch/nr_pusch_validation.py:5, nr_pucch format ctor asserts
(nr_pucch_format2.py:34-44 etc.). Valid default configs construct;
single-field corruptions raise ValueError naming the field.
"""
import numpy as np
import pytest

from python_5gtoolbox_tpu.utils.config import get_default_config, merged


def _carrier(ul=False, **kw):
    c = get_default_config("ul_carrier" if ul else "dl_carrier")
    return merged(c, kw)


def test_ssb_valid_and_invalid():
    from python_5gtoolbox_tpu.phy.ssb import NrSSB
    carrier = _carrier()
    NrSSB(carrier, get_default_config("ssb"))  # default is valid
    bad = get_default_config("ssb")
    bad["kSSB"] = 24
    with pytest.raises(ValueError, match="kSSB"):
        NrSSB(carrier, bad)
    bad = get_default_config("ssb")
    bad["MIB"]["pdcch_ConfigSIB1"] = 256
    with pytest.raises(ValueError, match="pdcch_ConfigSIB1"):
        NrSSB(carrier, bad)


def test_pusch_valid_and_invalid():
    from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
    carrier = _carrier(ul=True, num_of_ant=2)
    NrPUSCH(carrier, get_default_config("pusch"))
    for field, value, pat in [
            ("rnti", 0, "rnti"),
            ("mcs_index", 28, "mcs_index"),
            ("nHARQID", 16, "nHARQID"),
            ("UCIScaling", 0.7, "UCIScaling")]:
        bad = get_default_config("pusch")
        bad[field] = value
        with pytest.raises(ValueError, match=pat):
            NrPUSCH(carrier, bad)
    # cross-field: allocation exceeding the carrier
    bad = get_default_config("pusch")
    bad["ResAlloType1"]["RBStart"] = 270
    with pytest.raises(ValueError, match="ResAlloType1"):
        NrPUSCH(carrier, bad)
    # layers > antennas
    bad = merged(get_default_config("pusch"),
                 dict(num_of_layers=2, nNrOfAntennaPorts=2))
    with pytest.raises(ValueError, match="num_of_layers"):
        NrPUSCH(_carrier(ul=True, num_of_ant=1), bad)


@pytest.mark.parametrize("fmt,field,value,pat", [
    (0, "initialCyclicShift", 12, "initialCyclicShift"),
    (0, "SR", "maybe", "SR"),
    (1, "nrofSymbols", 3, "nrofSymbols"),
    (2, "NumUCIBits", 5, "NumUCIBits"),
    (3, "nrofPRBs", 7, "nrofPRBs"),
    (4, "occ_index", 2, "occ_index"),
])
def test_pucch_invalid(fmt, field, value, pat):
    from python_5gtoolbox_tpu.phy import pucch as P
    cls = getattr(P, f"NrPUCCHFormat{fmt}")
    carrier = _carrier(ul=True)
    cfg = get_default_config(f"pucch_format{fmt}")
    cls(carrier, cfg)  # default valid
    cfg[field] = value
    if fmt == 2 and field == "NumUCIBits":
        cfg["UCIbits"] = [1] * value
    with pytest.raises(ValueError, match=pat):
        cls(carrier, cfg)
