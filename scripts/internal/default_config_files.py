"""Default-config helpers for the example scripts
(reference scripts/internal/default_config_files.py)."""
from __future__ import annotations

from python_5gtoolbox_tpu.utils.config import get_default_config


def read_dl_default_config_files():
    """-> (carrier, ssb, pdsch, pdcch, coreset, search_space, csirs)."""
    return (get_default_config("dl_carrier"), get_default_config("ssb"),
            get_default_config("pdsch"), get_default_config("pdcch"),
            get_default_config("coreset"), get_default_config("search_space"),
            get_default_config("csirs"))


def read_ul_default_config_files():
    """-> (carrier, pusch, srs, pucch f0..f4)."""
    return (get_default_config("ul_carrier"), get_default_config("pusch"),
            get_default_config("srs"),
            get_default_config("pucch_format0"),
            get_default_config("pucch_format1"),
            get_default_config("pucch_format2"),
            get_default_config("pucch_format3"),
            get_default_config("pucch_format4"))
