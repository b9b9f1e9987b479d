"""Polar code-block segmentation for UCI, TS 38.212 6.3.1.2.1 / 5.2.1.

Behavior parity target: py5gphy/polar/nr_polar_cbsegment.py:6-55 —
optional 2-segment split with front zero padding and per-CB CRC6/11.
"""
from __future__ import annotations

import numpy as np

from python_5gtoolbox_tpu.ops import crc as crc_ops


def polar_cb_segment(uci_bits: np.ndarray, e_uci: int):
    """(A,) UCI bits -> (cbs (C, Ar+L), C, Er)."""
    uci_bits = np.asarray(uci_bits, np.int8)
    A = uci_bits.size
    assert 12 <= A <= 1706
    if A >= 1013 or (A >= 360 and e_uci >= 1088):
        assert e_uci % 2 == 0
        C = 2
        padded = uci_bits if A % 2 == 0 else np.concatenate(
            [np.zeros(1, np.int8), uci_bits])
        cbs_in = padded.reshape(2, -1)
        poly = "11"
    else:
        C = 1
        cbs_in = uci_bits.reshape(1, -1)
        poly = "6" if A <= 19 else "11"
    out = np.stack([crc_ops.crc_encode_np(cb, poly) for cb in cbs_in])
    return out, C, e_uci // C
