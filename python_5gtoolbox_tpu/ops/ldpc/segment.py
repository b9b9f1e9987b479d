"""Code-block segmentation + CB-CRC attach, TS 38.212 5.2.2.

Behavior parity target: py5gphy/ldpc/nr_ldpc_cbsegment.py:7-33.

TPU shape convention: fillers are represented by a plan-time mask (and
zeros in the bit tensor), not -1 sentinels; the -1 convention is only
reproduced in the NumPy parity wrapper for golden tests.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from python_5gtoolbox_tpu.ops import crc as crc_ops
from python_5gtoolbox_tpu.ops.ldpc.tables import CBInfo, get_cbs_info


def cb_segment(inbits: jnp.ndarray, info: CBInfo) -> jnp.ndarray:
    """(B,) bits -> (C, K) code blocks with CB-CRC24B, filler bits = 0.

    Jittable; B and the segmentation geometry are static via `info`.
    """
    C, cbz, L, K = info.C, info.cbz, info.L, info.K
    cbs = inbits.astype(jnp.int8).reshape(C, cbz)
    if C > 1:
        cbs = crc_ops.crc_encode(cbs, "24B")
    pad = K - (cbz + L)
    if pad:
        cbs = jnp.concatenate(
            [cbs, jnp.zeros((C, pad), jnp.int8)], axis=-1)
    return cbs


def cb_segment_np(inbits: np.ndarray, bgn: int):
    """Reference-compatible wrapper: returns (cbs with -1 fillers, Zc)."""
    info = get_cbs_info(int(np.asarray(inbits).size), bgn)
    cbs = np.asarray(cb_segment(jnp.asarray(inbits), info)).astype(np.int8).copy()
    if info.F:
        cbs[:, info.Kd:] = -1
    return cbs, info.Zc
