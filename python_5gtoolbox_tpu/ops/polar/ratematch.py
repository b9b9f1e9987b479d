"""Polar rate matching / recovery, TS 38.212 5.4.1.

Behavior parity target: py5gphy/polar/nr_polar_ratematch.py:6-70 and
nr_polar_raterecover.py:6-100 — sub-block interleave, repetition /
puncturing / shortening bit selection, iBIL triangular channel
interleaver, and the LLR-domain inverse (puncture -> LLR 0, shorten ->
+LLR_limit, repetition -> LLR accumulation).

All index walks are static per (K, E, N): plan-time tables, device-side
gathers / segment adds, batched over code blocks.
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from python_5gtoolbox_tpu.ops.polar.construct import subblock_jn


def subblock_interleave_table(N: int) -> np.ndarray:
    return subblock_jn(N)


@functools.lru_cache(maxsize=None)
def triangle_interleave_table(E: int) -> np.ndarray:
    """iBIL triangular interleaver: out[k] = in[tbl[k]] (38.212 5.4.1.3)."""
    T = math.ceil((-1 + math.sqrt(1 + 8 * E)) / 2)
    V = -np.ones((T, T), np.int64)
    k = 0
    for m in range(T):
        for n in range(T - m):
            if k < E:
                V[m, n] = k
            k += 1
    out = []
    for n in range(T):
        for m in range(T - n):
            if V[m, n] >= 0:
                out.append(V[m, n])
    return np.asarray(out, np.int32)


@functools.lru_cache(maxsize=None)
def _ratematch_table(K: int, E: int, N: int, i_bil: int) -> np.ndarray:
    """Composite gather table: fk = dn[tbl] for the full RM chain."""
    jn = subblock_jn(N)          # yn[n] = dn[jn[n]]
    if E >= N:
        sel = np.arange(E) % N   # repetition
    elif (K / E) <= 7 / 16:
        sel = np.arange(E) + (N - E)  # puncturing: keep tail
    else:
        sel = np.arange(E)            # shortening: keep head
    ek_tbl = jn[sel]
    if i_bil:
        tri = triangle_interleave_table(E)
        return ek_tbl[tri].astype(np.int32)
    return ek_tbl.astype(np.int32)


def polar_ratematch(dn: jnp.ndarray, K: int, E: int, i_bil: int) -> jnp.ndarray:
    """(..., N) codeword -> (..., E) rate-matched bits. Jittable."""
    N = dn.shape[-1]
    tbl = _ratematch_table(K, E, N, i_bil)
    return dn[..., jnp.asarray(tbl)]


def polar_raterecover(llr: jnp.ndarray, K: int, N: int, i_bil: int,
                      llr_limit: float = 20.0,
                      reference_compat: bool = False) -> jnp.ndarray:
    """(..., E) LLRs -> (..., N) mother-code LLRs.

    Matches the reference (nr_polar_raterecover.py:6-64) except one bug
    fix: the reference's repetition (E >= N) path forgets the iBIL
    triangle deinterleave (it accumulates the raw LLR stream,
    nr_polar_raterecover.py:40-47), which breaks any iBIL=1 repetition
    config. We deinterleave first; pass reference_compat=True to get
    the reference's exact (buggy) behavior for golden-parity tests.
    """
    E = llr.shape[-1]
    llr = llr.astype(jnp.float32)
    jn = subblock_jn(N)
    inv_jn = np.zeros(N, np.int32)
    inv_jn[jn] = np.arange(N, dtype=np.int32)  # LLRout[jn[n]] = outN[n]

    if i_bil and not (reference_compat and E >= N):
        tri = triangle_interleave_table(E)
        inv_tri = np.zeros(E, np.int32)
        inv_tri[tri] = np.arange(E, dtype=np.int32)
        ine = llr[..., jnp.asarray(inv_tri)]
    else:
        ine = llr

    if E >= N:
        pad = (-E) % N
        x = ine
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros(llr.shape[:-1] + (pad,), jnp.float32)], axis=-1)
        outn = jnp.sum(x.reshape(x.shape[:-1] + (-1, N)), axis=-2)
    else:
        if (K / E) <= 7 / 16:   # puncturing: LLR 0 at head
            outn = jnp.concatenate(
                [jnp.zeros(llr.shape[:-1] + (N - E,), jnp.float32), ine],
                axis=-1)
        else:                   # shortening: +limit at tail
            outn = jnp.concatenate(
                [ine, jnp.full(llr.shape[:-1] + (N - E,), llr_limit,
                               jnp.float32)], axis=-1)
    # sub-block deinterleave: LLRout[jn[n]] = outn[n]
    return outn[..., jnp.asarray(inv_jn)]
