"""Small block codes (32, K<=11) Reed-Muller-style, TS 38.212 5.3.3.

Behavior parity target: py5gphy/smallblock/nr_smallblock_*.py — 1-bit and
2-bit special tables with (-1, -2) = (x, y) scrambling placeholders,
(32, K) linear code for 3..11 bits, repetition rate match, accumulate
rate recover, ML decode by correlation.

TPU design: the 3..11-bit encode is a (., K) x (K, 32) GF(2) matmul; ML
decode is a (., 32) x (32, 2^K) correlation matmul — both MXU-native and
batched. Placeholder bits are int8 codes -1/-2 exactly like the
reference so the PUSCH scrambler can special-case them.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# TS 38.212 Table 5.3.3.1-1 (1 bit) / 5.3.3.2-1 (2 bits) by Qm//2 offset.
# codes: 0->c0, 3->c1, 5->c2=(c0+c1)%2, -1->x placeholder, -2->y placeholder
_ENC_1BIT = [[0], [0, -2], [0, -2, -1, -1], [0, -2, -1, -1, -1, -1],
             [0, -2, -1, -1, -1, -1, -1, -1]]
_ENC_2BIT = [
    [0, 3, 5],
    [0, 3, 5, 0, 3, 5],
    [0, 3, -1, -1, 5, 0, -1, -1, 3, 5, -1, -1],
    [0, 3, -1, -1, -1, -1, 5, 0, -1, -1, -1, -1, 3, 5, -1, -1, -1, -1],
    [0, 3, -1, -1, -1, -1, -1, -1, 5, 0, -1, -1, -1, -1, -1, -1, 3, 5,
     -1, -1, -1, -1, -1, -1],
]

# TS 38.212 Table 5.3.3.3-1 basis sequences M_i,n (32 x 11).
BASIS = np.array([
    [1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    [1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 1],
    [1, 0, 0, 1, 0, 0, 1, 0, 1, 1, 1],
    [1, 0, 1, 1, 0, 0, 0, 0, 1, 0, 1],
    [1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 1],
    [1, 1, 0, 0, 1, 0, 1, 1, 1, 0, 1],
    [1, 0, 1, 0, 1, 0, 1, 0, 1, 1, 1],
    [1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 1],
    [1, 1, 0, 1, 1, 0, 0, 1, 0, 1, 1],
    [1, 0, 1, 1, 1, 0, 1, 0, 0, 1, 1],
    [1, 0, 1, 0, 0, 1, 1, 1, 0, 1, 1],
    [1, 1, 1, 0, 0, 1, 1, 0, 1, 0, 1],
    [1, 0, 0, 1, 0, 1, 0, 1, 1, 1, 1],
    [1, 1, 0, 1, 0, 1, 0, 1, 0, 1, 1],
    [1, 0, 0, 0, 1, 1, 0, 1, 0, 0, 1],
    [1, 1, 0, 0, 1, 1, 1, 1, 0, 1, 1],
    [1, 1, 1, 0, 1, 1, 1, 0, 0, 1, 0],
    [1, 0, 0, 1, 1, 1, 0, 0, 1, 0, 0],
    [1, 1, 0, 1, 1, 1, 1, 1, 0, 0, 0],
    [1, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0],
    [1, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1],
    [1, 1, 0, 1, 0, 0, 0, 0, 0, 1, 1],
    [1, 0, 0, 0, 1, 0, 0, 1, 1, 0, 1],
    [1, 1, 1, 0, 1, 0, 0, 0, 1, 1, 1],
    [1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 0],
    [1, 1, 0, 0, 0, 1, 1, 1, 0, 0, 1],
    [1, 0, 1, 1, 0, 1, 0, 0, 1, 1, 0],
    [1, 1, 1, 1, 0, 1, 0, 1, 1, 1, 0],
    [1, 0, 1, 0, 1, 1, 1, 0, 1, 0, 0],
    [1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0],
    [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
], dtype=np.int8)


def encode_smallblock_np(inbits: np.ndarray, qm: int = 2) -> np.ndarray:
    """Single-block encode, reference-compatible (incl. -1/-2 codes)."""
    inbits = np.asarray(inbits)
    k = inbits.size
    assert k < 12 and qm in (1, 2, 4, 6, 8)
    off = qm // 2
    if k == 1:
        dn = np.asarray(_ENC_1BIT[off], np.int8).copy()
        dn[0] = inbits[0]
        return dn
    if k == 2:
        c = [int(inbits[0]), int(inbits[1]), (int(inbits[0]) + int(inbits[1])) % 2]
        dn = np.asarray(_ENC_2BIT[off], np.int8).copy()
        out = dn.copy()
        out[dn == 0] = c[0]
        out[dn == 3] = c[1]
        out[dn == 5] = c[2]
        return out
    return ((BASIS[:, :k].astype(np.int64) @ inbits.astype(np.int64)) % 2
            ).astype(np.int8)


def encode_smallblock(bits: jnp.ndarray, qm: int = 2) -> jnp.ndarray:
    """Batched jittable encode for K >= 3: (..., K) -> (..., 32)."""
    k = bits.shape[-1]
    assert 3 <= k < 12
    m = jnp.asarray(BASIS[:, :k].T, jnp.float32)
    import jax.lax as lax
    return jnp.mod(jnp.matmul(bits.astype(jnp.float32), m,
                              precision=lax.Precision.HIGHEST), 2.0
                   ).astype(jnp.int8)


def ratematch_smallblock(dn: jnp.ndarray, E: int) -> jnp.ndarray:
    """(..., N) -> (..., E) repetition (38.212 5.4.3)."""
    N = dn.shape[-1]
    idx = np.arange(E) % N
    return dn[..., jnp.asarray(idx, np.int32)]


def raterecover_smallblock(llr: jnp.ndarray, N: int) -> jnp.ndarray:
    """(..., E) LLRs -> (..., N): accumulate repeated transmissions."""
    E = llr.shape[-1]
    pad = (-E) % N
    x = llr.astype(jnp.float32)
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(llr.shape[:-1] + (pad,), jnp.float32)], axis=-1)
    return jnp.sum(x.reshape(x.shape[:-1] + (-1, N)), axis=-2)


@functools.lru_cache(maxsize=None)
def _codebook(k: int) -> np.ndarray:
    """(2^k, 32) +-1 codebook for ML correlation decode (bit0 -> +1)."""
    msgs = ((np.arange(2 ** k)[:, None] >> np.arange(k)) & 1).astype(np.int8)
    cw = (msgs.astype(np.int64) @ BASIS[:, :k].T.astype(np.int64)) % 2
    return (1 - 2 * cw).astype(np.float32)


def decode_smallblock(llr: jnp.ndarray, k: int) -> jnp.ndarray:
    """ML decode (..., 32) LLRs -> (..., k) bits (K >= 3).

    Correlation against all 2^k codewords — a single MXU matmul.
    LLR convention: positive -> bit 0.
    """
    import jax.lax as lax
    cb = jnp.asarray(_codebook(k))  # (2^k, 32)
    corr = jnp.matmul(llr.astype(jnp.float32), cb.T,
                      precision=lax.Precision.HIGHEST)
    best = jnp.argmax(corr, axis=-1)
    return ((best[..., None] >> jnp.arange(k)) & 1).astype(jnp.int8)
