"""CRC encode/decode for 5G NR (TS 38.212 5.1) as GF(2) matmuls.

Behavior parity target: reference py5gphy crc (py5gphy/crc/crc.py:4-127) —
polynomials CRC6/11/16/24A/24B/24C, RNTI masking applied MSB-first over a
24-bit window keeping the L LSBs.

TPU design: instead of the reference's bit-serial LFSR loop, the CRC of a
length-A message is computed as a *chunked GF(2) matrix product*:

    crc(b) = sum_i b_i * (x^(A-1-i+L) mod g)            (mod 2)

Split b into N chunks of C bits. Each chunk's local remainder is a shared
(C, L) matmul; chunk i's remainder is then advanced by x^(C*(N-1-i)) via a
per-chunk (L, L) matrix. Both stages are dense f32 matmuls that map onto
the MXU, are fully parallel over chunks, and batch over messages. All
tables are built at plan time with O(log A) GF(2) doubling.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from python_5gtoolbox_tpu.utils.gf2 import gf2_matmul

# g(x) coefficients below the leading x^L term, MSB first (x^(L-1) ... x^0).
# TS 38.212 section 5.1.
CRC_POLYS: dict[str, np.ndarray] = {
    "6": np.array([1, 0, 0, 0, 0, 1], dtype=np.uint8),
    "11": np.array([1, 1, 0, 0, 0, 1, 0, 0, 0, 0, 1], dtype=np.uint8),
    "16": np.array([0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1], dtype=np.uint8),
    "24A": np.array(
        [1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1, 0, 1, 1],
        dtype=np.uint8,
    ),
    "24B": np.array(
        [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 1, 1],
        dtype=np.uint8,
    ),
    "24C": np.array(
        [1, 0, 1, 1, 0, 0, 1, 0, 1, 0, 1, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 1, 1, 1],
        dtype=np.uint8,
    ),
}


def crc_len(poly: str) -> int:
    return CRC_POLYS[poly.upper()].size


def _mul_x_mod_g(r: np.ndarray, g: np.ndarray) -> np.ndarray:
    """(x * r(x)) mod g(x). r is an L-vector of coefficients, MSB first."""
    top = r[0]
    shifted = np.concatenate([r[1:], [0]]).astype(np.uint8)
    if top:
        shifted ^= g
    return shifted


@functools.lru_cache(maxsize=None)
def _remainder_matrix(length: int, poly: str) -> np.ndarray:
    """(length, L) matrix R with R[i] = x^(length-1-i+L) mod g, MSB-first.

    crc(b) = (b @ R) mod 2 for a length-`length` message b.
    Built by GF(2) doubling: R_{2m} = [R_m @ M_m ; R_m] where M_m is the
    multiply-by-x^m map (equal to the top L rows of R_m once m >= L).
    """
    g = CRC_POLYS[poly.upper()]
    L = g.size
    # Seed: naive build for the first max(L, 8) rows (cheap).
    m0 = min(length, max(L, 8))
    rows = []
    r = np.zeros(L, dtype=np.uint8)
    if L > 0:
        # x^L mod g = g (since x^L = g(x) - tail, over GF(2) x^L mod g = tail)
        r = g.copy()
    rows.append(r)
    for _ in range(m0 - 1):
        r = _mul_x_mod_g(r, g)
        rows.append(r)
    # rows[k] = x^(L+k) mod g; R_m0[i] must be x^(m0-1-i+L) -> reverse.
    R = np.array(rows[::-1], dtype=np.uint8)
    m = m0
    while m < length:
        M = R[:L]  # multiply-by-x^m map (valid because m >= L for L<=24, m0>=L)
        R = np.vstack([gf2_matmul(R, M).astype(np.uint8), R])
        m *= 2
    return R[R.shape[0] - length:]


@functools.lru_cache(maxsize=None)
def _chunked_tables(length: int, poly: str, chunk: int):
    """Tables for the chunked device-side CRC.

    Returns (pad, Rc, M) with pad = front zero padding, Rc (chunk, L) local
    remainder matrix, M (N, L, L) per-chunk advance matrices.
    """
    L = crc_len(poly)
    n_chunks = -(-length // chunk)
    pad = n_chunks * chunk - length
    Rc = _remainder_matrix(chunk, poly)
    # Multiply-by-x^chunk map: R_k[i] = x^(k-1-i+L), so the rows
    # x^(chunk + L-1-j), j = 0..L-1 are the top L rows of R_chunk (chunk >= L).
    if chunk < L:  # pragma: no cover - chunk is always >= 24 in practice
        raise ValueError("chunk must be >= CRC length")
    Mc = Rc[:L]
    mats = np.zeros((n_chunks, L, L), dtype=np.uint8)
    acc = np.eye(L, dtype=np.uint8)
    # chunk i (front-most) is advanced by x^(chunk*(N-1-i)).
    for k in range(n_chunks):
        mats[n_chunks - 1 - k] = acc
        acc = gf2_matmul(acc, Mc).astype(np.uint8)
    return pad, Rc, mats


def _mask_bits(mask, L):
    """Reference masking: 24-bit MSB-first expansion of mask, keep L LSBs.

    Accepts python int (static) or jnp int array (traced).
    """
    shifts = np.arange(23, -1, -1)[24 - L:]
    if isinstance(mask, (int, np.integer)):
        return np.array([(int(mask) >> int(s)) & 1 for s in shifts], dtype=np.int8)
    mask = jnp.asarray(mask, jnp.int32)
    return ((mask[..., None] >> jnp.asarray(shifts, jnp.int32)) & 1).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Host (NumPy) path — used by planners and tests.
# ---------------------------------------------------------------------------

def crc_compute_np(bits: np.ndarray, poly: str, mask: int = 0) -> np.ndarray:
    """CRC parity bits of `bits` (..., A) int 0/1, NumPy, exact reference math."""
    bits = np.asarray(bits)
    A = bits.shape[-1]
    L = crc_len(poly)
    R = _remainder_matrix(A, poly)
    rem = (bits.astype(np.int64) @ R.astype(np.int64)) % 2
    if mask:
        rem = np.bitwise_xor(rem, _mask_bits(mask, L).astype(np.int64))
    return rem.astype(np.int8)


def crc_encode_np(bits: np.ndarray, poly: str, mask: int = 0) -> np.ndarray:
    """Append CRC parity: (..., A) -> (..., A+L). Mirrors nr_crc_encode."""
    bits = np.asarray(bits).astype(np.int8)
    rem = crc_compute_np(bits, poly, mask)
    return np.concatenate([bits, rem], axis=-1)


def crc_decode_np(blkandcrc: np.ndarray, poly: str, mask: int = 0):
    """Return (blk, err) like nr_crc_decode: err=1 on CRC mismatch."""
    blkandcrc = np.asarray(blkandcrc).astype(np.int8)
    L = crc_len(poly)
    blk = blkandcrc[..., :-L]
    rem = crc_compute_np(blk, poly, mask)
    err = np.any(rem != blkandcrc[..., -L:], axis=-1).astype(np.int8)
    return blk, err


# ---------------------------------------------------------------------------
# Device (JAX) path — chunked MXU-friendly formulation.
# ---------------------------------------------------------------------------

_CHUNK = 512


def crc_compute(bits: jnp.ndarray, poly: str, mask=0) -> jnp.ndarray:
    """CRC parity of `bits` (..., A) -> (..., L), jittable, batched.

    `bits` may be any integer/float 0/1 dtype; A must be static.
    `mask` may be a static int or a traced int32 (e.g. per-TB RNTI).
    """
    A = bits.shape[-1]
    L = crc_len(poly)
    if A < _CHUNK:
        R = jnp.asarray(_remainder_matrix(A, poly), jnp.float32)
        rem = jnp.mod(jnp.matmul(bits.astype(jnp.float32), R,
                                 precision=jax_precision()), 2.0)
    else:
        pad, Rc, mats = _chunked_tables(A, poly, _CHUNK)
        x = bits.astype(jnp.float32)
        if pad:
            x = jnp.concatenate(
                [jnp.zeros(bits.shape[:-1] + (pad,), jnp.float32), x], axis=-1)
        n = x.shape[-1] // _CHUNK
        x = x.reshape(x.shape[:-1] + (n, _CHUNK))
        partial = jnp.mod(
            jnp.matmul(x, jnp.asarray(Rc, jnp.float32), precision=jax_precision()),
            2.0)  # (..., n, L)
        rem = jnp.mod(
            jnp.einsum("...nl,nlk->...k", partial, jnp.asarray(mats, jnp.float32),
                       precision=jax_precision()), 2.0)
    rem = rem.astype(jnp.int8)
    if isinstance(mask, (int, np.integer)):
        if mask:
            rem = jnp.bitwise_xor(rem, jnp.asarray(_mask_bits(mask, L)))
    else:
        rem = jnp.bitwise_xor(rem, _mask_bits(mask, L))
    return rem


def crc_encode(bits: jnp.ndarray, poly: str, mask=0) -> jnp.ndarray:
    """Append CRC parity bits: (..., A) -> (..., A+L) int8."""
    rem = crc_compute(bits, poly, mask)
    return jnp.concatenate([bits.astype(jnp.int8), rem], axis=-1)


def crc_check(blkandcrc: jnp.ndarray, poly: str, mask=0) -> jnp.ndarray:
    """Return per-message error flag (..., ) int8; 0 = CRC pass."""
    L = crc_len(poly)
    rem = crc_compute(blkandcrc[..., :-L], poly, mask)
    neq = rem != blkandcrc[..., -L:].astype(jnp.int8)
    return jnp.any(neq, axis=-1).astype(jnp.int8)


def jax_precision():
    """Matmul precision for exact small-integer arithmetic in f32."""
    import jax.lax as lax

    return lax.Precision.HIGHEST
