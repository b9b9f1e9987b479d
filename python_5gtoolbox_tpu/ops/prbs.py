"""Gold-sequence PRBS generator, TS 38.211 5.2.1.

Behavior parity target: py5gphy/common/nrPRBS.py:5-28 (bit-serial x1/x2
LFSR loop with Nc=1600 fast-forward).

TPU design: the length-31 LFSR recurrences are linear over GF(2), so the
whole generator is expressed with three small dense tables built once at
import time per LFSR:

  * T_pow2[k]  — state-advance matrices T^(2^k) for O(log n) jumps,
  * O_B (B,31) — "output matrix" mapping a state to its next B sequence
                 bits,
  * per-block state matrices A_i = T^(1600 + offset + B*i).

The x1 sequence never depends on c_init and is precomputed as a host
constant. The x2 part becomes two tiny mod-2 einsums over the traced
c_init state — fully parallel over blocks, no sequential scan. Sequences
for *static* c_init are produced directly in NumPy at plan time.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from python_5gtoolbox_tpu.utils.gf2 import gf2_matmul, gf2_matpow

_NC = 1600
_BLOCK = 2048

# Tap masks: x1(n+31) = x1(n+3) + x1(n); x2(n+31) = x2(n+3)+x2(n+2)+x2(n+1)+x2(n)
_TAPS_X1 = (0, 3)
_TAPS_X2 = (0, 1, 2, 3)


@functools.lru_cache(maxsize=None)
def _step_matrix(taps) -> np.ndarray:
    """31x31 GF(2) matrix advancing state s_n = (x[n..n+30]) by one step."""
    T = np.zeros((31, 31), dtype=np.uint8)
    for j in range(30):
        T[j, j + 1] = 1
    for t in taps:
        T[30, t] = 1
    return T


@functools.lru_cache(maxsize=None)
def _output_matrix(taps, nbits: int) -> np.ndarray:
    """(nbits, 31) matrix O with bit[j] = O[j] . s_n over GF(2).

    Rows j < 31 are unit vectors (the state IS the next 31 bits); later
    rows follow the recurrence row[j] = row[j-31+t0] ^ row[j-31+t1] ...
    """
    O = np.zeros((nbits, 31), dtype=np.uint8)
    n0 = min(nbits, 31)
    O[:n0] = np.eye(31, dtype=np.uint8)[:n0]
    for j in range(31, nbits):
        acc = np.zeros(31, dtype=np.uint8)
        for t in taps:
            acc ^= O[j - 31 + t]
        O[j] = acc
    return O


@functools.lru_cache(maxsize=None)
def _jump(taps, n: int) -> np.ndarray:
    """T^n over GF(2) for the given LFSR."""
    return gf2_matpow(_step_matrix(taps), n)


def _gen_lfsr_np(taps, state: np.ndarray, n: int, offset: int) -> np.ndarray:
    """Generate n sequence bits starting at absolute index offset (NumPy)."""
    s = gf2_matmul(_jump(taps, offset), state) % 2
    out = np.empty(n, dtype=np.int8)
    O = _output_matrix(taps, _BLOCK)
    Tb = _jump(taps, _BLOCK)
    pos = 0
    while pos < n:
        m = min(_BLOCK, n - pos)
        out[pos:pos + m] = (O[:m].astype(np.int64) @ s.astype(np.int64)) % 2
        s = gf2_matmul(Tb, s)
        pos += _BLOCK
    return out


@functools.lru_cache(maxsize=None)
def _x1_seq_np_cached(n: int, offset: int):
    state = np.zeros(31, dtype=np.uint8)
    state[0] = 1
    seq = _gen_lfsr_np(_TAPS_X1, state, n, _NC + offset)
    seq.setflags(write=False)
    return seq


def gen_prbs_np(c_init: int, n: int, offset: int = 0) -> np.ndarray:
    """c(n) for n in [offset, offset+n): the reference's gen_nrPRBS with a
    start offset. Host-side plan-time generation, O(log) jump + blockwise."""
    c_init, n, offset = int(c_init), int(n), int(offset)
    x1 = _x1_seq_np_cached(n, offset)
    x2_state = np.array([(c_init >> i) & 1 for i in range(31)], dtype=np.uint8)
    x2 = _gen_lfsr_np(_TAPS_X2, x2_state, n, _NC + offset)
    return ((x1 + x2) % 2).astype(np.int8)


# ---------------------------------------------------------------------------
# Device (JAX) path with traced c_init.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _x2_block_tables(n: int, offset: int):
    """Stacked A_i = T2^(1600+offset+B*i) and the x2 output matrix."""
    n_blocks = -(-n // _BLOCK)
    A = np.zeros((n_blocks, 31, 31), dtype=np.uint8)
    acc = _jump(_TAPS_X2, _NC + offset)
    Tb = _jump(_TAPS_X2, _BLOCK)
    for i in range(n_blocks):
        A[i] = acc
        acc = gf2_matmul(acc, Tb).astype(np.uint8)
    O = _output_matrix(_TAPS_X2, _BLOCK)
    return A, O


def c_init_to_state(c_init) -> jnp.ndarray:
    """Traced int32 c_init -> (31,) float32 LSB-first state vector."""
    c_init = jnp.asarray(c_init, jnp.uint32)
    shifts = jnp.arange(31, dtype=jnp.uint32)
    return ((c_init[..., None] >> shifts) & 1).astype(jnp.float32)


def gen_prbs(c_init, n: int, offset: int = 0) -> jnp.ndarray:
    """Jittable PRBS: c_init may be traced (scalar or batched (...,)).

    Returns (..., n) int8. n and offset are static.
    """
    from jax import lax

    A, O = _x2_block_tables(n, offset)
    n_blocks = A.shape[0]
    s2 = c_init_to_state(c_init)  # (..., 31)
    states = jnp.mod(
        jnp.einsum("bij,...j->...bi", jnp.asarray(A, jnp.float32), s2,
                   precision=lax.Precision.HIGHEST), 2.0)
    bits2 = jnp.mod(
        jnp.einsum("oj,...bj->...bo", jnp.asarray(O, jnp.float32), states,
                   precision=lax.Precision.HIGHEST), 2.0)
    bits2 = bits2.reshape(bits2.shape[:-2] + (n_blocks * _BLOCK,))[..., :n]
    x1 = jnp.asarray(_x1_seq_np_cached(n, offset))
    return jnp.bitwise_xor(bits2.astype(jnp.int8), x1)
