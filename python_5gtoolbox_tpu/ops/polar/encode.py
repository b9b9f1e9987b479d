"""Polar encoder, TS 38.212 5.3.1 — butterfly network, batched.

Behavior parity target: py5gphy/polar/nr_polar_encoder.py:9-66 (optional
K-interleaver, frozen/PC bit insertion with the cyclic 5-register, u*G_N).

TPU design: instead of the reference's dense Kronecker matrix u @ G_N,
the transform is the log2(N)-stage XOR butterfly (reshape + xor), fully
batched over codewords. The parity-check register recursion is resolved
at *plan time*: the 5-cycle register means PC bit at position p equals
the XOR of the info bits already placed at positions q < p with
q === p (mod 5), which is a static subset per PC bit — so the device
side is a scatter of the K input bits plus a handful of masked XOR
reductions, no sequential register.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from python_5gtoolbox_tpu.ops.polar.construct import construct
from python_5gtoolbox_tpu.ops.polar.interleave import input_interleave_table


@functools.lru_cache(maxsize=None)
def _u_plan(K: int, E: int, n_max: int, i_il: int):
    """Static placement plan.

    Returns (N, info_pos (K,), pc_pos (nPC,), pc_sources list of index
    arrays into the *interleaved* input bits, interleave table or None).
    """
    F, qpc, N, nPC, _ = construct(K, E, n_max)
    qpc_set = set(int(x) for x in qpc)
    info_pos = []        # u positions receiving input bits, in input order
    placed = []          # (u_position, input_index) for info bits
    k = 0
    for idx in range(N):
        if F[idx] == 0 and idx not in qpc_set:
            info_pos.append(idx)
            placed.append((idx, k))
            k += 1
    assert k == K
    pc_pos = [int(x) for x in qpc]
    pc_sources = []
    for p in sorted(pc_pos):
        src = [ki for (pos, ki) in placed if pos < p and pos % 5 == p % 5]
        pc_sources.append(np.asarray(src, np.int32))
    itrl = input_interleave_table(K) if i_il else None
    return (N, np.asarray(info_pos, np.int32),
            np.asarray(sorted(pc_pos), np.int32), pc_sources, itrl)


def butterfly(u: jnp.ndarray) -> jnp.ndarray:
    """x = u G_N over GF(2): log2(N) XOR stages. u: (..., N) int8."""
    N = u.shape[-1]
    n = N.bit_length() - 1
    x = u
    for s in range(n):
        h = 1 << s
        x = x.reshape(x.shape[:-1] + (N // (2 * h), 2, h))
        upper = jnp.bitwise_xor(x[..., 0, :], x[..., 1, :])
        x = jnp.concatenate([upper[..., None, :], x[..., 1:, :]], axis=-2)
        x = x.reshape(x.shape[:-3] + (N,))
    return x


def polar_encode(bits: jnp.ndarray, E: int, n_max: int, i_il: int) -> jnp.ndarray:
    """(..., K) info+CRC bits -> (..., N) polar codeword. Jittable."""
    K = bits.shape[-1]
    N, info_pos, pc_pos, pc_sources, itrl = _u_plan(K, E, n_max, i_il)
    b = bits.astype(jnp.int8)
    if itrl is not None:
        b = b[..., jnp.asarray(itrl)]
    u = jnp.zeros(b.shape[:-1] + (N,), jnp.int8)
    u = u.at[..., jnp.asarray(info_pos)].set(b)
    for p, src in zip(pc_pos, pc_sources):
        if src.size:
            pc = jnp.sum(b[..., jnp.asarray(src)].astype(jnp.int32),
                         axis=-1) % 2
        else:
            pc = jnp.zeros(b.shape[:-1], jnp.int32)
        u = u.at[..., int(p)].set(pc.astype(jnp.int8))
    return butterfly(u)


def polar_encode_np(bits: np.ndarray, E: int, n_max: int, i_il: int) -> np.ndarray:
    return np.asarray(polar_encode(jnp.asarray(np.asarray(bits)[None]),
                                   E, n_max, i_il))[0]
