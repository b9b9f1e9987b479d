"""LDPC encoder, TS 38.212 5.3.2 — shift-table formulation, batched.

Behavior parity target: py5gphy/ldpc/nr_ldpc_encode.py:8-126 (4-row core
parity trick). Same math, but expressed entirely with per-block cyclic
shifts (jnp.roll) on a (codewords, block_cols, Zc) tensor instead of a
dense lifted H — no Zc x Zc matrices are ever built, and the whole
encoder is one jittable graph batched over code blocks.

Core parity derivation (plan time, generic over BG/iLS): a base-graph
block with shift P acts on a Zc-vector v as roll(v, -P). Summing the
first four check rows cancels p2..p4 (double-diagonal), leaving a single
surviving shift s on p1, so p1 = roll(L2, s). The remaining p2..p4 are
solved by a plan-time triangular elimination over the 4-row core.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from python_5gtoolbox_tpu.ops.ldpc.tables import (
    BG_DIMS, BG_INFO_COLS, find_ils, shift_table)


@functools.lru_cache(maxsize=None)
def _encode_plan(bgn: int, zc: int):
    """Static encoding recipe for (bgn, Zc).

    Returns dict with:
      kb          — number of systematic block-columns
      p1_shift    — s such that p1 = roll(L2, s)
      core_solve  — ordered list of (target_parity in 1..3 local idx,
                    row, [(colkind, idx, shift), ...]) to solve p2..p4
      rows        — per check row: list of (block_col, shift) for all
                    edges into systematic+core-parity columns
    """
    nrows, ncols = BG_DIMS[bgn]
    kb = BG_INFO_COLS[bgn]
    st = shift_table(bgn, zc)

    # p1 column = kb; its 4-core-row shifts with GF(2) pair cancellation.
    p1_shifts = [int(st[r, kb]) for r in range(4) if st[r, kb] >= 0]
    surviving: dict[int, int] = {}
    for s in p1_shifts:
        surviving[s] = surviving.get(s, 0) ^ 1
    live = [s for s, c in surviving.items() if c]
    assert len(live) == 1, f"unexpected p1 core structure {p1_shifts}"
    p1_shift = live[0]

    # Triangular solve for p2..p4 over the 4 core rows.
    known = {kb}  # parity columns already solved (block-col indices)
    order = []
    rows_used = set()
    while len(known) < 4:
        progressed = False
        for r in range(4):
            if r in rows_used:
                continue
            pcols = [c for c in range(kb, kb + 4) if st[r, c] >= 0]
            unknown = [c for c in pcols if c not in known]
            if len(unknown) == 1:
                tgt = unknown[0]
                # p_tgt (shift must be 0 in 5G BGs for the solved entry)
                assert st[r, tgt] == 0, (r, tgt, st[r, tgt])
                terms = [(c, int(st[r, c])) for c in range(kb + 4)
                         if st[r, c] >= 0 and c != tgt]
                order.append((tgt, r, terms))
                known.add(tgt)
                rows_used.add(r)
                progressed = True
        assert progressed, "core solve did not progress"

    rows = []
    for r in range(nrows):
        rows.append([(c, int(st[r, c])) for c in range(kb + 4) if st[r, c] >= 0])

    return dict(kb=kb, p1_shift=p1_shift, core_solve=order, rows=rows,
                nrows=nrows)


def _roll(x, shift):
    """roll(v, -P) == action of a base-graph block with shift P."""
    if shift % x.shape[-1] == 0:
        return x
    return jnp.roll(x, -shift, axis=-1)


@functools.partial(jax.jit, static_argnames=("bgn",))
def ldpc_encode(ck: jnp.ndarray, bgn: int) -> jnp.ndarray:
    """Encode (C, K) systematic bits -> (C, N) rate-2Zc-punctured codeword.

    ck: int8 0/1 with filler bits set to 0 (filler tracking is done by the
        rate-matching plan, not with -1 sentinels as in the reference).
    Returns dn (C, N): [c_(2Zc..K) | parity(4Zc core + ext)], fillers
    still zero at their positions.
    """
    C, K = ck.shape
    kb_sys = 22 if bgn == 1 else 10
    zc = K // kb_sys
    plan = _encode_plan(bgn, zc)
    u = ck.astype(jnp.int8).reshape(C, kb_sys, zc)

    def row_sum(terms, blocks):
        acc = None
        for col, shift in terms:
            v = _roll(blocks[col], shift)
            acc = v if acc is None else jnp.bitwise_xor(acc, v)
        return acc

    blocks = {c: u[:, c, :] for c in range(kb_sys)}

    # L1[m] = systematic part of core row m; L2 = sum of rows.
    l1 = []
    for r in range(4):
        terms = [(c, s) for (c, s) in plan["rows"][r] if c < kb_sys]
        l1.append(row_sum(terms, blocks))
    l2 = l1[0] ^ l1[1] ^ l1[2] ^ l1[3]

    kb = plan["kb"]
    blocks[kb] = jnp.roll(l2, plan["p1_shift"], axis=-1)  # p1
    for tgt, r, terms in plan["core_solve"]:
        acc = row_sum(terms, blocks)
        blocks[tgt] = acc  # p_tgt = sum of other row terms (GF(2))

    core_parity = jnp.stack([blocks[kb + i] for i in range(4)], axis=1)

    # Extension parities: rows 4..nrows-1, identity on their own column.
    ext = []
    for r in range(4, plan["nrows"]):
        ext.append(row_sum(plan["rows"][r], blocks))
    ext_parity = jnp.stack(ext, axis=1)

    dn = jnp.concatenate([
        u[:, 2:, :].reshape(C, -1),
        core_parity.reshape(C, -1),
        ext_parity.reshape(C, -1),
    ], axis=-1)
    return dn


def ldpc_encode_np(ck_row: np.ndarray, bgn: int) -> np.ndarray:
    """Reference-compatible single-codeword wrapper.

    ck_row: (K,) with -1 filler sentinels (py5gphy convention). Returns
    dn (N,) with -1 at filler positions, for golden-vector comparison.
    """
    ck = np.asarray(ck_row)
    K = ck.size
    kb_sys = 22 if bgn == 1 else 10
    zc = K // kb_sys
    filler = ck == -1
    clean = np.where(filler, 0, ck).astype(np.int8)
    dn = np.asarray(ldpc_encode(jnp.asarray(clean[None]), bgn))[0]
    out = dn.astype(np.int8).copy()
    sys_filler = filler[2 * zc:]
    out[: K - 2 * zc][sys_filler] = -1
    return out
