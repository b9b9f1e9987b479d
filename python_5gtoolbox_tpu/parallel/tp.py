"""Tensor parallelism: shard the ML-equalizer candidate axis over chips.

SURVEY.md section 2.8 notes the reference has no TP and that for this
workload most operators fit per-chip. The one genuinely large
intra-operator dimension in the framework is the exact-ML equalizer's
layer-product candidate axis (reference py5gphy/channel_equalization/
ML2.py:47-163 searches all q^NL candidate vectors per RE: 256QAM
2-layer -> C = 65536), which rx/equalize.py:197 has to RE-chunk into a
~0.5 GB budget on one chip. Sharding THAT axis is this domain's tensor
parallelism: each device scores C/ntp candidates against the full RE
batch, then the argmin / per-bit max-log minima are combined with one
pmin + one tiny all_gather over the mesh axis — compute and candidate
memory both divide by the axis size while the RE batch stays
replicated.

Exactness: min over a partition of the candidate set followed by min
over the partial results is the global min (no summation reordering),
and the device order of all_gather follows the candidate order, so the
first-index argmin tie-break matches the unsharded
rx/equalize.py:ml2 bit-for-bit. tests/test_tp.py pins sharded ==
unsharded on the virtual 8-device mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from python_5gtoolbox_tpu.ops.modulation import constellation
from python_5gtoolbox_tpu.rx.equalize import _whiten


@functools.lru_cache(maxsize=None)
def _cand_tables(modtype: str, nl: int):
    """(C, nl) candidate symbol vectors + (C, nl*qm) their bit labels."""
    syms, bits = constellation(modtype)
    q = len(syms)
    grids = np.meshgrid(*([np.arange(q)] * nl), indexing="ij")
    cand_idx = np.stack([g.reshape(-1) for g in grids], axis=-1)
    cand = np.asarray(syms)[cand_idx].astype(np.complex64)
    cand_bits = np.concatenate([np.asarray(bits)[cand_idx[:, l]]
                                for l in range(nl)], axis=1).astype(np.int8)
    return cand, cand_bits


def tp_ml2(y, h, cov, modtype: str, mesh: Mesh, axis: str = "tp",
           irc: bool = False, soft: bool = True):
    """Candidate-axis tensor-parallel exact max-log ML equalize.

    Same contract as rx.equalize.ml2 (returns (s_est, noise_var,
    hardbits, llr), all (N, ...) and replicated across the mesh):
    y (N, Nr), h (N, Nr, NL), cov (N, Nr, Nr). The candidate axis
    C = q^NL must divide by the `axis` size.
    """
    if irc:
        y, h = _whiten(y, h, cov)
        cov = jnp.broadcast_to(jnp.eye(h.shape[-2], dtype=h.dtype),
                               cov.shape)
    n, nr, nl = h.shape
    cand_np, bits_np = _cand_tables(modtype, nl)
    c_total = cand_np.shape[0]
    ntp = mesh.shape[axis]
    if c_total % ntp:
        raise ValueError(f"candidate count {c_total} not divisible by "
                         f"mesh axis '{axis}' of size {ntp}")
    shard = c_total // ntp
    nbits = bits_np.shape[1]
    cand = jnp.asarray(cand_np)
    cand_bits = jnp.asarray(bits_np)
    sigma2 = jnp.mean(jnp.real(jnp.diagonal(cov, axis1=-2, axis2=-1)),
                      axis=-1)

    def body(y_r, h_r, s2_r):
        r = jax.lax.axis_index(axis)
        lo = r * shard
        cand_l = jax.lax.dynamic_slice_in_dim(cand, lo, shard, 0)
        bits_l = jax.lax.dynamic_slice_in_dim(cand_bits, lo, shard, 0)
        hs = jnp.einsum("nrl,cl->ncr", h_r, cand_l)      # (N, C/ntp, Nr)
        lv = jnp.sum(jnp.abs(y_r[:, None, :] - hs) ** 2,
                     axis=-1) / s2_r[:, None]            # (N, C/ntp)
        local_best = jnp.argmin(lv, axis=-1)
        local_min = jnp.take_along_axis(lv, local_best[:, None],
                                        axis=1)[:, 0]
        # tiny cross-device combine: (ntp, N) scalars per RE
        minv = jax.lax.all_gather(local_min, axis)
        argg = jax.lax.all_gather(local_best + lo, axis)
        dev = jnp.argmin(minv, axis=0)                   # first-min device
        gbest = jnp.take_along_axis(argg, dev[None, :], axis=0)[0]
        min_lv = jnp.take_along_axis(minv, dev[None, :], axis=0)[0]
        s_est = cand[gbest]                              # (N, nl)
        hard = cand_bits[gbest]                          # (N, nl*qm)
        nv = jnp.broadcast_to(min_lv[:, None], (n, nl))
        if not soft:
            return (s_est, nv, hard,
                    (1 - 2 * hard).astype(jnp.float32))
        inf = jnp.asarray(np.inf, lv.dtype)
        llrs = []
        for i in range(nbits):
            is1 = (bits_l[:, i] == 1)[None, :]
            v1 = jax.lax.pmin(jnp.min(jnp.where(is1, lv, inf), axis=1),
                              axis)
            v0 = jax.lax.pmin(jnp.min(jnp.where(is1, inf, lv), axis=1),
                              axis)
            llrs.append(v1 - v0)
        return s_est, nv, hard, jnp.stack(llrs, axis=-1)

    spec_in = (P(), P(), P())                            # replicated
    spec_out = (P(), P(), P(), P())
    fn = shard_map(body, mesh=mesh, in_specs=spec_in, out_specs=spec_out,
                   check_rep=False)
    return fn(y, h, sigma2)
