"""Time-axis (sample) sharding for the channel filter: overlap-save.

This is the framework's sequence/context-parallel analogue (SURVEY.md
sections 2.8 and 5.7): the reference runs one giant upfirdn over the
whole 245.76 Msps waveform single-threaded; here the sample axis is
sharded over the mesh and each FIR / halfband stage exchanges only its
(numtaps-1)-sample halos with ring neighbors via lax.ppermute riding
the ICI, then computes a purely local convolution. Offsets are chosen
so the sharded chain is sample-exact vs ops.filters.tx_channel_filter /
rx_channel_filter (same upfirdn conventions as the reference,
py5gphy/nr_lowphy/tx_lowphy_process.py:82-153).

Boundary devices receive zero halos from ppermute's missing sources,
which matches the unsharded zero-padded convolution exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from python_5gtoolbox_tpu.ops import filters
from python_5gtoolbox_tpu.utils import numerology as num


def _halo_exchange(x: jnp.ndarray, hl: int, hr: int, axis: str) -> jnp.ndarray:
    """Concat (right-edge-of-left-neighbor | x | left-edge-of-right).

    x: (..., Tb) local block. Devices at the ends get zeros (ppermute
    leaves targets with no source as zero), matching global zero-pad.
    """
    n = jax.lax.axis_size(axis)
    if x.shape[-1] < max(hl, hr):
        raise ValueError(
            f"per-device block of {x.shape[-1]} samples is smaller than the "
            f"filter halo ({max(hl, hr)}); give each of the {n} devices at "
            f"least max(hl, hr) samples (use fewer shards or longer input)")
    parts = []
    if hl:
        parts.append(jax.lax.ppermute(
            x[..., -hl:], axis, [(j, j + 1) for j in range(n - 1)]))
    parts.append(x)
    if hr:
        parts.append(jax.lax.ppermute(
            x[..., :hr], axis, [(j + 1, j) for j in range(n - 1)]))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else x


def _os_fir_same(x: jnp.ndarray, taps: np.ndarray, axis: str) -> jnp.ndarray:
    """Overlap-save 'same' FIR: local output == global fir_same block."""
    n = len(taps)
    pl_, pr_ = n // 2, n - 1 - n // 2
    xh = _halo_exchange(x, pl_, pr_, axis)
    return filters._conv1d(xh, taps, (0, 0))


def _os_hb_up2(x: jnp.ndarray, taps: np.ndarray, axis: str) -> jnp.ndarray:
    """Overlap-save halfband x2 upsampler, exact vs filters.hb_upsample2.

    Global semantics: out[t] = sum_j h_f[j] xd[t - pad_l + j] with xd the
    2x zero-stuffed input and pad_l = (n-1) - (n//2 - 1). Halos are
    computed in INPUT samples; alignment leftover (pad_l odd) is absorbed
    by one extra unit of conv padding plus an output slice.
    """
    n = len(taps)
    off = n // 2 - 1
    pad_l = (n - 1) - off
    hl = -(-pad_l // 2)                    # ceil(pad_l / 2)
    hr = -(-(n - 1 - pad_l) // 2) + 1
    k = 2 * hl - pad_l                     # 0 or 1
    tb = x.shape[-1]
    xh = _halo_exchange(x, hl, hr, axis)
    y = filters._conv1d(xh, taps, (k, n), lhs_dilation=2)
    return y[..., 2 * k: 2 * k + 2 * tb] * np.float32(np.sqrt(2))


def _os_hb_down2(x: jnp.ndarray, taps: np.ndarray, axis: str) -> jnp.ndarray:
    """Overlap-save halfband /2 decimator, exact vs filters.hb_downsample2.

    Global semantics: out[m] = sum_j h_f[j] x[2m - pl + j] with
    pl = (n-1) - 2*((n+1)//4). Requires the local block length even.
    """
    n = len(taps)
    shift = 2 * ((n + 1) // 4)
    pl_, pr_ = (n - 1) - shift, shift - 1
    xh = _halo_exchange(x, pl_, pr_, axis)
    y = filters._conv1d(xh, taps, (0, 0), stride=2)
    return y[..., : x.shape[-1] // 2] * np.float32(np.sqrt(2))


def sharded_tx_channel_filter(td: jnp.ndarray, scs: int, bw: int,
                              mesh: Mesh, axis: str = "sp",
                              out_rate_hz: float = 245.76e6) -> jnp.ndarray:
    """(ant..., T) at carrier rate -> (ant..., T*oversample), T sharded.

    Sample-exact vs filters.tx_channel_filter. T must divide evenly over
    mesh[axis]; each local block stays contiguous in the global stream.
    """
    prb = num.carrier_prb_size(scs, bw)
    fs_in = num.fft_size(prb) * scs * 1000
    oversample = int(round(out_rate_hz / fs_in))
    assert 2 ** int(np.log2(oversample)) == oversample
    stages = int(np.log2(oversample))
    fir = filters.fir_coeff(scs, bw)
    hb = filters.halfband_coeff()

    def local(x):
        y = _os_fir_same(x, fir, axis)
        for _ in range(stages):
            y = _os_hb_up2(y, hb, axis)
        return y

    spec_in = P(*([None] * (td.ndim - 1) + [axis]))
    return shard_map(local, mesh=mesh, in_specs=(spec_in,),
                     out_specs=spec_in)(td)


def sharded_rx_channel_filter(rx: jnp.ndarray, scs: int, bw: int,
                              mesh: Mesh, axis: str = "sp",
                              in_rate_hz: float = 245.76e6) -> jnp.ndarray:
    """DDC mirror: halfband /2 stages then FIR, T sharded over mesh[axis].

    Sample-exact vs filters.rx_channel_filter; the per-device block must
    stay a multiple of the total decimation 2**stages.
    """
    prb = num.carrier_prb_size(scs, bw)
    fs_out = num.fft_size(prb) * scs * 1000
    oversample = int(round(in_rate_hz / fs_out))
    assert 2 ** int(np.log2(oversample)) == oversample
    stages = int(np.log2(oversample))
    fir = filters.fir_coeff(scs, bw)
    hb = filters.halfband_coeff()

    def local(x):
        y = x
        for _ in range(stages):
            y = _os_hb_down2(y, hb, axis)
        return _os_fir_same(y, fir, axis)

    spec_in = P(*([None] * (rx.ndim - 1) + [axis]))
    return shard_map(local, mesh=mesh, in_specs=(spec_in,),
                     out_specs=spec_in)(rx)
