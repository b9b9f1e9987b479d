"""Pipeline-parallel (PP) TX waveform: OFDM and DUC stages on different
devices with software-pipelined async overlap.

SURVEY section 2.8 PP / VERDICT r3 item 6. The reference's analogue is
the strictly sequential slot loop (py5gphy/nr_waveform/nr_dl_waveform.py
:60-102: per-slot IFFT then one big filter at the end). Here the slot
axis is chunked; stage A (per-chunk batched OFDM, ofdm.tx_low_phy) runs
on one device while stage B (the DUC, filters.tx_channel_filter on a
halo-extended chunk) runs on another. JAX's async dispatch pipelines
them: by the time stage B starts chunk i, stage A is already computing
chunk i+1 — with the stages placed on DIFFERENT devices they execute
concurrently (verified by profiler trace, out/pp_overlap_r04.json).

Sample-exactness across chunk boundaries: each DUC chunk is extended
with _HALO true neighbor samples per side (zeros at the waveform
edges, matching upfirdn's zero continuation) and the output trimmed —
the overlap-save identity tests pin equality with the unchunked chain.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import filters, ofdm
from python_5gtoolbox_tpu.utils import numerology as num


def _halo(scs: int, bw: int, out_rate_hz: float) -> int:
    """Per-side 1x-rate halo covering the FIR + halfband chain reach."""
    n_fir = len(filters.fir_coeff(scs, bw))
    fs_in = num.fft_size(num.carrier_prb_size(scs, bw)) * scs * 1000
    n_hb = max(int(np.log2(round(out_rate_hz / fs_in))), 0)
    # fir reach n//2; each x2 stage adds <= |hb|/2 at its input rate
    return n_fir // 2 + 32 * max(n_hb, 1)


@functools.partial(jax.jit, static_argnames=("scs", "bw", "fc_hz"))
def _stage_ofdm(fd_chunk, scs: int, bw: int, fc_hz: int):
    td = ofdm.tx_low_phy(fd_chunk, scs, bw, fc_hz, roll_ant=False)
    return td.reshape(td.shape[0], -1)          # (ant, chunk_T)


@functools.partial(jax.jit, static_argnames=("scs", "bw", "out_rate_hz",
                                             "trim", "halo", "edge_l",
                                             "edge_r"))
def _stage_duc(x_ext, scs: int, bw: int, out_rate_hz: float, trim: int,
               halo: int, edge_l: bool, edge_r: bool):
    """DUC on a halo-extended chunk. At the GLOBAL waveform edges the
    serial chain truncates the FIR output to [0, T) before the halfband
    sees it; zero the FIR output's halo region there to match."""
    fs_in = num.fft_size(num.carrier_prb_size(scs, bw)) * scs * 1000
    n_hb = int(np.log2(int(round(out_rate_hz / fs_in))))
    def mask_edges(y, h):
        if edge_l:
            y = jnp.concatenate(
                [jnp.zeros(y.shape[:-1] + (h,), y.dtype), y[..., h:]],
                axis=-1)
        if edge_r:
            y = jnp.concatenate(
                [y[..., :-h], jnp.zeros(y.shape[:-1] + (h,), y.dtype)],
                axis=-1)
        return y

    y = mask_edges(filters.fir_same(x_ext, filters.fir_coeff(scs, bw)),
                   halo)
    for k in range(n_hb):
        y = filters.hb_upsample2(y)
        if k + 1 < n_hb:
            y = mask_edges(y, halo * 2 ** (k + 1))
    return y[..., trim: y.shape[-1] - trim]


def pipelined_tx_waveform(fd_slots: np.ndarray, scs: int, bw: int,
                          fc_hz: int, out_rate_hz: float,
                          devices=None, chunk_slots: int = 4):
    """(ant, S, 14, n_sc) grids -> (ant, oversample*S*slot_samples)
    waveform, OFDM on devices[0] / DUC on devices[1], chunks of
    `chunk_slots` slots flowing through the two stages concurrently.
    """
    if devices is None:
        devices = jax.devices()
    d_a, d_b = devices[0], devices[1 % len(devices)]
    nant, n_slots = fd_slots.shape[0], fd_slots.shape[1]
    slot_t = ofdm.slot_sample_count(scs, bw)
    fs_in = num.fft_size(num.carrier_prb_size(scs, bw)) * scs * 1000
    ratio = int(round(out_rate_hz / fs_in))
    halo = _halo(scs, bw, out_rate_hz)
    n_chunks = -(-n_slots // chunk_slots)

    # stage A: dispatch ALL chunks up front (async) on device A
    tds = []
    for i in range(n_chunks):
        c = jax.device_put(
            np.ascontiguousarray(
                fd_slots[:, i * chunk_slots:(i + 1) * chunk_slots]), d_a)
        tds.append(_stage_ofdm(c, scs, bw, fc_hz))

    # stage B: halo-extend with neighbor chunks and filter on device B.
    # tds[i+1] is still being produced on A when chunk i's DUC starts —
    # the one-chunk lookahead is the pipeline depth.
    tds_b = [jax.device_put(t, d_b) for t in tds]
    zeros = jnp.zeros((nant, halo), jnp.complex64)
    outs = []
    for i in range(n_chunks):
        left = tds_b[i - 1][..., -halo:] if i > 0 \
            else jax.device_put(zeros, d_b)
        right = tds_b[i + 1][..., :halo] if i + 1 < n_chunks \
            else jax.device_put(zeros, d_b)
        x_ext = jnp.concatenate([left, tds_b[i], right], axis=-1)
        outs.append(_stage_duc(x_ext, scs, bw, out_rate_hz,
                               trim=ratio * halo, halo=halo,
                               edge_l=(i == 0),
                               edge_r=(i == n_chunks - 1)))
    return jnp.concatenate(outs, axis=-1)


def serial_tx_waveform(fd_slots: np.ndarray, scs: int, bw: int,
                       fc_hz: int, out_rate_hz: float, device=None):
    """Single-device unchunked reference chain (same math)."""
    if device is None:
        device = jax.devices()[0]
    fd = jax.device_put(np.ascontiguousarray(fd_slots), device)
    td = _stage_ofdm(fd, scs, bw, fc_hz)
    return filters.tx_channel_filter(td, scs, bw, out_rate_hz)
