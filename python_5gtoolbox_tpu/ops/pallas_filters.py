"""Pallas banded-Toeplitz convolution kernels for the DUC/DDC chain.

Same math as ops/filters.py's _blocked_conv (reference semantics:
py5gphy/nr_lowphy/tx_lowphy_process.py:122-149 upfirdn conventions), but
the overlapping input windows are built in VMEM instead of materialized
in HBM, and the output frame is fixed at 128 samples so the contraction
dim K = roundup(Lf + n - 1, 128) is the minimum the MXU tile grid
permits:

    stage          taps  K (this kernel)  K-equivalent of the XLA path
    FIR same 287   287   512              1024  (L=512, D=2)
    HB   up2  55    55   256               256  (L=128, D=2, ~42% eff.)
    HB  down2 55    55   256(in)           512

Geometry: the input is pre-padded with its left halo, so frame f's
window starts exactly at padded index f*128 and the per-frame window is
K contiguous input samples — the kernel DMAs rows [f0, f0+TM+K/128) of
the (rows, 128) padded input into VMEM, lane-concats the K/128
sublane-shifted views into an (TM, K) frame matrix, and runs one
(TM, K) @ (K, Lout) MXU matmul per block. Complex traffic is two real
planes (axon cannot move complex buffers anyway); taps are real.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TM = 512          # frames (output rows of 128 samples) per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _band_matrix(taps_key: bytes, n: int, mode: str):
    """(hl, K, M (K, Lout) f32) with the window aligned to the padded
    input: y[f*Lf + r] = sum_q xpad[f*Lf + q] * M[q, r].

    Direct-path semantics (ops/filters.py):
      same : y[t] = sum_i x[i] taps[t + n-1-hl - i],  hl = n//2
      up2  : y[j] = sum_i x[i] taps[j + off - 2i] * sqrt2, off = n//2-1
      down2: y[t] = sum_i x[i] taps[2t + shift - i] * sqrt2,
             shift = 2*((n+1)//4)
    With q = i - (f*Lf - hl') where hl' is the left halo baked into the
    padding, the in-frame index is q and M[q, r] = taps at the mode's
    offset expression.
    """
    taps = np.frombuffer(taps_key, np.float64)
    assert len(taps) == n
    lf = _LANE

    def taps_at(idx):
        ok = (idx >= 0) & (idx < n)
        return np.where(ok, taps[np.clip(idx, 0, n - 1)], 0.0)

    if mode == "same":
        hl = n // 2
        l_out, scale = lf, 1.0
        width = lf + n - 1
        K = _round_up(width, _LANE)
        q, r = np.meshgrid(np.arange(K), np.arange(l_out), indexing="ij")
        M = taps_at(r + n - 1 - q)
    elif mode == "up2":
        off = n // 2 - 1
        pad_l = (n - 1) - off
        hl = -(-pad_l // 2)
        k = 2 * hl - pad_l
        l_out, scale = 2 * lf, np.sqrt(2)
        width = lf + hl + (-(-(n - 1 - pad_l) // 2) + 1)
        K = _round_up(width, _LANE)
        q, r = np.meshgrid(np.arange(K), np.arange(l_out), indexing="ij")
        M = taps_at(r + k + n - 1 - 2 * q)
    elif mode == "down2":
        shift = 2 * ((n + 1) // 4)
        hl = (n - 1) - shift
        l_out, scale = lf // 2, np.sqrt(2)
        width = lf + hl + (shift - 1)
        K = _round_up(width, _LANE)
        q, r = np.meshgrid(np.arange(K), np.arange(l_out), indexing="ij")
        M = taps_at(2 * r + n - 1 - q)
    else:
        raise ValueError(mode)
    return hl, K, np.ascontiguousarray((M * scale).astype(np.float32))


def _conv_kernel(x0_ref, x1_ref, mh_ref, ml_ref, y_ref, a_ref):
    """One (plane*ant, frame-block) grid step.

    x0 is this block's TM input rows, x1 the NEXT block's (for the
    right halo); frame r's K-window is rows r..r+kt of [x0; x1[:kt]],
    assembled as kt+1 lane-concatenated sublane-shifted views.

    Mosaic supports only DEFAULT (bf16) and HIGHEST (fp32, bf16x6-pass)
    matmul precision, so HIGH (bf16x3, what the XLA path uses and what
    the 2e-4 golden tolerance needs) is rebuilt manually: split A and M
    into bf16 hi+lo and drop the lo*lo term — identical error model,
    3 MXU passes of K instead of HIGH's 3 passes of the XLA path's 2K.
    """
    tm = y_ref.shape[1]
    kt = a_ref.shape[1] // _LANE - 1
    a_ref[:, 0:_LANE] = x0_ref[0]
    for d in range(1, kt + 1):
        sl = slice(d * _LANE, (d + 1) * _LANE)
        a_ref[0: tm - d, sl] = x0_ref[0, d:tm]
        a_ref[tm - d: tm, sl] = x1_ref[0, 0:d]
    a = a_ref[:, :]
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    y = jax.lax.dot_general(ah, mh_ref[:, :], dn,
                            preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(ah, ml_ref[:, :], dn,
                             preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(al, mh_ref[:, :], dn,
                             preferred_element_type=jnp.float32)
    y_ref[0, :, :] = y


@functools.partial(jax.jit,
                   static_argnames=("n", "mode", "taps_key", "interpret"))
def _banded_conv_planes(planes: jnp.ndarray, taps_key: bytes, n: int,
                        mode: str, interpret: bool = False) -> jnp.ndarray:
    """planes: (P, T) f32 (P = 2*ant real/imag planes, T mult of lane).
    Returns (P, T_out) f32."""
    hl, K, M = _band_matrix(taps_key, n, mode)
    p, t = planes.shape
    assert t % _LANE == 0
    nf = t // _LANE
    nb = -(-nf // _TM)
    # left halo, then right-pad to one EXTRA block so the j+1 halo view
    # exists at the last grid step
    xpad = jnp.pad(planes, ((0, 0), (hl, (nb + 1) * _TM * _LANE - t - hl)))
    rows = xpad.reshape(p, -1, _LANE)
    l_out = M.shape[1]
    mh = M.astype(np.float32).astype(jnp.bfloat16)
    ml = (M - np.asarray(mh, np.float32)).astype(jnp.bfloat16)
    y = pl.pallas_call(
        _conv_kernel,
        grid=(p, nb),
        in_specs=[
            pl.BlockSpec((1, _TM, _LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TM, _LANE), lambda i, j: (i, j + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, l_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, l_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TM, l_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, nb * _TM, l_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TM, K), jnp.float32),
        ],
        interpret=interpret,
    )(rows, rows, jnp.asarray(mh), jnp.asarray(ml))
    return y.reshape(p, -1)


# ---------------------------------------------------------------------------
# Fused FIR + halfband-up2 kernel: the DUC's two heavy stages in one
# pass, never writing the intermediate 1x-rate signal to HBM.
# ---------------------------------------------------------------------------

_FUSE_HALO = 160        # left halo baked into the padded input
_FUSE_W = 192           # FIR outputs computed per 128-input frame


@functools.lru_cache(maxsize=None)
def _fused_matrices(fir_key: bytes, n1: int, hb_key: bytes, n2: int):
    """(K1, Mf (K1, W), Mh (W, 256)) for the fused same+up2 kernel.

    Per 128-sample input frame f the kernel computes FIR outputs
    t = f*128 + (c - 16), c in [0, W): tap1 = c + (_FUSE_HALO - 16)
    + (n1-1-n1//2) - q with input index i = f*128 - _FUSE_HALO + q.
    Stage 2 (up2, offset off2 = n2//2 - 1): output j = f*256 + r,
    tap2 = r + 2*16 + off2 - 2c.
    """
    fir = np.frombuffer(fir_key, np.float64)
    hb = np.frombuffer(hb_key, np.float64)
    assert len(fir) == n1 and len(hb) == n2

    def taps_at(taps, idx):
        n = len(taps)
        ok = (idx >= 0) & (idx < n)
        return np.where(ok, taps[np.clip(idx, 0, n - 1)], 0.0)

    hr1 = n1 - 1 - n1 // 2
    width_in = _FUSE_W - 1 + n1 - 1 + 16 + 1      # rightmost q needed
    K1 = _round_up(width_in, _LANE)
    q, c = np.meshgrid(np.arange(K1), np.arange(_FUSE_W), indexing="ij")
    Mf = taps_at(fir, c - 16 + hr1 + _FUSE_HALO - q)
    off2 = n2 // 2 - 1
    c2, r = np.meshgrid(np.arange(_FUSE_W), np.arange(2 * _LANE),
                        indexing="ij")
    Mh = taps_at(hb, r + 2 * 16 + off2 - 2 * c2) * np.sqrt(2)
    return (K1, np.ascontiguousarray(Mf.astype(np.float32)),
            np.ascontiguousarray(Mh.astype(np.float32)))


def _split_dot(a, mh_ref, ml_ref):
    """bf16x3 (HIGH-equivalent) matmul of f32 a with pre-split M."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    y = jax.lax.dot_general(ah, mh_ref[:, :], dn,
                            preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(ah, ml_ref[:, :], dn,
                             preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(al, mh_ref[:, :], dn,
                             preferred_element_type=jnp.float32)
    return y


def _fused_kernel(t_orig, x0_ref, x1_ref, mfh, mfl, mhh, mhl, y_ref,
                  a_ref):
    tm = y_ref.shape[1]
    kt = a_ref.shape[1] // _LANE - 1
    a_ref[:, 0:_LANE] = x0_ref[0]
    for d in range(1, kt + 1):
        sl = slice(d * _LANE, (d + 1) * _LANE)
        a_ref[0: tm - d, sl] = x0_ref[0, d:tm]
        a_ref[tm - d: tm, sl] = x1_ref[0, 0:d]
    yf = _split_dot(a_ref[:, :], mfh, mfl)      # (TM, W) FIR outputs
    # the serial pipeline truncates fir_same's output to [0, T) before
    # the halfband sees it; zero the out-of-range FIR columns (frame f
    # column c holds FIR output t = f*128 + c - 16)
    base = pl.program_id(1) * tm * _LANE - 16
    t_idx = (base
             + jax.lax.broadcasted_iota(jnp.int32, yf.shape, 0) * _LANE
             + jax.lax.broadcasted_iota(jnp.int32, yf.shape, 1))
    yf = jnp.where((t_idx >= 0) & (t_idx < t_orig), yf, 0.0)
    y_ref[0, :, :] = _split_dot(yf, mhh, mhl)   # (TM, 256) interleaved 2x


@functools.partial(jax.jit, static_argnames=("fir_key", "n1", "hb_key",
                                             "n2", "t_orig", "interpret"))
def _fused_planes(planes, fir_key, n1, hb_key, n2, t_orig,
                  interpret=False):
    p, t = planes.shape
    assert t % _LANE == 0
    left, right = fused_pad_spec(t)
    xpad = jnp.pad(planes, ((0, 0), (left, right)))
    return _fused_planes_padded(xpad, fir_key, n1, hb_key, n2,
                                t_orig=t_orig, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("fir_key", "n1", "hb_key",
                                             "n2", "t_orig", "interpret"))
def _fused_planes_padded(xpad, fir_key, n1, hb_key, n2, t_orig,
                         interpret=False):
    K1, Mf, Mh = _fused_matrices(fir_key, n1, hb_key, n2)
    p = xpad.shape[0]
    nb = xpad.shape[1] // (_TM * _LANE) - 1
    rows = xpad.reshape(p, -1, _LANE)

    def split(m):
        h = m.astype(np.float32).astype(jnp.bfloat16)
        l = (m - np.asarray(h, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(h), jnp.asarray(l)

    mfh, mfl = split(Mf)
    mhh, mhl = split(Mh)
    y = pl.pallas_call(
        functools.partial(_fused_kernel, t_orig),
        grid=(p, nb),
        in_specs=[
            pl.BlockSpec((1, _TM, _LANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TM, _LANE), lambda i, j: (i, j + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, _FUSE_W), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, _FUSE_W), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FUSE_W, 2 * _LANE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FUSE_W, 2 * _LANE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TM, 2 * _LANE), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, nb * _TM, 2 * _LANE),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((_TM, K1), jnp.float32)],
        interpret=interpret,
    )(rows, rows, mfh, mfl, mhh, mhl)
    return y.reshape(p, -1)


# ---------------------------------------------------------------------------
# Symbol-consuming fused DUC kernel: takes the raw per-symbol IFFT output
# planes (P, S, 14, nfft) and performs CP insertion in VMEM, so the
# CP-concat (dynamic-update-slice), its zero-padding and the relayout
# copy XLA materializes between the OFDM stage and the frame-blocked
# kernel input (1.4+ ms of the 3.5 ms DUC step, out/duc_trace_r05.json)
# never touch HBM. Reference semantics preserved exactly: the assembled
# per-slot timeline is bit-identical to ofdm.tx_low_phy_planes'
# CP-concat (py5gphy/nr_lowphy/tx_lowphy_process.py:65-68 CP prepend,
# :122-149 upfirdn offsets), and the FIR+HB matrices are the same
# _fused_matrices bf16x3 splits.
# ---------------------------------------------------------------------------


def _copy_plan(d: int, s: int, length: int):
    """Static plan for copying `length` f32 samples from flat offset `s`
    of a (src_rows, 128) source into flat offset `d` of a (R, 128)
    VMEM scratch, as 2D ops only (Mosaic has no 1D<->2D shape casts):
    lane-rotate by delta with a row-carry select, then store full rows
    plus masked edge merges."""
    delta = (d - s) % _LANE
    s0r = s // _LANE
    d0 = d // _LANE
    nd = (d + length - 1) // _LANE - d0 + 1
    dl = d % _LANE                       # first dst row valid from lane
    el = (d + length - 1) % _LANE + 1    # last dst row valid before lane
    # y row j holds source flat [128*(s0r+j) - delta, ...): dst row d0+i
    # reads y row joff+i
    joff = d0 - s0r + (s - d + delta) // _LANE
    if delta and joff == 0 and s0r > 0:
        s0r -= 1
        joff += 1
    n_load = max(-(-((s + length) - s0r * _LANE) // _LANE), joff + nd)
    assert joff >= 0
    return dict(delta=delta, s0r=s0r, n_load=n_load, joff=joff, d0=d0,
                nd=nd, dl=dl, el=el)


def _flat_copy(ts_ref, src2d, p):
    """Execute a _copy_plan: src2d = the loaded (n_load, 128) source
    rows; writes into ts_ref (R, 128)."""
    if p["delta"]:
        r = jnp.roll(src2d, p["delta"], axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
        y = jnp.where(lane < p["delta"], jnp.roll(r, 1, axis=0), r)
    else:
        y = src2d
    d0, nd, joff = p["d0"], p["nd"], p["joff"]
    lo = 0 if p["dl"] == 0 else 1
    hi = nd if p["el"] == _LANE else nd - 1
    if nd == 1:
        row = y[joff]
        lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 0)
        keep = (lane >= p["dl"]) & (lane < p["el"])
        ts_ref[d0, :] = jnp.where(keep, row, ts_ref[d0, :])
        return
    if lo:
        row = y[joff]
        lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 0)
        ts_ref[d0, :] = jnp.where(lane >= p["dl"], row, ts_ref[d0, :])
    if hi > lo:
        ts_ref[d0 + lo: d0 + hi, :] = y[joff + lo: joff + hi]
    if hi < nd:
        row = y[joff + nd - 1]
        lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 0)
        ts_ref[d0 + nd - 1, :] = jnp.where(lane < p["el"], row,
                                           ts_ref[d0 + nd - 1, :])


def _fused_sym_kernel(pieces, t_orig, x_ref, halo_ref, mfh, mfl, mhh,
                      mhl, y_ref, ts_ref, a_ref):
    """One (plane, slot) grid step: assemble the slot's padded timeline
    (left halo | CP-inserted symbols | right halo) into the 2D (R, 128)
    VMEM scratch via _flat_copy, then run the windowed FIR+HB MXU
    matmuls over its frames. Halos come from the small precomputed
    (P, S, 4, 128) side array (rows 0-1 = prev slot's timeline tail,
    rows 2-3 = next slot's timeline head; zeros at waveform boundaries,
    matching upfirdn's zero padding)."""
    j = pl.program_id(1)
    f_n = y_ref.shape[2]
    sym_rows = x_ref[0, 0]                # (14*nfft/128, 128)
    halo_rows = halo_ref[0, 0]            # (4, 128)
    for src, plan in pieces:
        s2 = sym_rows if src == "sym" else halo_rows
        avail = s2.shape[0] - plan["s0r"]
        take = min(avail, plan["n_load"])
        src2d = s2[plan["s0r"]: plan["s0r"] + take]
        if take < plan["n_load"]:
            src2d = jnp.concatenate(
                [src2d, jnp.zeros((plan["n_load"] - take, _LANE),
                                  jnp.float32)], axis=0)
        _flat_copy(ts_ref, src2d, plan)
    kt = a_ref.shape[1] // _LANE
    for d in range(kt):
        a_ref[:, d * _LANE: (d + 1) * _LANE] = ts_ref[d: f_n + d, :]
    yf = _split_dot(a_ref[:, :], mfh, mfl)
    base = j * f_n * _LANE - 16
    t_idx = (base
             + jax.lax.broadcasted_iota(jnp.int32, yf.shape, 0) * _LANE
             + jax.lax.broadcasted_iota(jnp.int32, yf.shape, 1))
    yf = jnp.where((t_idx >= 0) & (t_idx < t_orig), yf, 0.0)
    y_ref[0, 0] = _split_dot(yf, mhh, mhl)


@functools.partial(jax.jit, static_argnames=("cps", "nfft", "fir_key",
                                             "n1", "hb_key", "n2",
                                             "interpret"))
def _fused_symbols(sym_planes, cps, nfft, fir_key, n1, hb_key, n2,
                   interpret=False):
    """sym_planes: (P, S, 14, nfft) f32 per-symbol IFFT output planes.
    Returns (P, S * 2*slot_samples) f32 upsampled planes."""
    k1, mf, mh = _fused_matrices(fir_key, n1, hb_key, n2)
    p, s = sym_planes.shape[0], sym_planes.shape[1]
    slot_samples = int(sum(cps)) + 14 * nfft
    assert slot_samples % _LANE == 0
    f_n = slot_samples // _LANE
    ts_len = (f_n - 1) * _LANE + k1
    t_orig = s * slot_samples

    def split(m):
        h = m.astype(np.float32).astype(jnp.bfloat16)
        l = (m - np.asarray(h, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(h), jnp.asarray(l)

    mfh, mfl = split(mf)
    mhh, mhl = split(mh)
    right = ts_len - _FUSE_HALO - slot_samples
    assert 0 < right <= 256 and _FUSE_HALO <= 256
    # halo side array (P, S, 4, 128): rows 0-1 = the previous slot's
    # final _FUSE_HALO timeline samples (= its last symbol's data tail),
    # rows 2-3 = the next slot's first `right` timeline samples (= its
    # symbol-0 CP, then symbol-0 head if the CP is shorter); zeros at
    # waveform boundaries to reproduce upfirdn's zero padding.
    left = jnp.pad(sym_planes[:, : s - 1, 13, nfft - _FUSE_HALO:],
                   ((0, 0), (1, 0), (0, 0)))
    cp0 = int(cps[0])
    n1r = min(cp0, right)
    rparts = [sym_planes[:, 1:, 0, nfft - cp0: nfft - cp0 + n1r]]
    if right > cp0:
        rparts.append(sym_planes[:, 1:, 0, 0: right - cp0])
    rh = (jnp.concatenate(rparts, axis=-1) if len(rparts) > 1
          else rparts[0])
    halos = jnp.concatenate(
        [jnp.pad(left, ((0, 0), (0, 0), (0, 256 - _FUSE_HALO))),
         jnp.pad(rh, ((0, 0), (0, 1), (0, 256 - right)))],
        axis=2).reshape(p, s, 4, _LANE)
    # static timeline-assembly piece plans (all offsets are config-only)
    pieces = [("halo", _copy_plan(0, 0, _FUSE_HALO))]
    off = _FUSE_HALO
    for m in range(14):
        cp = int(cps[m])
        pieces.append(("sym", _copy_plan(off, (m + 1) * nfft - cp, cp)))
        pieces.append(("sym", _copy_plan(off + cp, m * nfft, nfft)))
        off += cp + nfft
    pieces.append(("halo", _copy_plan(off, 2 * _LANE, right)))
    sym_rows = sym_planes.reshape(p, s, 14 * nfft // _LANE, _LANE)
    y = pl.pallas_call(
        functools.partial(_fused_sym_kernel, pieces, t_orig),
        grid=(p, s),
        in_specs=[
            pl.BlockSpec((1, 1, 14 * nfft // _LANE, _LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, _LANE), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, _FUSE_W), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, _FUSE_W), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FUSE_W, 2 * _LANE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FUSE_W, 2 * _LANE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, f_n, 2 * _LANE),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, s, f_n, 2 * _LANE),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ts_len // _LANE, _LANE), jnp.float32),
            pltpu.VMEM((f_n, k1), jnp.float32),
        ],
        interpret=interpret,
    )(sym_rows, halos, mfh, mfl, mhh, mhl)
    return y.reshape(p, -1)


# ---------------------------------------------------------------------------
# Spec-consuming fully-fused DUC kernel: IDFT + CP insertion + FIR + HB
# in ONE Pallas pass. The host supplies only the padded frequency-domain
# spec as (2*ant, S, 14*nfft/128, 128) f32 planes; the kernel computes
# each symbol's IFFT as a two-stage MXU matmul DFT (nfft = n1*128,
# k = k1*128 + k2, t = t1*128 + t2 — both minor dims are the 128-lane
# axis, so symbol spectra and time rows are both natural (n1, 128)
# tiles and NO relayout exists anywhere), applies the per-symbol phase
# compensation, assembles the CP timeline in VMEM and runs the
# fused FIR+HB. This removes the FFT custom-call, its relayout copies
# and the symbol->frame-row reshape that together cost ~1.2 ms of the
# 2.8 ms DUC step (out/duc_trace_r05.json history).
# Reference semantics: py5gphy/nr_lowphy/tx_lowphy_process.py:57-75
# (ifftshift IFFT + sqrt(N) + CP + phase comp) and :122-149 (upfirdn).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _spec_dft_consts(nfft: int):
    """Packed bf16 hi/lo DFT matrices for the in-kernel two-stage IDFT.

    Returns (ein_h, ein_l, eout_h, eout_l, tw) with ein/eout stacked
    [re; im; re+im] (3*n1, 128) and tw stacked [re; im] (256, 128) f32.
    Includes the ifftshift (-1)^t sign (folded into tw's t2 columns) and
    the net 1/sqrt(nfft) scale (folded into eout), exactly as
    ofdm._idft_mats.
    """
    n1 = nfft // _LANE
    k1 = np.arange(n1)
    t2 = np.arange(_LANE)
    e_in = np.exp(2j * np.pi * np.outer(k1, t2) / n1)        # [k1, t2]
    sign2 = np.where(t2 % 2 == 0, 1.0, -1.0)
    tw = np.exp(2j * np.pi * np.outer(t2, t2) / nfft) \
        * sign2[None, :]                                     # [k2, t2]
    e_out = np.exp(2j * np.pi * np.outer(k1, t2) / n1) \
        / np.sqrt(nfft)                                      # [t1, k2]

    import ml_dtypes

    def pack(m):
        st = np.concatenate([m.real, m.imag, m.real + m.imag]
                            ).astype(np.float32)
        h = st.astype(ml_dtypes.bfloat16)
        l = (st - h.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return h, l

    ein_h, ein_l = pack(e_in)
    eout_h, eout_l = pack(e_out)
    tws = np.concatenate([tw.real, tw.imag]).astype(np.float32)
    return ein_h, ein_l, eout_h, eout_l, tws


def _dot3_c1(a, bh, bl):
    """bf16x3 matmul contracting dim0 x dim0: a f32 (n1,128) with
    pre-split b -> (128, 128)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    y = jax.lax.dot_general(ah, bh, dn,
                            preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(ah, bl, dn,
                             preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(al, bh, dn,
                             preferred_element_type=jnp.float32)
    return y


def _dot3_c2(ah, al, b):
    """bf16x3 matmul: pre-split a (n1,128) bf16 @ b f32 (128,128)."""
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    y = jax.lax.dot_general(ah, bh, dn,
                            preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(ah, bl, dn,
                             preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(al, bh, dn,
                             preferred_element_type=jnp.float32)
    return y


def _flat_copy_src(ts_ref, src_full, plan):
    """_flat_copy with the source window sliced (and zero-padded past
    the source's end) from the full 2D source value."""
    avail = src_full.shape[0] - plan["s0r"]
    take = min(avail, plan["n_load"])
    src2d = src_full[plan["s0r"]: plan["s0r"] + take]
    if take < plan["n_load"]:
        src2d = jnp.concatenate(
            [src2d, jnp.zeros((plan["n_load"] - take, _LANE),
                              jnp.float32)], axis=0)
    _flat_copy(ts_ref, src2d, plan)


def _fused_spec_kernel(n1, pieces, halo_plans, pc, t_orig,
                       xr_ref, xi_ref, pr_ref, pi_ref, nr_ref, ni_ref,
                       einh, einl, eouth, eoutl, tw_ref,
                       mfh, mfl, mhh, mhl, yr_ref, yi_ref,
                       tsr_ref, tsi_ref, a_ref):
    """One (ant, slot) grid step of the fully fused IDFT+CP+FIR+HB."""
    j = pl.program_id(1)
    f_n = yr_ref.shape[2]
    twre = tw_ref[0:_LANE, :]
    twim = tw_ref[_LANE: 2 * _LANE, :]

    def dft(sre, sim_, m):
        # Karatsuba complex matmul x2 stages (3 real GEMMs each,
        # bf16x3 passes), twiddle between, phase comp after
        p1 = _dot3_c1(sre, einh[0:n1], einl[0:n1])
        p2 = _dot3_c1(sim_, einh[n1: 2 * n1], einl[n1: 2 * n1])
        p3 = _dot3_c1(sre + sim_, einh[2 * n1: 3 * n1],
                      einl[2 * n1: 3 * n1])
        yre = p1 - p2
        yim = p3 - p1 - p2
        tre = yre * twre - yim * twim
        tim = yre * twim + yim * twre
        q1 = _dot3_c2(eouth[0:n1], eoutl[0:n1], tre)
        q2 = _dot3_c2(eouth[n1: 2 * n1], eoutl[n1: 2 * n1], tim)
        q3 = _dot3_c2(eouth[2 * n1: 3 * n1], eoutl[2 * n1: 3 * n1],
                      tre + tim)
        zre = q1 - q2
        zim = q3 - q1 - q2
        c, sgn = pc[m]
        if c != 1.0 or sgn != 0.0:
            zre, zim = zre * c - zim * sgn, zre * sgn + zim * c
        return zre, zim

    xr = xr_ref[0, 0]
    xi = xi_ref[0, 0]
    for m in range(14):
        zre, zim = dft(xr[m * n1: (m + 1) * n1],
                       xi[m * n1: (m + 1) * n1], m)
        for plan in pieces[m]:
            _flat_copy_src(tsr_ref, zre, plan)
            _flat_copy_src(tsi_ref, zim, plan)
    # halos: prev slot's symbol-13 tail / next slot's symbol-0 head,
    # recomputed from the neighbor spec blocks (clamped maps at the
    # boundaries; the boundary regions are zeroed below)
    zre, zim = dft(pr_ref[0, 0], pi_ref[0, 0], 13)
    for plan in halo_plans["left"]:
        _flat_copy_src(tsr_ref, zre, plan)
        _flat_copy_src(tsi_ref, zim, plan)
    zre, zim = dft(nr_ref[0, 0], ni_ref[0, 0], 0)
    for plan in halo_plans["right"]:
        _flat_copy_src(tsr_ref, zre, plan)
        _flat_copy_src(tsi_ref, zim, plan)

    @pl.when(j == 0)
    def _():
        for plan in halo_plans["left_zero"]:
            _flat_copy(tsr_ref, jnp.zeros((plan["n_load"], _LANE),
                                          jnp.float32), plan)
            _flat_copy(tsi_ref, jnp.zeros((plan["n_load"], _LANE),
                                          jnp.float32), plan)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        for plan in halo_plans["right_zero"]:
            _flat_copy(tsr_ref, jnp.zeros((plan["n_load"], _LANE),
                                          jnp.float32), plan)
            _flat_copy(tsi_ref, jnp.zeros((plan["n_load"], _LANE),
                                          jnp.float32), plan)

    kt = a_ref.shape[1] // _LANE
    base = j * f_n * _LANE - 16
    for ts_ref, y_ref in ((tsr_ref, yr_ref), (tsi_ref, yi_ref)):
        for d in range(kt):
            a_ref[:, d * _LANE: (d + 1) * _LANE] = ts_ref[d: f_n + d, :]
        yf = _split_dot(a_ref[:, :], mfh, mfl)
        t_idx = (base
                 + jax.lax.broadcasted_iota(jnp.int32, yf.shape, 0)
                 * _LANE
                 + jax.lax.broadcasted_iota(jnp.int32, yf.shape, 1))
        yf = jnp.where((t_idx >= 0) & (t_idx < t_orig), yf, 0.0)
        y_ref[0, 0] = _split_dot(yf, mhh, mhl)


@functools.partial(jax.jit, static_argnames=("cps", "nfft", "fir_key",
                                             "n1t", "hb_key", "n2t",
                                             "pc_key", "interpret"))
def _fused_spec(spec_planes, cps, nfft, fir_key, n1t, hb_key, n2t,
                pc_key, interpret=False):
    """spec_planes: (2*ant, S, 14*nfft/128, 128) f32 padded-spec planes
    (real planes first). Returns (re, im) each (ant, S*2*slot_samples)."""
    k1, mf, mh = _fused_matrices(fir_key, n1t, hb_key, n2t)
    n1 = nfft // _LANE
    p2, s = spec_planes.shape[0], spec_planes.shape[1]
    nant = p2 // 2
    slot_samples = int(sum(cps)) + 14 * nfft
    f_n = slot_samples // _LANE
    ts_len = (f_n - 1) * _LANE + k1
    right = ts_len - _FUSE_HALO - slot_samples
    t_orig = s * slot_samples
    pc = tuple((float(c.real), float(c.imag))
               for c in np.frombuffer(pc_key, np.complex64))

    def split(m):
        h = m.astype(np.float32).astype(jnp.bfloat16)
        l = (m - np.asarray(h, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(h), jnp.asarray(l)

    mfh, mfl = split(mf)
    mhh, mhl = split(mh)
    ein_h, ein_l, eout_h, eout_l, tws = _spec_dft_consts(nfft)

    # static assembly plans: per symbol [CP piece, data piece], sources
    # are the symbol's own (n1, 128) time rows
    pieces = []
    off = _FUSE_HALO
    for m in range(14):
        cp = int(cps[m])
        pieces.append((_copy_plan(off, nfft - cp, cp),
                       _copy_plan(off + cp, 0, nfft)))
        off += cp + nfft
    cp0 = int(cps[0])
    hp = {"left": [_copy_plan(0, nfft - _FUSE_HALO, _FUSE_HALO)],
          "right": [_copy_plan(off, nfft - cp0, min(cp0, right))],
          "left_zero": [_copy_plan(0, 0, _FUSE_HALO)],
          "right_zero": [_copy_plan(off, 0, right)]}
    if right > cp0:
        hp["right"].append(_copy_plan(off + cp0, 0, right - cp0))

    grid_specs = dict(
        grid=(nant, s),
        in_specs=[
            pl.BlockSpec((1, 1, 14 * n1, _LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 14 * n1, _LANE),
                         lambda i, j: (i + nant, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1, _LANE),
                         lambda i, j: (i, jnp.maximum(j - 1, 0), 13, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1, _LANE),
                         lambda i, j: (i + nant, jnp.maximum(j - 1, 0),
                                       13, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1, _LANE),
                         lambda i, j: (i, jnp.minimum(j + 1, s - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1, _LANE),
                         lambda i, j: (i + nant,
                                       jnp.minimum(j + 1, s - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(mshape, lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
             for mshape in ((3 * n1, _LANE), (3 * n1, _LANE),
                            (3 * n1, _LANE), (3 * n1, _LANE),
                            (2 * _LANE, _LANE),
                            (k1, _FUSE_W), (k1, _FUSE_W),
                            (_FUSE_W, 2 * _LANE), (_FUSE_W, 2 * _LANE))],
        out_specs=[
            pl.BlockSpec((1, 1, f_n, 2 * _LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f_n, 2 * _LANE),
                         lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((nant, s, f_n, 2 * _LANE),
                                        jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((ts_len // _LANE, _LANE), jnp.float32),
            pltpu.VMEM((ts_len // _LANE, _LANE), jnp.float32),
            pltpu.VMEM((f_n, k1), jnp.float32),
        ],
    )
    yr, yi = pl.pallas_call(
        functools.partial(_fused_spec_kernel, n1, pieces, hp, pc,
                          t_orig),
        interpret=interpret,
        **grid_specs,
    )(spec_planes, spec_planes, spec_planes, spec_planes, spec_planes,
      spec_planes, ein_h, ein_l, eout_h, eout_l, jnp.asarray(tws),
      mfh, mfl, mhh, mhl)
    return yr.reshape(nant, -1), yi.reshape(nant, -1)


def duc_from_spec_planes(spec_planes: jnp.ndarray, cps,
                         fir_taps: np.ndarray, hb_taps: np.ndarray,
                         phase_comp: np.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(2*ant, S, 14*nfft/128, 128) f32 padded-spec planes ->
    (re, im) planes each (ant, 2*S*slot_samples): IFFT + CP + FIR +
    halfband-up2 in one fully fused Pallas pass."""
    n1 = spec_planes.shape[2] // 14
    nfft = n1 * _LANE
    k1 = np.ascontiguousarray(fir_taps, np.float64).tobytes()
    k2 = np.ascontiguousarray(hb_taps, np.float64).tobytes()
    pc_key = np.ascontiguousarray(phase_comp, np.complex64).tobytes()
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:
        interpret = True
    return _fused_spec(spec_planes, tuple(int(c) for c in cps), nfft,
                       k1, len(fir_taps), k2, len(hb_taps), pc_key,
                       interpret=interpret)


def fir_up2_fused_symbols(sym_planes: jnp.ndarray, cps,
                          fir_taps: np.ndarray, hb_taps: np.ndarray
                          ) -> jnp.ndarray:
    """(P, S, 14, nfft) f32 symbol planes -> (P, 2*S*slot_samples) f32:
    CP insertion + FIR + halfband-up2 in one Pallas pass."""
    nfft = sym_planes.shape[-1]
    k1 = np.ascontiguousarray(fir_taps, np.float64).tobytes()
    k2 = np.ascontiguousarray(hb_taps, np.float64).tobytes()
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:
        interpret = True
    return _fused_symbols(sym_planes, tuple(int(c) for c in cps), nfft,
                          k1, len(fir_taps), k2, len(hb_taps),
                          interpret=interpret)


def banded_conv_planes(planes: jnp.ndarray, taps: np.ndarray,
                       mode: str) -> jnp.ndarray:
    """Planar (P, T) f32 entry for one banded-conv stage -> (P, T_out)."""
    t = planes.shape[-1]
    key = np.ascontiguousarray(taps, np.float64).tobytes()
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:
        interpret = True
    y = _banded_conv_planes(planes, key, len(taps), mode,
                            interpret=interpret)
    n_out = {"same": t, "up2": 2 * t, "down2": t // 2}[mode]
    return y[:, :n_out]


def fused_pad_spec(t: int) -> tuple[int, int]:
    """(left, right) zero-padding fir_up2_fused_planes expects around a
    length-t (multiple of 128) plane — callers fold it into their own
    output pass (e.g. ofdm.tx_low_phy_planes' CP concat) for free."""
    assert t % _LANE == 0
    nb = -(-(t // _LANE) // _TM)
    return _FUSE_HALO, (nb + 1) * _TM * _LANE - t - _FUSE_HALO


def fir_up2_fused_planes(planes: jnp.ndarray, fir_taps: np.ndarray,
                         hb_taps: np.ndarray, t_orig: int) -> jnp.ndarray:
    """Pre-padded planar entry: planes (P, l + t_orig + r) f32 with
    (l, r) = fused_pad_spec(t_orig) -> (P, 2*t_orig) f32 planes."""
    k1 = np.ascontiguousarray(fir_taps, np.float64).tobytes()
    k2 = np.ascontiguousarray(hb_taps, np.float64).tobytes()
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:
        interpret = True
    y = _fused_planes_padded(planes, k1, len(fir_taps), k2, len(hb_taps),
                             t_orig=t_orig, interpret=interpret)
    return y[:, : 2 * t_orig]


def fir_up2_fused(x: jnp.ndarray, fir_taps: np.ndarray,
                  hb_taps: np.ndarray) -> jnp.ndarray:
    """hb_upsample2(fir_same(x, fir_taps), hb_taps) in one fused kernel."""
    lead = x.shape[:-1]
    t = x.shape[-1]
    planes = jnp.concatenate(
        [jnp.real(x).reshape(-1, t), jnp.imag(x).reshape(-1, t)]
    ).astype(jnp.float32)
    tpad = _round_up(t, _LANE)
    if tpad != t:
        planes = jnp.pad(planes, ((0, 0), (0, tpad - t)))
    k1 = np.ascontiguousarray(fir_taps, np.float64).tobytes()
    k2 = np.ascontiguousarray(hb_taps, np.float64).tobytes()
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:
        interpret = True
    y = _fused_planes(planes, k1, len(fir_taps), k2, len(hb_taps),
                      t_orig=t, interpret=interpret)
    half = y.shape[0] // 2
    out = jax.lax.complex(y[:half, : 2 * t], y[half:, : 2 * t])
    return out.reshape(lead + (2 * t,)).astype(jnp.complex64)


def banded_conv(x: jnp.ndarray, taps: np.ndarray, mode: str) -> jnp.ndarray:
    """Complex (..., T) banded convolution via the Pallas MXU kernel.

    Drop-in equal (float-reassociation ~1e-6) to ops/filters.py
    _blocked_conv(x, taps, mode).
    """
    n = len(taps)
    lead = x.shape[:-1]
    t = x.shape[-1]
    ratio = {"same": 1, "up2": 2, "down2": 0.5}[mode]
    planes = jnp.concatenate(
        [jnp.real(x).reshape(-1, t), jnp.imag(x).reshape(-1, t)]
    ).astype(jnp.float32)
    tpad = _round_up(t, _LANE)
    if tpad != t:
        planes = jnp.pad(planes, ((0, 0), (0, tpad - t)))
    key = np.ascontiguousarray(taps, np.float64).tobytes()
    try:
        interpret = jax.devices()[0].platform != "tpu"
    except Exception:
        interpret = True
    y = _banded_conv_planes(planes, key, n, mode, interpret=interpret)
    n_out = int(t * ratio)
    half = y.shape[0] // 2
    out = jax.lax.complex(y[:half, :n_out], y[half:, :n_out])
    return out.reshape(lead + (n_out,)).astype(jnp.complex64)
