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
