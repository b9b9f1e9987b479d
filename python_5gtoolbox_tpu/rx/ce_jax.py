"""Jitted, slot-batched channel estimation (device-resident CE).

Same math as rx/channel_estimate.py's NumPy NrChannelEstimation +
dft_dct_channel_estimate (reference behavior targets:
py5gphy/channel_estimate/nr_channel_estimation.py,
py5gphy/channel_estimate/dft_dct_CE.py:10), with a leading SLOT batch
axis and everything expressed as traced jnp ops so an entire sweep's
channel estimation runs as part of ONE device dispatch.

This is the round-4 "TPU-shaped receiver" port (VERDICT r3 item 1a):
the NumPy class is the per-slot latency/reference path; this module is
what the batched RX (phy/pdsch_rx.py rx_process_batch,
phy/pusch_rx.py) traces into its per-sweep executable. Parity with the
NumPy implementation is tested in tests/test_ce_jax.py (the NumPy path
runs largely in float64 — numpy promotes complex64*float64 — so the
agreement tolerance is float32-level, ~1e-4 relative).

All CE_config flags and every shape are static; only the H_LS values
are traced. One-hot matmuls replace argmax gathers (TPU gathers
serialize; see ops/polar/decode.py pmm note).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.utils.numerology import symbol_timing_offsets

_NFFT = 4096  # reference's fixed CE working FFT size


def _one_hot_f(idx, n):
    """(B,) int -> (B, n) float32 one-hot (argmax selection as matmul)."""
    return (jnp.arange(n)[None, :] == idx[:, None]).astype(jnp.float32)


def _lsq_extend(x: np.ndarray, y: jnp.ndarray, x_new: np.ndarray):
    """Batched deg-1 least squares along the last axis: y (..., n) over
    static x (n,), evaluated at static x_new (m,) -> (..., m)."""
    x = np.asarray(x, np.float64)
    xm = x.mean()
    denom = float(((x - xm) ** 2).sum())
    w = ((x - xm) / denom).astype(np.float32)
    slope = jnp.einsum("...n,n->...", y, jnp.asarray(w))
    intercept = jnp.mean(y, axis=-1) - slope * float(xm)
    xn = jnp.asarray(np.asarray(x_new, np.float32))
    return intercept[..., None] + slope[..., None] * xn


def _zero_stuff(x: jnp.ndarray, rd: int, start: int, total: int):
    """(..., n) -> (..., total) with x at [start : start+n*rd : rd]."""
    if rd == 1:
        core = x
    else:
        shape = x.shape + (rd,)
        core = jnp.concatenate(
            [x[..., None],
             jnp.zeros(x.shape + (rd - 1,), x.dtype)], axis=-1)
        core = core.reshape(x.shape[:-1] + (x.shape[-1] * rd,))
    n = core.shape[-1]
    pad = [(0, 0)] * (core.ndim - 1) + [(start, total - start - n)]
    return jnp.pad(core, pad)


def _fo_comp(data: jnp.ndarray, fo: jnp.ndarray, sym_offsets: np.ndarray,
             rd: int, scs: int) -> jnp.ndarray:
    """Batched frequency-offset compensation of (S, n_sym, RE, ...) grids
    sampled every `rd` REs; fo (S,) Hz. Mirrors
    NrChannelEstimation._fo_comp with a slot batch axis."""
    s, n_sym, re_num = data.shape[:3]
    fs = _NFFT * scs * 1000
    start = (_NFFT - rd * re_num) // 2
    flat = data.reshape(s, n_sym, re_num, -1)       # (S, sym, RE, C)
    cols = jnp.moveaxis(flat, 2, 3)                 # (S, sym, C, RE)
    buf = _zero_stuff(cols.astype(jnp.complex64), rd, start, _NFFT)
    t = (np.asarray(sym_offsets, np.float64)[:, None]
         + np.arange(_NFFT) / fs)                   # (sym, NFFT)
    phase = (-2.0 * np.pi) * jnp.asarray(t.astype(np.float32))
    ang = fo[:, None, None, None] * phase[None, :, None, :]
    ramp = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    td = jnp.fft.ifft(jnp.fft.ifftshift(buf, axes=-1), axis=-1) * ramp
    fd = jnp.fft.fftshift(jnp.fft.fft(td, axis=-1), axes=-1)
    res = fd[..., start: start + rd * re_num: rd]   # (S, sym, C, RE)
    return jnp.moveaxis(res, 3, 2).reshape(data.shape).astype(data.dtype)


def channel_est_batch(h_ls: jnp.ndarray, rs_info: dict, ce_config: dict):
    """H_LS (S, n_sym, RE, Nr, Nt) -> dict with
    H (S, 14, RE*rd, Nr, Nt), cov (S, 14, PRB, Nr, Nr),
    to_avg (S,) [s], fo (S,) [Hz], fo_applied (static bool).

    rs_info: RSSymMap, RE_distance, NumCDMGroupsWithoutData, scs.
    ce_config: CE_algo (DFT/DCT[_symmetric]), L_symm_*_in_ns, eRB,
    enable_TO_comp / enable_FO_est / enable_FO_comp (all static).
    """
    h_ls = h_ls.astype(jnp.complex64)
    s, n_sym, re_num, nr, nt = h_ls.shape
    rd = int(rs_info["RE_distance"])
    scs = int(rs_info["scs"])
    rs_map = np.asarray(rs_info["RSSymMap"], np.int64)
    sym_offs = np.asarray(symbol_timing_offsets(scs)[0], np.float64)

    # ---- peak (nr, nt) pair by mean power (one-hot matmul, no gather)
    power = jnp.mean(jnp.abs(h_ls) ** 2, axis=(1, 2)).reshape(s, nr * nt)
    oh = _one_hot_f(jnp.argmax(power, axis=-1), nr * nt)
    peak = jnp.einsum("smrk,sk->smr", h_ls.reshape(s, n_sym, re_num, -1),
                      oh.astype(jnp.complex64))     # (S, sym, RE)

    # ---- timing offset estimate (pre-compensation peak, like the class)
    conv = peak[:, :, 1:] * jnp.conj(peak[:, :, :-1])
    phase = jnp.arctan2(jnp.imag(conv), jnp.real(conv)) \
        / (2 * np.pi * rd * scs * 1000)
    to_avg = jnp.mean(phase, axis=(1, 2))           # (S,)

    if ce_config["enable_TO_comp"]:
        k = np.arange(re_num, dtype=np.float64) * (2 * np.pi * rd
                                                   * scs * 1000)
        ang = -to_avg[:, None] * jnp.asarray(k.astype(np.float32))
        ramp = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        h_ls = h_ls * ramp[:, None, :, None, None]

    # ---- frequency offset estimate (uses the UNcompensated peak rows)
    fo = jnp.zeros((s,), jnp.float32)
    fo_applied = False
    if ce_config["enable_FO_est"] and len(rs_map) > 1:
        start = _NFFT // 2 - re_num // 2
        buf = jnp.pad(peak, ((0, 0), (0, 0),
                             (start, _NFFT - start - re_num)))
        td = jnp.fft.ifft(buf, axis=-1)             # (S, sym, NFFT)
        loc = jnp.argmax(jnp.abs(td[:, 0, :]), axis=-1)
        ohl = _one_hot_f(loc, _NFFT).astype(jnp.complex64)
        max_v = jnp.einsum("smf,sf->sm", td, ohl)   # (S, sym)
        dv = max_v[:, 1:] * jnp.conj(max_v[:, :-1])
        fo_diff = jnp.arctan2(jnp.imag(dv), jnp.real(dv)) / (2 * np.pi)
        t_off = sym_offs[rs_map]
        dt = jnp.asarray((t_off[1:] - t_off[:-1]).astype(np.float32))
        fo = jnp.mean(fo_diff / dt, axis=-1)
        if ce_config["enable_FO_comp"]:
            fo_applied = True
            h_ls = _fo_comp(h_ls, fo, sym_offs[rs_map], rd, scs)

    h_result, cov = _dft_dct_batch(h_ls, rs_info, ce_config)
    return dict(H=h_result, cov=cov, to_avg=to_avg, fo=fo,
                fo_applied=fo_applied)


def comp_data_batch(res: jnp.ndarray, start_sym: int, scs: int,
                    to_avg: jnp.ndarray, fo, ce_config: dict):
    """TO/FO compensation of data REs (S, n_sym, RE, Nr) — the batched
    NrChannelEstimation.process_pdsch_data."""
    if ce_config["enable_TO_comp"]:
        re_num = res.shape[2]
        k = np.arange(re_num, dtype=np.float64) * (2 * np.pi * scs * 1000)
        ang = -to_avg[:, None] * jnp.asarray(k.astype(np.float32))
        ramp = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        res = res * ramp[:, None, :, None]
    if ce_config["enable_FO_comp"] and fo is not None:
        offs = np.asarray(symbol_timing_offsets(scs)[0], np.float64)[
            start_sym: start_sym + res.shape[1]]
        res = _fo_comp(res, fo, offs, 1, scs)
    return res.astype(jnp.complex64)


def _time_interp(arr: jnp.ndarray, rs_map: np.ndarray) -> jnp.ndarray:
    """(S, n_sym, ...) -> (S, 14, ...) linear-fit interpolation."""
    s, n_sym = arr.shape[0], arr.shape[1]
    if n_sym == 1:
        return jnp.broadcast_to(arr, (s, 14) + arr.shape[2:])
    x = np.asarray(rs_map, np.float64)
    xm = x.mean()
    denom = float(((x - xm) ** 2).sum())
    w = ((x - xm) / denom).astype(np.float32)
    flat = arr.reshape(s, n_sym, -1)
    slope = jnp.einsum("snk,n->sk", flat, jnp.asarray(w))
    intercept = jnp.mean(flat, axis=1) - slope * float(xm)
    t = np.arange(14, dtype=np.float32)[:, None]
    out = intercept[:, None, :] + slope[:, None, :] * jnp.asarray(t)
    return out.reshape((s, 14) + arr.shape[2:])


def _dft_dct_batch(h_ls: jnp.ndarray, rs_info: dict, ce_config: dict):
    """Batched dft_dct_channel_estimate -> (H (S,14,RE*rd,Nr,Nt),
    cov (S,14,PRB,Nr,Nr))."""
    s, sym_num, re_num, nr, nt = h_ls.shape
    rd = int(rs_info["RE_distance"])
    scs = int(rs_info["scs"])
    algo = ce_config["CE_algo"]
    model = algo.replace("_symmetric", "")
    symmetric = algo.endswith("_symmetric")
    assert model in ("DFT", "DCT"), f"unsupported CE algo {algo}"
    ek = int(ce_config["eRB"]) * 12 // rd
    right_ek = ek + (re_num + ek) % 2
    assert re_num * rd // 12 > 1, "one-PRB assignment unsupported"

    cols = jnp.moveaxis(h_ls, 2, 4).reshape(-1, re_num)  # (S*sym*nr*nt, RE)
    n_edge = 2 * 12 // rd
    ext = jnp.concatenate([
        _lsq_extend(np.arange(n_edge), cols[:, :n_edge],
                    np.arange(-ek, 0)),
        cols,
        _lsq_extend(np.arange(re_num - n_edge, re_num), cols[:, -n_edge:],
                    np.arange(re_num, re_num + right_ek))], axis=1)
    if symmetric:
        ext = jnp.concatenate([ext, ext[:, ::-1]], axis=1)
    L = ext.shape[-1]
    if model == "DFT":
        h_sym = jnp.fft.ifft(jnp.fft.ifftshift(ext, axes=-1), axis=-1) \
            * np.sqrt(L)
    else:
        from jax.scipy.fft import dct as jdct
        h_sym = (jdct(jnp.real(ext), norm="ortho", axis=-1)
                 + 1j * jdct(jnp.imag(ext), norm="ortho", axis=-1))
    fs_tap = scs * 1000 * rd * L
    l_l = int(float(ce_config["L_symm_left_in_ns"]) * 1e-9 * fs_tap)
    if symmetric:
        l_l = min(L // 3 + L // 16, l_l)
        l_r = l_l
    else:
        l_r = int(float(ce_config["L_symm_right_in_ns"]) * 1e-9 * fs_tap)
    mid_mask = np.zeros(L, np.bool_)
    mid_mask[l_l: L - l_r] = True
    mid_p = jnp.sum(jnp.where(jnp.asarray(mid_mask),
                              jnp.abs(h_sym) ** 2, 0.0),
                    axis=-1, keepdims=True) / max(int(mid_mask.sum()), 1)
    h_sym = jnp.where(jnp.abs(h_sym) < jnp.sqrt(mid_p / 2), 0, h_sym)
    h_sym = jnp.where(jnp.asarray(mid_mask), 0, h_sym)
    if model == "DFT":
        fd = jnp.fft.fftshift(jnp.fft.fft(h_sym, axis=-1), axes=-1) \
            / np.sqrt(L)
    else:
        from jax.scipy.fft import idct as jidct
        fd = (jidct(jnp.real(h_sym), norm="ortho", axis=-1)
              + 1j * jidct(jnp.imag(h_sym), norm="ortho", axis=-1))
    # uniform-stride linear interpolation to every RE (static indices)
    xnew = np.arange(L * rd)
    idx = np.minimum(xnew // rd, L - 1)
    nxt = np.minimum(idx + 1, L - 1)
    frac = np.where(idx == L - 1, 0.0, (xnew % rd) / rd).astype(np.float32)
    full = fd[:, idx] + jnp.asarray(frac)[None, :] * (fd[:, nxt] - fd[:, idx])
    sl = full[:, ek * rd: ek * rd + rd * re_num]
    h_est = jnp.moveaxis(
        sl.reshape(s, sym_num, nr, nt, rd * re_num), 4, 2).astype(
            jnp.complex64)                           # (S, sym, RE*rd, nr, nt)

    rs_map = np.asarray(rs_info["RSSymMap"], np.int64)
    h_result = _time_interp(h_est, rs_map)
    cov = _cov_estimate(h_ls, h_est, rd,
                        int(rs_info["NumCDMGroupsWithoutData"]), rs_map)
    return h_result, cov


def _cov_estimate(h_ls, h_est, rd, n_cdm, rs_map):
    s, sym_num, re_num, nr, nt = h_ls.shape
    nhs = h_ls - h_est[:, :, ::rd, :, :]
    n_rb_cov = 16
    per = (12 // rd) * n_rb_cov
    n_blocks = re_num // per
    residual = re_num - n_blocks * per
    if residual and n_blocks >= 1:
        # merge the last full block into the residual for more averaging;
        # for sub-16-PRB allocations (n_blocks == 0) the residual IS the
        # whole allocation — decrementing would make the PRB axis
        # total_prbs+16 (ADVICE r4 finding 1)
        n_blocks -= 1
        residual += per
    total_prbs = re_num * rd // 12
    blocks = []
    fill = []
    for b in range(n_blocks):
        seg = nhs[:, :, b * per:(b + 1) * per]        # (S, sym, per, nr, nt)
        c = jnp.einsum("smkat,smkbt->smab", seg, jnp.conj(seg)) / per / nt
        blocks.append(c)
        fill.append(n_rb_cov)
    if residual:
        seg = nhs[:, :, n_blocks * per:]
        c = jnp.einsum("smkat,smkbt->smab", seg,
                       jnp.conj(seg)) / residual / nt
        blocks.append(c)
        fill.append(total_prbs - n_blocks * n_rb_cov)
    cov = jnp.concatenate(
        [jnp.repeat(c[:, :, None], nrep, axis=2)
         for c, nrep in zip(blocks, fill)], axis=2)   # (S, sym, PRB, nr, nr)
    if n_cdm == 1:
        cov = cov * 2
    return _time_interp(cov.astype(jnp.complex64), rs_map)
