"""Channel estimation: timing/frequency offset + DFT/DCT denoising CE.

Behavior parity targets:
  py5gphy/channel_estimate/nr_channel_estimation.py (NrChannelEstimation:
      peak-pair selection, DMRS phase-slope timing offset, cross-symbol
      frequency offset, compensation of H_LS and data REs)
  py5gphy/channel_estimate/dft_dct_CE.py (edge extrapolation, (i)DFT/DCT
      tap-domain noise windowing, x-interpolation back to every RE,
      linear time interpolation to 14 symbols, per-16-PRB noise
      covariance with CDM compensation)

Vectorized NumPy/SciPy implementation (per-slot estimation is a cheap
latency path; the heavy lifting downstream — equalization and decoding —
is the jitted batched code).
"""
from __future__ import annotations

import numpy as np
from scipy import fft as sfft

from python_5gtoolbox_tpu.utils.numerology import symbol_timing_offsets

# Above f_m = FO_EST_FM_LIMIT_FRACTION * scs_hz the FO estimator's
# Doppler-induced error dominates any real CFO it could correct (see
# NrChannelEstimation.freq_offset_est contract); sims clamp FO est off.
FO_EST_FM_LIMIT_FRACTION = 0.002


def fo_est_valid_for_doppler(fm_hz: float, scs: int) -> bool:
    """True if freq_offset_est's error floor is acceptable at this f_m."""
    return fm_hz <= FO_EST_FM_LIMIT_FRACTION * scs * 1000.0


def _polyfit_extend(x, y, x_new):
    """Linear least-squares fit of (x, y), evaluated at x_new (complex)."""
    coeff = np.polyfit(x, y, 1)
    return np.poly1d(coeff)(x_new)


def _lsq_extend(x, y, x_new):
    """Batched deg-1 least squares: y (B, n) over x (n,), eval x_new (m,).

    Same math as np.polyfit(x, y, 1) row-by-row (closed form)."""
    x = np.asarray(x, np.float64)
    xm = x.mean()
    denom = ((x - xm) ** 2).sum()
    slope = ((x - xm)[None, :] * y).sum(axis=1) / denom
    intercept = y.mean(axis=1) - slope * xm
    return intercept[:, None] + slope[:, None] * np.asarray(x_new)[None, :]


class NrChannelEstimation:
    """Reference-compatible channel estimator.

    H_LS: (sym_num, RE_num, Nr, Nt) LS estimates on RS REs.
    """

    def __init__(self, H_LS: np.ndarray, RS_info: dict, CE_config: dict):
        self.H_LS = np.array(H_LS, np.complex64)
        self.RS_info = RS_info
        CE_config.setdefault("freq_intp_method", "linear")
        CE_config.setdefault("timing_intp_method", "linear")
        self.CE_config = CE_config
        self.freq_offset = None
        sym_num, re_num, nr, nt = self.H_LS.shape
        assert sym_num == len(RS_info["RSSymMap"])
        # peak (nr, nt) pair by mean power
        power = np.mean(np.abs(self.H_LS) ** 2, axis=(0, 1))  # (Nr, Nt)
        peak = np.unravel_index(np.argmax(power), power.shape)
        self.peak_H_LS = self.H_LS[:, :, peak[0], peak[1]]
        self.symbols_timing_offset_list = symbol_timing_offsets(
            RS_info["scs"])[0]

    # -- estimation steps ---------------------------------------------------
    def timing_offset_est(self):
        rd = self.RS_info["RE_distance"]
        scs = self.RS_info["scs"]
        h = self.peak_H_LS
        conv = h[:, 1:] * np.conj(h[:, :-1])
        phase = np.arctan2(conv.imag, conv.real) / (2 * np.pi * rd
                                                    * scs * 1000)
        self.TO_est = phase.mean(axis=1)
        return self.TO_est

    def comp_H_LS_timing_offset(self):
        rd = self.RS_info["RE_distance"]
        scs = self.RS_info["scs"]
        re_num = self.H_LS.shape[1]
        avg_to = np.mean(self.TO_est)
        ramp = np.exp(-1j * 2 * np.pi * avg_to * rd * np.arange(re_num)
                      * scs * 1000)
        self.H_LS *= ramp[None, :, None, None].astype(np.complex64)

    def freq_offset_est(self):
        """Carrier-frequency-offset estimate from the peak tap's phase
        rotation across DMRS symbols.

        CONTRACT (valid Doppler range): the phase slope of the strongest
        time-domain tap cannot distinguish a deterministic CFO from the
        Doppler-induced rotation of the fading process itself, so the
        estimate carries an irreducible error of order f_m (the max
        Doppler frequency). Only use enable_FO_est/enable_FO_comp when
        f_m is well below the CFO accuracy you need — measured round 3:
        at scs30 with DMRS AddPos1, f_m = 200 Hz is already read as a
        ~100 Hz-scale spurious CFO whose "compensation" corrupts decode.
        For f_m > ~FO_EST_FM_LIMIT_FRACTION * scs, disable FO estimation
        (the reference sims do the same: NR_PDSCH_throughput_example.py
        ships with enable_FO_est False for its fading configs). The sim
        internals clamp this automatically and print a note.
        """
        rs_map = self.RS_info["RSSymMap"]
        if len(rs_map) == 1:
            self.FO_est = 0
            return False, 0
        t_off = self.symbols_timing_offset_list[rs_map]
        max_v = np.zeros(len(rs_map), np.complex64)
        max_loc = None
        for m in range(len(rs_map)):
            sel = self.peak_H_LS[m]
            buf = np.zeros(4096, np.complex64)
            s = 4096 // 2 - sel.size // 2
            buf[s: s + sel.size] = sel
            td = sfft.ifft(buf)
            if m == 0:
                max_loc = np.argmax(np.abs(td))
            max_v[m] = td[max_loc]
        conv = max_v[1:] * np.conj(max_v[:-1])
        fo_diff = np.arctan2(conv.imag, conv.real) / (2 * np.pi)
        self.FO_est = np.mean(fo_diff / (t_off[1:] - t_off[:-1]))
        return True, self.FO_est

    def _fo_comp(self, data, sym_offsets, re_distance):
        """Time-domain per-symbol frequency-offset compensation of a
        (n_sym, RE_num, ...) grid sampled every `re_distance` REs.

        Batched over (symbol, column): one ifft/fft pair on a
        (n_sym, n_col, 4096) stack instead of the reference's
        per-column loop (nr_channel_estimation.py:268-328 equivalent)."""
        n_sym, re_num = data.shape[:2]
        nfft = 4096
        fs = nfft * self.RS_info["scs"] * 1000
        start = (nfft - re_distance * re_num) // 2
        flat = data.reshape(n_sym, re_num, -1)          # (S, RE, C)
        n_col = flat.shape[-1]
        buf = np.zeros((n_sym, n_col, nfft), np.complex64)
        buf[:, :, start: start + re_distance * re_num: re_distance] = \
            np.swapaxes(flat, 1, 2)
        t = (np.asarray(sym_offsets)[:, None, None]
             + np.arange(nfft)[None, None, :] / fs)
        ramp = np.exp(-1j * 2 * np.pi * self._fo_value * t)
        td = sfft.ifft(sfft.ifftshift(buf, axes=-1), axis=-1) * ramp
        fd = sfft.fftshift(sfft.fft(td, axis=-1), axes=-1)
        res = fd[:, :, start: start + re_distance * re_num: re_distance]
        return np.swapaxes(res, 1, 2).reshape(data.shape)

    def comp_H_LS_freq_offset(self, freq_offset):
        self._fo_value = freq_offset
        rs_map = self.RS_info["RSSymMap"]
        self.H_LS = self._fo_comp(
            self.H_LS, self.symbols_timing_offset_list[rs_map],
            self.RS_info["RE_distance"]).astype(np.complex64)

    def channel_est(self, freq_offset=None):
        self.freq_offset = freq_offset
        self.timing_offset_est()
        if self.CE_config["enable_TO_comp"]:
            self.comp_H_LS_timing_offset()
        if self.CE_config["enable_FO_est"]:
            fo_status, fo_est = self.freq_offset_est()
        else:
            fo_status, fo_est = False, 0
        self.FO_status, self.FO_est = fo_status, fo_est
        if self.CE_config["enable_FO_comp"]:
            if freq_offset:
                self.comp_H_LS_freq_offset(freq_offset)
            elif fo_status:
                self.comp_H_LS_freq_offset(fo_est)
        algo = self.CE_config["CE_algo"]
        base = algo.replace("_symmetric", "")
        assert base in ("DFT", "DCT"), f"unsupported CE algo {algo}"
        h, cov = dft_dct_channel_estimate(
            self.H_LS, self.RS_info, self.CE_config, base,
            symmetric=algo.endswith("_symmetric"))
        self.H_result, self.cov_m = h, cov
        return h, cov

    def process_pdsch_data(self, pdsch_resource, pdsch_start_sym):
        """TO/FO compensation of the data REs (reference-compatible)."""
        if self.CE_config["enable_TO_comp"]:
            scs = self.RS_info["scs"]
            avg_to = np.mean(self.TO_est)
            re_num = pdsch_resource.shape[1]
            ramp = np.exp(-1j * 2 * np.pi * avg_to * np.arange(re_num)
                          * scs * 1000)
            pdsch_resource = pdsch_resource * ramp[None, :, None]
        if self.CE_config["enable_FO_comp"]:
            fo = self.freq_offset if self.freq_offset else (
                self.FO_est if self.FO_status else None)
            if fo:
                self._fo_value = fo
                offs = self.symbols_timing_offset_list[
                    pdsch_start_sym: pdsch_start_sym
                    + pdsch_resource.shape[0]]
                pdsch_resource = self._fo_comp(pdsch_resource, offs, 1)
        return pdsch_resource.astype(np.complex64)


def _hls_extra(sel, ek, right_ek, rd):
    """Edge linear extrapolation (dft_dct_CE.HLS_extra)."""
    n = sel.size
    xp = np.arange(2 * 12 // rd)
    left = _polyfit_extend(xp, sel[xp], np.arange(-ek, 0))
    xr = np.arange(n - 2 * 12 // rd, n)
    right = _polyfit_extend(xr, sel[xr], np.arange(n, n + right_ek))
    return np.concatenate([left, sel, right])


def dft_dct_channel_estimate(H_LS, RS_info, CE_config, model="DFT",
                             symmetric=False):
    """Denoising channel estimate -> (H (14, RE*rd, Nr, Nt), cov (14, PRB,
    Nr, Nr)). Mirrors dft_dct_CE.DFT_DCT_channel_estimate and, with
    symmetric=True, dft_dct_symmetric_CE.DFT_DCT_symmetric_channel_estimate
    (mirror-extend before the transform; L_right forced equal to L_left
    with the size//3 + size//16 cap; the reference computes but never
    uses the two-half combination H_comb — the interpolation runs on the
    full 2M-length spectrum and the mirrored half is dropped by the
    final slice, reproduced here exactly)."""
    rd = RS_info["RE_distance"]
    scs = RS_info["scs"]
    l_left_ns = CE_config["L_symm_left_in_ns"]
    l_right_ns = CE_config["L_symm_right_in_ns"]
    erb = CE_config["eRB"]
    ek = erb * 12 // rd
    intp = CE_config.get("freq_intp_method", "linear")

    sym_num, re_num, nr, nt = H_LS.shape
    right_ek = ek + (re_num + ek) % 2
    assert re_num * rd // 12 > 1, "one-PRB assignment unsupported"

    # batched over (symbol, Nr, Nt): one edge least-squares, one
    # transform pair, and one linear interpolation on a (S*Nr*Nt, .)
    # stack — replaces the reference's triple loop
    # (dft_dct_CE.py:10-103), numerics unchanged
    cols = np.moveaxis(H_LS, 1, -1).reshape(-1, re_num)  # (S*Nr*Nt, RE)
    n_edge = 2 * 12 // rd
    ext = np.concatenate([
        _lsq_extend(np.arange(n_edge), cols[:, :n_edge],
                    np.arange(-ek, 0)),
        cols,
        _lsq_extend(np.arange(re_num - n_edge, re_num), cols[:, -n_edge:],
                    np.arange(re_num, re_num + right_ek))], axis=1)
    if symmetric:
        ext = np.concatenate([ext, ext[:, ::-1]], axis=1)
    if model == "DFT":
        h_sym = sfft.ifft(sfft.ifftshift(ext, axes=-1), axis=-1) \
            * np.sqrt(ext.shape[-1])
    else:
        h_sym = sfft.dct(ext.real.copy(), norm="ortho", axis=-1) \
            + 1j * sfft.dct(ext.imag.copy(), norm="ortho", axis=-1)
    fs_tap = scs * 1000 * rd * ext.shape[-1]
    l_l = int(l_left_ns * 1e-9 * fs_tap)
    if symmetric:
        l_l = min(ext.shape[-1] // 3 + ext.shape[-1] // 16, l_l)
        l_r = l_l
    else:
        l_r = int(l_right_ns * 1e-9 * fs_tap)
    mid = h_sym[:, l_l: h_sym.shape[-1] - l_r]
    noise_p = np.mean(np.abs(mid) ** 2, axis=-1, keepdims=True)
    h_sym = np.where(np.abs(h_sym) < np.sqrt(noise_p / 2), 0, h_sym)
    h_sym[:, l_l: h_sym.shape[-1] - l_r] = 0
    if model == "DFT":
        fd = sfft.fftshift(sfft.fft(h_sym, axis=-1), axes=-1) \
            / np.sqrt(h_sym.shape[-1])
    else:
        fd = sfft.idct(h_sym.real.copy(), norm="ortho", axis=-1) \
            + 1j * sfft.idct(h_sym.imag.copy(), norm="ortho", axis=-1)
    del intp  # only "linear" is implemented (reference default)
    # uniform-stride linear interpolation to every RE (np.interp clamps
    # past the last sample; idx clipping reproduces that)
    xnew = np.arange(fd.shape[-1] * rd)
    idx = np.minimum(xnew // rd, fd.shape[-1] - 1)
    nxt = np.minimum(idx + 1, fd.shape[-1] - 1)
    frac = np.where(idx == fd.shape[-1] - 1, 0.0, (xnew % rd) / rd)
    full = fd[:, idx] + frac[None, :] * (fd[:, nxt] - fd[:, idx])
    sl = full[:, ek * rd: ek * rd + rd * re_num]
    h_est = np.ascontiguousarray(np.moveaxis(
        sl.reshape(sym_num, nr, nt, rd * re_num), -1, 1)).astype(
            np.complex64)

    h_result = _time_interp(h_est, RS_info["RSSymMap"])
    cov = _cov_estimate(H_LS, h_est, rd,
                        RS_info["NumCDMGroupsWithoutData"],
                        RS_info["RSSymMap"])
    return h_result, cov


def _time_interp(arr, rs_map):
    """Linear-fit interpolation over symbols to all 14 (polyfit style)."""
    sym_num = arr.shape[0]
    out_shape = (14,) + arr.shape[1:]
    if sym_num == 1:
        return np.broadcast_to(arr[0], out_shape).astype(np.complex64).copy()
    x = np.asarray(rs_map, float)
    flat = arr.reshape(sym_num, -1)
    # vectorized degree-1 least squares over all columns
    xm = x.mean()
    denom = ((x - xm) ** 2).sum()
    slope = ((x - xm)[:, None] * flat).sum(axis=0) / denom
    intercept = flat.mean(axis=0) - slope * xm
    t = np.arange(14)[:, None]
    out = intercept[None, :] + slope[None, :] * t
    return out.reshape(out_shape).astype(np.complex64)


def _cov_estimate(H_LS, h_est, rd, n_cdm, rs_map):
    sym_num, re_num, nr, nt = H_LS.shape
    nhs = H_LS - h_est[:, ::rd, :, :]
    n_rb_cov = 16
    per = (12 // rd) * n_rb_cov
    n_blocks = re_num // per
    residual = re_num - n_blocks * per
    if residual and n_blocks >= 1:
        n_blocks -= 1
        residual += per
    # sub-16-PRB allocations keep n_blocks == 0 with residual == re_num;
    # the reference (dft_dct_CE.py:204-206) would decrement to -1 and
    # then IndexError in its residual loop — behavior is defined here
    # instead: one covariance block averaged over the whole allocation
    total_prbs = re_num * rd // 12
    cov = np.zeros((sym_num, total_prbs, nr, nr), np.complex64)
    for m in range(sym_num):
        for b in range(n_blocks):
            seg = nhs[m, b * per:(b + 1) * per]          # (per, Nr, Nt)
            c = np.einsum("kat,kbt->ab", seg, np.conj(seg)) / per / nt
            cov[m, b * n_rb_cov:(b + 1) * n_rb_cov] = c
        if residual:
            seg = nhs[m, n_blocks * per:]
            c = np.einsum("kat,kbt->ab", seg, np.conj(seg)) / residual / nt
            cov[m, n_blocks * n_rb_cov:] = c
    if n_cdm == 1:
        cov *= 2
    return _time_interp(cov, rs_map)
