"""Offline FIR / halfband filter design search (host-side tooling).

Behavior parity target: py5gphy/nr_lowphy/rx_lowphy_process.py:167-418
(HB_channel_filter, tx_rx_FIR_filter, searching_fir_filter,
searching_HB_filter) — the reference's edit-the-constants studies that
chose the per-(scs, BW) FIR tap counts baked into ops/filters.py and the
55-tap/0.21-Fpass halfband. This tool reproduces the search as a
callable: sweep candidate tap counts / passbands, push a fully loaded
QAM grid through TX low-PHY -> candidate filter chain -> RX chain, and
score EVM (flatness / timing integrity) plus ACLR vs the 38.104 6.6.3
-45 dB target. Everything runs on the host backend; results feed the
static tables, never the device path.

Usage:
    python tools/filter_search.py --scs 30 --bw 40
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import use_cpu_for_host_pipelines

use_cpu_for_host_pipelines()

import jax.numpy as jnp  # noqa: E402
from scipy.signal import remez  # noqa: E402

from python_5gtoolbox_tpu.ops import filters, ofdm  # noqa: E402
from python_5gtoolbox_tpu.utils import numerology as num  # noqa: E402


def hb_channel_filter(in_wf: np.ndarray, scs: int, bw: int, is_tx: bool,
                      oversample_num: int, numtaps: int,
                      fpass: float) -> np.ndarray:
    """Parameterized halfband chain (reference rx_lowphy:167-210)."""
    taps = remez(numtaps, [0, fpass, 0.5 - fpass, 0.5], [1, 0])
    y = jnp.asarray(in_wf)
    for _ in range(oversample_num):
        y = (filters.hb_upsample2(y, taps) if is_tx
             else filters.hb_downsample2(y, taps))
    return np.asarray(y)


def tx_rx_fir_filter(in_wf: np.ndarray, scs: int, bw: int,
                     numtaps: int) -> np.ndarray:
    """Parameterized 1x FIR (reference rx_lowphy:213-238)."""
    prb = num.carrier_prb_size(scs, bw)
    fs = num.fft_size(prb) * scs * 1000
    fpass = ((prb * 12 * scs + scs / 2) * 1000) / 2
    fstop = bw * 1e6 / 2
    taps = remez(numtaps, [0, fpass, fstop, fs / 2], [1, 0], fs=fs)
    return np.asarray(filters.fir_same(jnp.asarray(in_wf), taps))


def aclr_db(wf: np.ndarray, fs: float, bw_hz: float) -> float:
    """Adjacent-channel leakage ratio (dB), 38.104 6.6.3 style."""
    spec = np.fft.fftshift(np.fft.fft(wf[0]))
    f = np.fft.fftshift(np.fft.fftfreq(wf.shape[-1], 1 / fs))
    inband = np.abs(f) <= bw_hz / 2
    adj = (np.abs(f - bw_hz) <= bw_hz / 2) | (np.abs(f + bw_hz) <= bw_hz / 2)
    p_in = np.sum(np.abs(spec[inband]) ** 2)
    p_adj = np.sum(np.abs(spec[adj]) ** 2) / 2  # per adjacent channel
    return float(10 * np.log10(p_adj / p_in))


def _fir_evm_aclr(scs: int, bw: int, numtaps: int,
                  seed: int = 0) -> tuple[float, float]:
    """Push a full random-QPSK grid TX->FIR->RX; return (EVM %, ACLR dB).

    The rng is re-seeded per call so every candidate tap count is scored
    on the identical input grid, and ACLR is measured after upsampling
    through the production halfband chain so the adjacent-channel band
    [bw/2, 3bw/2] lies inside Nyquist (at the 1x carrier-native rate it
    extends past fs/2 for most (scs, bw) and would be truncated).
    """
    rng = np.random.default_rng(seed)
    prb = num.carrier_prb_size(scs, bw)
    n_sc = 12 * prb
    grid = ((1 - 2 * rng.integers(0, 2, (1, 1, 14, n_sc)))
            + 1j * (1 - 2 * rng.integers(0, 2, (1, 1, 14, n_sc)))
            ).astype(np.complex64) / np.sqrt(2)
    td = ofdm.tx_low_phy(jnp.asarray(grid), scs, bw, 0)[0]  # (1, S)
    fs = num.fft_size(prb) * scs * 1000
    filt = tx_rx_fir_filter(np.asarray(td), scs, bw, numtaps)
    rx = ofdm.rx_low_phy(jnp.asarray(filt)[None], scs, bw, 0)[0]
    err = np.asarray(rx) - grid[0]
    evm = float(np.sqrt(np.mean(np.abs(err) ** 2)
                        / np.mean(np.abs(grid) ** 2)) * 100)
    hb = filters.halfband_coeff()
    y, fs_out = jnp.asarray(filt), fs
    while fs_out < 3 * bw * 1e6 and fs_out < 245.76e6:
        y, fs_out = filters.hb_upsample2(y, hb), fs_out * 2
    return evm, aclr_db(np.asarray(y), fs_out, bw * 1e6)


def search_fir_taps(scs: int, bw: int,
                    candidates=(27, 45, 71, 87, 143, 287),
                    evm_target_pct: float = 1.0,
                    aclr_target_db: float = -45.0,
                    seed: int = 0) -> dict:
    """Smallest FIR tap count meeting the EVM and ACLR targets."""
    results = {}
    best = None
    for nt in candidates:
        evm, aclr = _fir_evm_aclr(scs, bw, nt, seed)
        results[nt] = {"evm_pct": evm, "aclr_db": aclr}
        if best is None and evm <= evm_target_pct and aclr <= aclr_target_db:
            best = nt
    return {"scs": scs, "bw": bw, "best_numtaps": best, "results": results}


def search_hb(fpass_list=(0.18, 0.20, 0.21, 0.22),
              numtaps_list=(39, 47, 55, 63),
              seed: int = 0) -> dict:
    """Halfband (numtaps, fpass) round-trip EVM grid (up2 then down2)."""
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(1, 8192)) + 1j * rng.normal(size=(1, 8192))
         ).astype(np.complex64)
    out = {}
    for nt in numtaps_list:
        for fp in fpass_list:
            taps = remez(nt, [0, fp, 0.5 - fp, 0.5], [1, 0])
            y = filters.hb_downsample2(filters.hb_upsample2(
                jnp.asarray(x), taps), taps) / 2.0
            err = np.asarray(y) - x
            core = slice(nt, -nt)
            evm = float(np.sqrt(np.mean(np.abs(err[:, core]) ** 2)
                                / np.mean(np.abs(x[:, core]) ** 2)) * 100)
            out[(nt, fp)] = evm
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scs", type=int, default=30)
    ap.add_argument("--bw", type=int, default=40)
    ap.add_argument("--hb", action="store_true", help="search halfband too")
    args = ap.parse_args()
    res = search_fir_taps(args.scs, args.bw)
    print(f"FIR search scs={args.scs} bw={args.bw}:")
    for nt, m in res["results"].items():
        print(f"  numtaps={nt:4d}  EVM={m['evm_pct']:.3f}%  "
              f"ACLR={m['aclr_db']:.1f} dB")
    print(f"  best: {res['best_numtaps']}")
    if args.hb:
        for (nt, fp), evm in search_hb().items():
            print(f"  HB numtaps={nt} fpass={fp}: EVM={evm:.4f}%")


if __name__ == "__main__":
    main()
