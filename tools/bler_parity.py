"""Side-by-side LDPC decoder parity: reference vs framework, identical LLRs.

VERDICT r1 item 1. For every cell of the SURVEY.md section 6 grid
(Zc=10 bgn=1; BP / min-sum / NMS(0.8) / OMS(0.3) / mixed(0.8, 0.3);
L=32; SNR -1..+1 dB step 0.5) this tool

  1. generates >=2000 noisy-LLR codewords (random info bits + CRC24A +
     repo LDPC encode, bit-exact vs the reference encoder per the golden
     tests) exactly like the reference's self-test harness
     (/root/reference/py5gphy/ldpc/nr_ldpc_decode.py:229-258),
  2. decodes them with BOTH the reference decoder
     (/root/reference/py5gphy/ldpc/nr_ldpc_decode.py:11, run on CPU via
     a process pool) and ops.ldpc.decode.ldpc_decode (batched, jitted),
  3. asserts per-codeword K-bit decision agreement and ok-flag
     agreement,
  4. compares the measured BLER against the reference's published curve
     (out/ldpc_decode_result_all.pickle) with a binomial z-score.

Results go to out/bler_parity.json; progress is checkpointed per cell in
out/bler_parity_state.pickle so an interrupted run resumes (the same
sim-gating pattern as the reference's sweep scripts,
/root/reference/scripts/sim_ldpc_decoder.py:40-52).

Usage:
    python tools/bler_parity.py [--trials 2000] [--workers 2] [--quick]
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import pathlib
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import use_cpu_for_host_pipelines

use_cpu_for_host_pipelines()

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")
OUT = REPO / "out"

ZC, BGN, L_ITER = 10, 1, 32
K = 22 * ZC
N = 66 * ZC
SNRS = [-1.0, -0.5, 0.0, 0.5, 1.0]
# (label, repo algo, alpha, beta, reference-pickle curve label)
ALGOS = [
    ("BP", "BP", 1.0, 0.0, "BP L=32"),
    ("min-sum", "min-sum", 1.0, 0.0, "min-sum L=32"),
    ("NMS-0.8", "min-sum", 0.8, 0.0, "NMS-alpha=0.8-L=32"),
    ("OMS-0.3", "min-sum", 1.0, 0.3, "OMS-beta=0.3-L=32"),
    ("mixed-0.8-0.3", "min-sum", 0.8, 0.3,
     "mixed-MS-[alpha,beta]=[0.8,0.3]-L=32"),
]


def gen_stimulus(seed: int, trials: int):
    """(bits (B,K) i1, llr (B,N) f64) like the reference's self-test."""
    from python_5gtoolbox_tpu.ops import crc as crc_mod
    from python_5gtoolbox_tpu.ops.ldpc.encode import ldpc_encode
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    info = rng.integers(0, 2, size=(trials, K - 24)).astype(np.int8)
    bits = np.stack([crc_mod.crc_encode_np(row, "24A") for row in info])
    dn = np.asarray(ldpc_encode(jnp.asarray(bits), BGN))
    return bits, dn


def add_noise(dn: np.ndarray, snr_db: float, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    en = 1.0 - 2.0 * dn
    sigma = 10 ** (-snr_db / 20)
    fn = en + rng.normal(size=dn.shape) * sigma
    return 2.0 * fn / (sigma ** 2)


def repo_decode(llr: np.ndarray, algo: str, alpha: float, beta: float):
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode

    bits, ok, _ = ldpc_decode(jnp.asarray(llr, jnp.float32), ZC, BGN,
                              L_ITER, algo, alpha, beta, backend="jax")
    return np.asarray(bits), np.asarray(ok)


_REF_PARAMS = None


def _ref_init(algo, alpha, beta):
    """Worker init: import the reference with its CWD-relative tables.

    getH rebuilds the dense lifted H from the .mat tables on EVERY decode
    (~0.2 s, /root/reference/py5gphy/ldpc/ldpc_info.py:99); wrap it in a
    cache here — pure memoization, no behavior change."""
    global _REF_PARAMS
    sys.path.insert(0, str(REFERENCE))
    os.chdir(REFERENCE)
    import functools
    from py5gphy.ldpc import ldpc_info
    if not getattr(ldpc_info, "_parity_cache_patch", False):
        orig = ldpc_info.getH
        cached = functools.lru_cache(maxsize=None)(
            lambda zc, bgn, ils: orig(zc, bgn, ils))
        ldpc_info.getH = lambda zc, bgn, ils: cached(zc, bgn, ils).copy()
        ldpc_info._parity_cache_patch = True
    _REF_PARAMS = (algo, alpha, beta)


def _ref_decode_one(llr_row: np.ndarray):
    from py5gphy.ldpc import nr_ldpc_decode
    algo, alpha, beta = _REF_PARAMS
    blkandcrc, _, status = nr_ldpc_decode.nr_decode_ldpc(
        llr_row.copy(), ZC, BGN, L_ITER, algo, alpha, beta)
    return blkandcrc.astype(np.int8), bool(status)


def ref_decode(llr: np.ndarray, algo: str, alpha: float, beta: float,
               workers: int):
    ref_algo = "BP" if algo == "BP" else "min-sum"
    if workers <= 1:
        _ref_init(ref_algo, alpha, beta)
        outs = [_ref_decode_one(row) for row in llr]
    else:
        ctx = mp.get_context("spawn")  # fork would deadlock under JAX
        with ctx.Pool(workers, initializer=_ref_init,
                      initargs=(ref_algo, alpha, beta)) as pool:
            outs = pool.map(_ref_decode_one, llr, chunksize=16)
    bits = np.stack([o[0] for o in outs])
    ok = np.array([o[1] for o in outs], bool)
    return bits, ok


def ref_curve():
    """Published BLER grid from the reference's committed pickle."""
    with open(REFERENCE / "out" / "ldpc_decode_result_all.pickle",
              "rb") as f:
        cfg, labels, results = pickle.load(f)
    assert cfg == {"Zc": ZC, "bgn": BGN}
    return dict(zip(labels, results))


def ref_trial_count(p: float) -> int:
    """The reference sweep's adaptive trial count for a final BLER p
    (sim_ldpc_internal.py:67-77: stop at 1000/2000/4000 trials when
    failures reach 50/25/10, else run 10000)."""
    for n, lim in [(1000, 50), (2000, 25), (4000, 10)]:
        if p * n >= lim:
            return n
    return 10000


def run(trials: int, workers: int, algos, snrs):
    state_path = OUT / "bler_parity_state.pickle"
    OUT.mkdir(exist_ok=True)
    state = {}
    if state_path.exists():
        with open(state_path, "rb") as f:
            state = pickle.load(f)

    curve = ref_curve()
    cells = []
    for ai, (label, algo, alpha, beta, ref_label) in enumerate(algos):
        ref_blers = curve[ref_label]
        for si, snr in enumerate(snrs):
            key = (label, snr, trials)
            if key not in state:
                t0 = time.time()
                seed = 1000 * ai + si
                bits, dn = gen_stimulus(seed, trials)
                llr = add_noise(dn, snr, seed + 77)
                rbits, rok = repo_decode(llr, algo, alpha, beta)
                fbits, fok = ref_decode(llr, algo, alpha, beta, workers)
                agree = np.all(rbits == fbits, axis=1)
                both_ok = rok & fok
                r_err = np.any(rbits != bits, axis=1)
                f_err = np.any(fbits != bits, axis=1)
                state[key] = {
                    # exact decisions where both converge (the parity
                    # gate); failed words carry f32-vs-f64 trajectory
                    # noise and are wrong in both decoders anyway
                    "both_ok_bit_agreement": float(
                        np.mean(agree[both_ok]) if both_ok.any() else 1.0),
                    "ok_agreement": float(np.mean(rok == fok)),
                    "outcome_agreement": float(np.mean(r_err == f_err)),
                    "raw_bit_agreement": float(np.mean(agree)),
                    "repo_bler": float(np.mean(r_err)),
                    "ref_bler": float(np.mean(f_err)),
                    "elapsed_s": round(time.time() - t0, 1),
                }
                with open(state_path, "wb") as f:
                    pickle.dump(state, f)
            cell = dict(state[key])
            p_ref = ref_blers[SNRS.index(snr)]
            n_ref = ref_trial_count(p_ref)
            p_hat = (cell["repo_bler"] * trials + p_ref * n_ref) / (
                trials + n_ref)
            se = np.sqrt(max(p_hat * (1 - p_hat), 1e-12)
                         * (1 / trials + 1 / n_ref))
            cell.update(algo=label, snr_db=snr, trials=trials,
                        ref_curve_bler=p_ref, ref_curve_trials=n_ref,
                        z_vs_curve=round(
                            float(abs(cell["repo_bler"] - p_ref) / se), 2))
            cells.append(cell)
            print(f"{label:14s} snr={snr:+.1f}  both-ok-agree="
                  f"{cell['both_ok_bit_agreement']:.4f}  ok-agree="
                  f"{cell['ok_agreement']:.4f}  bler repo/ref/curve = "
                  f"{cell['repo_bler']:.4f}/{cell['ref_bler']:.4f}/"
                  f"{p_ref:.4f}  z={cell['z_vs_curve']:.2f}  "
                  f"({cell['elapsed_s']}s)", flush=True)

    summary = {
        "config": {"Zc": ZC, "bgn": BGN, "L": L_ITER, "trials": trials,
                   "snr_db": snrs},
        "min_both_ok_bit_agreement": min(
            c["both_ok_bit_agreement"] for c in cells),
        "min_ok_agreement": min(c["ok_agreement"] for c in cells),
        "min_outcome_agreement": min(c["outcome_agreement"] for c in cells),
        "max_z_vs_curve": max(c["z_vs_curve"] for c in cells),
        "cells": cells,
    }
    with open(OUT / "bler_parity.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nwrote {OUT / 'bler_parity.json'}")
    print(f"min both-ok bit agreement: "
          f"{summary['min_both_ok_bit_agreement']:.5f}")
    print(f"min block-error outcome agreement: "
          f"{summary['min_outcome_agreement']:.5f}")
    print(f"max |z| vs published curve: {summary['max_z_vs_curve']:.2f}")
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2000)
    ap.add_argument("--workers", type=int, default=max(1, os.cpu_count()))
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke run (2 algos x 2 SNRs x 50 trials)")
    args = ap.parse_args()
    if args.quick:
        run(50, args.workers, [ALGOS[1], ALGOS[4]], [-0.5, 0.5])
    else:
        run(args.trials, args.workers, ALGOS, SNRS)


if __name__ == "__main__":
    main()
