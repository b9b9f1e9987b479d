"""Measure the reference nr_decode_ldpc throughput on this host's CPU.

Provides the vs_baseline denominator for bench.py's LDPC metrics
(VERDICT r2 item 5). Config matches the bench: Zc=384 bgn=1 mixed
min-sum alpha=0.8 beta=0.3, garbage LLRs so the early syndrome exit
never fires (same worst-case convention as the TPU bench). Reference
behavior under test: /root/reference/py5gphy/ldpc/nr_ldpc_decode.py:11.

Iteration extrapolation: runs L=2 and L=16 on identical LLRs (best of
2 each); per-iteration cost is (t16 - t2) / 14 and the L-iteration
per-codeword time is setup + L*per_iter (setup = A/B adjacency build +
dense Lq/Lr allocation; getH pre-cached, one warmup decode first).

Writes out/ldpc_ref_cpu_timing.json. Run from the repo root.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    os.chdir("/root/reference")  # getH loads tables via relative path
    from py5gphy.ldpc import nr_ldpc_decode, ldpc_info

    zc, bgn = 384, 1
    N = 66 * zc
    rng = np.random.default_rng(1)
    llr = rng.normal(size=N) * 4.0

    t0 = time.perf_counter()
    ldpc_info.getH(zc, bgn, ldpc_info.find_iLS(zc))  # warm loadmat cache
    t_geth = time.perf_counter() - t0

    # warmup decode: pages in the 460 MB dense H and warms BLAS; the
    # first timing run otherwise over-reports by tens of seconds
    nr_ldpc_decode.nr_decode_ldpc(llr, zc, bgn, 1, "min-sum", 0.8, 0.3)
    print("warmup done", flush=True)

    # L=2 vs L=16: a 14-iteration delta so the per-iteration slope is
    # well above the +-5 s allocation/paging noise of the ~35 s
    # per-call setup (dense 3.7 GB Lq/Lr allocation + A/B adjacency
    # scan). Best of 2 runs each.
    times = {}
    for L in (2, 16):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            nr_ldpc_decode.nr_decode_ldpc(llr, zc, bgn, L, "min-sum",
                                          0.8, 0.3)
            best = min(best, time.perf_counter() - t0)
        times[L] = best
        print(f"L={L}: {times[L]:.1f} s", flush=True)

    per_iter = (times[16] - times[2]) / 14.0
    setup = times[2] - 2.0 * per_iter
    t32 = setup + 32.0 * per_iter
    t16 = setup + 16.0 * per_iter
    out = {
        "host": "2 vCPU (see /proc/cpuinfo), numpy " + np.__version__,
        "config": "Zc=384 bgn=1 mixed-MS alpha=0.8 beta=0.3 garbage LLRs",
        "method": "L=2 vs L=16 best-of-2, linear extrapolation; getH cached",
        "t_getH_s": round(t_geth, 2),
        "t_L2_s": round(times[2], 2),
        "t_L16_s": round(times[16], 2),
        "per_iteration_s": round(per_iter, 3),
        "setup_s": round(setup, 3),
        "t_L32_per_codeword_s": round(t32, 2),
        "ref_cw_per_s_L32": round(1.0 / t32, 6),
        "ref_cw_per_s_L16": round(1.0 / t16, 6),
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(REPO, "out", "ldpc_ref_cpu_timing.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
