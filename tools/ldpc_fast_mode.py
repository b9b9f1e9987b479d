"""LDPC fast-mode experiment (VERDICT r4 item 5).

Validates the Pallas kernel's relaxed check-node semantics
(ops/ldpc/pallas_decode._check_node_minsum_fast: all-ties-excluded m2,
sign(0)=+1) against the reference BLER curves from BASELINE.md
(out/ldpc_decode_result_all.pickle grid: Zc=10 bgn=1, L=32,
SNR -1..1 dB), and measures the throughput delta vs exact semantics at
the bench operating point (Zc=384 bgn=1 layered L=16, B=2048).

Writes out/ldpc_fast_mode_r05.json:
  curves: per-algo per-SNR repo-fast BLER + reference BLER + z-scores
  throughput: exact vs fast cw/s (layered + flooded)

Run ON the TPU (the fast path is a Pallas-kernel option):
    python tools/ldpc_fast_mode.py [--trials 4000] [--skip-curves]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import pickle
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402

select_platform("sweep")

OUT = REPO / "out"
ZC, BGN, L_ITER = 10, 1, 32
K, N = 22 * ZC, 66 * ZC
SNRS = [-1.0, -0.5, 0.0, 0.5, 1.0]
ALGOS = [
    ("min-sum", 1.0, 0.0, "min-sum L=32"),
    ("mixed-0.8-0.3", 0.8, 0.3, "mixed-MS-[alpha,beta]=[0.8,0.3]-L=32"),
]


def gen_stimulus(seed, trials):
    import jax.numpy as jnp

    from python_5gtoolbox_tpu.ops import crc as crc_mod
    from python_5gtoolbox_tpu.ops.ldpc.encode import ldpc_encode

    rng = np.random.default_rng(seed)
    info = rng.integers(0, 2, size=(trials, K - 24)).astype(np.int8)
    bits = np.stack([crc_mod.crc_encode_np(row, "24A") for row in info])
    dn = np.asarray(ldpc_encode(jnp.asarray(bits), BGN))
    return bits, dn


def bler_curve(trials):
    import jax.numpy as jnp

    from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode

    bits, dn = gen_stimulus(1234, trials)
    curves = {}
    for label, alpha, beta, ref_label in ALGOS:
        pts = []
        for i, snr in enumerate(SNRS):
            rng = np.random.default_rng(977 + i)
            en = 1.0 - 2.0 * dn
            sigma = 10 ** (-snr / 20)
            llr = 2.0 * (en + rng.normal(size=dn.shape) * sigma) \
                / (sigma ** 2)
            out_bits, ok, _ = ldpc_decode(
                jnp.asarray(llr, jnp.float32), ZC, BGN, L_ITER,
                "min-sum", alpha, beta, backend="pallas",
                semantics="fast")
            errs = np.any(np.asarray(out_bits) != bits, axis=1)
            pts.append(dict(snr_db=snr, bler=float(np.mean(errs)),
                            trials=trials))
            print(f"{label} snr={snr}: fast bler={pts[-1]['bler']:.4f}",
                  flush=True)
        curves[label] = dict(ref_label=ref_label, points=pts)
    return curves


def ref_trial_count(p):
    """The reference sweep's adaptive trial count for a final BLER p
    (sim_ldpc_internal.py:67-77; same rule as tools/bler_parity.py)."""
    for n, lim in [(1000, 50), (2000, 25), (4000, 10)]:
        if p * n >= lim:
            return n
    return 10000


def attach_reference(curves):
    with open("/root/reference/out/ldpc_decode_result_all.pickle",
              "rb") as f:
        cfg, labels, results = pickle.load(f)
    assert cfg == {"Zc": ZC, "bgn": BGN}
    ref = {lab: list(map(float, blers))
           for lab, blers in zip(labels, results)}
    for label, cur in curves.items():
        blers = ref.get(cur["ref_label"])
        if not blers:
            continue
        for i, pt in enumerate(cur["points"]):
            if i >= len(blers):
                break
            p_ref = blers[i]
            ref_trials = ref_trial_count(p_ref)
            n_repo = pt["trials"]
            pool = (p_ref * ref_trials + pt["bler"] * n_repo) \
                / (ref_trials + n_repo)
            se = np.sqrt(max(pool * (1 - pool), 1e-12)
                         * (1 / ref_trials + 1 / n_repo))
            pt["ref_bler"] = p_ref
            pt["ref_trials"] = ref_trials
            pt["z"] = round(float((pt["bler"] - p_ref) / se), 2) \
                if se > 0 else 0.0
    return curves


def throughput():
    """Exact vs fast cw/s at the bench point (chained dispatches)."""
    import jax
    import jax.numpy as jnp

    from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode

    zc, bgn, b = 384, 1, 2048
    rng = np.random.default_rng(3)
    llr = jnp.asarray(rng.normal(size=(b, 66 * zc)).astype(np.float32) * 4)
    out = {}
    for schedule, n_iter in (("layered", 16), ("flooded", 32)):
        for semantics in ("exact", "fast"):
            def run(x, c):
                bits, ok, _ = ldpc_decode(
                    x + c, zc, bgn, n_iter, "min-sum", 0.8, 0.3,
                    backend="pallas", schedule=schedule,
                    semantics=semantics)
                return bits[0, 0].astype(jnp.float32)
            fn = jax.jit(run)
            c = jnp.float32(0.0)
            # device_get of a scalar is the only REAL sync on axon
            # (block_until_ready returns early there) — without it the
            # compile tail lands inside the timed region
            float(jax.device_get(fn(llr, c)))
            reps = 10
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(reps):
                acc = fn(llr, acc * 1e-9)
            float(jax.device_get(acc))
            dt = time.perf_counter() - t0
            key = f"{schedule}_{semantics}"
            out[key] = dict(cw_per_s=round(b * reps / dt, 1),
                            n_iter=n_iter, batch=b)
            print(f"{key}: {out[key]['cw_per_s']:.0f} cw/s", flush=True)
    for schedule in ("layered", "flooded"):
        e = out[f"{schedule}_exact"]["cw_per_s"]
        f_ = out[f"{schedule}_fast"]["cw_per_s"]
        out[f"{schedule}_speedup"] = round(f_ / e, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4000)
    ap.add_argument("--skip-curves", action="store_true")
    args = ap.parse_args()
    doc = dict(generated_by="tools/ldpc_fast_mode.py",
               semantics="fast = all-ties-excluded m2 + sign(0)=+1 "
                         "(ops/ldpc/pallas_decode.py)")
    doc["throughput"] = throughput()
    if not args.skip_curves:
        doc["curves"] = attach_reference(bler_curve(args.trials))
        zs = [abs(pt["z"]) for cur in doc["curves"].values()
              for pt in cur["points"] if "z" in pt]
        doc["max_abs_z"] = max(zs) if zs else None
        doc["all_in_3sigma"] = bool(zs and max(zs) <= 3.0)
    with open(OUT / "ldpc_fast_mode_r05.json", "w") as f:
        json.dump(doc, f, indent=1)
    print("written out/ldpc_fast_mode_r05.json")


if __name__ == "__main__":
    main()
