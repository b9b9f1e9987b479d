"""Side-by-side polar SCL decoder parity: reference vs framework.

VERDICT r2 item 8 — the polar analogue of tools/bler_parity.py. For
every cell of a grid covering UL (iIL=0: CRC11 and the PC-bit CRC6
short block) and DL (iIL=1 distributed-CRC24C: BCH-style and
RNTI-masked DCI) configs at L in {8, 32}, this tool

  1. generates noisy codewords with the repo TX chain (CRC -> polar
     encode -> rate match -> BPSK+AWGN -> repo rate recover; every
     stage is golden-tested vs the reference),
  2. decodes the IDENTICAL N-length LLRs with BOTH the reference
     CA-PC-SCL (/root/reference/py5gphy/polar/nr_polar_decoder_CA_PC_SCL.py:12,
     incl. its in-loop distributed-CRC pruning on the iIL=1 path,
     :87-100) and the repo polar_decode_scl (auto impl),
  3. records per-codeword ok-flag agreement and K-bit decision
     agreement where both decoders report success.

The repo decoder replaces the reference's fork-then-kill CRC/PC
pruning with forced bits (equivalent by construction); this artifact
MEASURES that equivalence instead of asserting it. Mismatches are
possible in principle at near-tie path metrics (reference is f64, repo
f32); the acceptance bar mirrors out/bler_parity.json (>= 0.99).

Writes out/polar_parity.json.

Usage: python tools/polar_parity.py [--trials 200] [--quick]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import use_cpu_for_host_pipelines

use_cpu_for_host_pipelines()

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")
OUT = REPO / "out"

# (label, A=payload bits, E, nMax, iIL, crc_len, pad_crc, rnti, L, snr_db)
# SNRs sit near each config's waterfall so ok=True and ok=False both
# occur and the CRC-ranked selection is actually exercised.
CELLS = [
    ("UL-CRC11-L8",  64, 128, 10, 0, 11, 0, 0,    8,  2.0),
    ("UL-CRC11-L32", 64, 128, 10, 0, 11, 0, 0,    32, 1.5),
    ("UL-PC-CRC6-L8", 18, 80, 10, 0, 6,  0, 0,    8,  -2.5),
    ("DL-BCH-L8",    32, 240, 9,  1, 24, 0, 0,    8,  -3.5),
    ("DL-BCH-L32",   32, 240, 9,  1, 24, 0, 0,    32, -4.0),
    ("DL-DCI-L8",    40, 288, 9,  1, 24, 1, 4567, 8,  -3.5),
]


def gen_stimulus(rng, A, E, n_max, i_il, crc_len, pad_crc, rnti, trials):
    """Repo TX chain -> (ck (B, K), llr_n (B, N) f32)."""
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops import crc as crc_ops
    from python_5gtoolbox_tpu.ops import polar as P
    from python_5gtoolbox_tpu.ops.polar.construct import gen_n_value

    poly = {6: "6", 11: "11", 24: "24C"}[crc_len]
    K = A + crc_len
    payload = rng.integers(0, 2, size=(trials, A)).astype(np.int8)
    cks = []
    for row in payload:
        if pad_crc:
            padded = np.concatenate([np.ones(24, np.int8), row])
            cks.append(crc_ops.crc_encode_np(padded, poly, rnti)[24:])
        else:
            cks.append(crc_ops.crc_encode_np(row, poly))
    ck = np.stack(cks)
    enc = np.stack([P.polar_encode_np(r, E, n_max, i_il) for r in ck])
    ibil = 0 if i_il else 1  # iBIL=1 UL, 0 DL (38.212 5.4.1.3)
    fe = np.asarray(P.polar_ratematch(jnp.asarray(enc), K, E, ibil))
    return ck, fe, ibil, K


def run_cell(label, A, E, n_max, i_il, crc_len, pad_crc, rnti, L, snr_db,
             trials, rng):
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops import polar as P
    from python_5gtoolbox_tpu.ops.polar.construct import gen_n_value

    sys.path.insert(0, str(REFERENCE))
    from py5gphy.polar import nr_polar_decoder  # reference

    ck, fe, ibil, K = gen_stimulus(rng, A, E, n_max, i_il, crc_len,
                                   pad_crc, rnti, trials)
    sigma = 10 ** (-snr_db / 20)
    rx = (1 - 2.0 * fe) + rng.normal(size=fe.shape) * sigma
    llr_e = (2.0 * rx / sigma ** 2).astype(np.float32)
    N, _ = gen_n_value(K, E, n_max)
    llr_n = np.asarray(P.polar_raterecover(jnp.asarray(llr_e), K, N, ibil),
                       np.float32)

    # repo decode (batched)
    ck_hat, ok = P.polar_decode_scl(jnp.asarray(llr_n), E, K, L, n_max,
                                    i_il, crc_len, pad_crc, rnti)
    ck_hat = np.asarray(ck_hat)
    ok = np.asarray(ok)

    # reference decode (per codeword, identical f32-quantized LLRs)
    ref_ok = np.zeros(trials, bool)
    ref_bits = np.zeros((trials, K), np.int8)
    t0 = time.time()
    for i in range(trials):
        rck, rok = nr_polar_decoder.nr_decode_polar(
            "SCL", llr_n[i].astype(np.float64), E, K, L, n_max, i_il,
            crc_len, pad_crc, rnti)
        ref_ok[i] = bool(rok)
        if rok:
            ref_bits[i] = np.asarray(rck, np.int8)
    ref_s = time.time() - t0

    both_ok = ok & ref_ok
    n_both = int(both_ok.sum())
    bitagree = (float(np.mean(ck_hat[both_ok] == ref_bits[both_ok]))
                if n_both else 1.0)
    # correctness vs the true ck for each decoder independently
    repo_correct = np.all(ck_hat == ck, axis=1) & ok
    ref_correct = np.array([ref_ok[i] and np.array_equal(ref_bits[i], ck[i])
                            for i in range(trials)])
    either = repo_correct | ref_correct
    agree_cw = np.array([ok[i] == ref_ok[i]
                         and (not ok[i]
                              or np.array_equal(ck_hat[i], ref_bits[i]))
                         for i in range(trials)])
    return {
        "cell": label,
        "config": dict(A=A, K=K, E=E, N=int(N), nMax=n_max, iIL=i_il,
                       crc_len=crc_len, pad_crc=pad_crc, rnti=rnti, L=L,
                       snr_db=snr_db),
        "trials": trials,
        "ok_agreement": float(np.mean(ok == ref_ok)),
        "both_ok": n_both,
        "bit_agreement_where_both_ok": bitagree,
        # agreement among trials where at least one decoder found the
        # true codeword: disagreements outside this set are two decoders
        # picking DIFFERENT wrong codewords at near-tie path metrics
        # (reference runs f64, repo f32) — not a behavioral divergence.
        "cw_agreement_where_either_correct": (
            float(np.mean(agree_cw[either])) if either.any() else 1.0),
        "n_repo_correct": int(repo_correct.sum()),
        "n_ref_correct": int(ref_correct.sum()),
        "n_both_correct": int((repo_correct & ref_correct).sum()),
        "repo_bler": 1.0 - float(np.mean(repo_correct)),
        "ref_bler": 1.0 - float(np.mean(ref_correct)),
        "ref_decode_s": round(ref_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    trials = 40 if args.quick else args.trials

    rng = np.random.default_rng(20260821)
    results = []
    for cell in CELLS:
        r = run_cell(*cell, trials=trials, rng=rng)
        print(json.dumps(r), flush=True)
        results.append(r)

    summary = {
        "generated_by": "tools/polar_parity.py",
        "reference": "py5gphy/polar/nr_polar_decoder_CA_PC_SCL.py:12",
        "trials_per_cell": trials,
        "min_ok_agreement": min(r["ok_agreement"] for r in results),
        "min_bit_agreement": min(r["bit_agreement_where_both_ok"]
                                 for r in results),
        "min_cw_agreement_where_either_correct": min(
            r["cw_agreement_where_either_correct"] for r in results),
        "cells": results,
    }
    OUT.mkdir(exist_ok=True)
    with open(OUT / "polar_parity.json", "w") as f:
        json.dump(summary, f, indent=1)
    print("min ok agreement:", summary["min_ok_agreement"],
          "min bit agreement:", summary["min_bit_agreement"])


if __name__ == "__main__":
    main()
