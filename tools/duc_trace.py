"""Device trace of the warm OFDM+DUC chain -> per-op-group breakdown.

Regenerates the out/duc_trace_r0N.json artifact (VERDICT r3 item 10 /
r4 item 2): jax.profiler trace around warm jitted steps of bench.py's
OFDM+DUC chain, TPU lane events aggregated by HLO op-group name.

Usage: python tools/duc_trace.py [--steps 8] [--out out/duc_trace_r05.json]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import pathlib
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402

select_platform("sweep")


def run_chain(steps: int, logdir: str):
    import jax
    import jax.numpy as jnp

    from python_5gtoolbox_tpu.ops import filters
    from python_5gtoolbox_tpu.utils import numerology as num

    scs, bw, n_slots, nant = 30, 100, 64, 2
    prb = num.carrier_prb_size(scs, bw)
    rng = np.random.default_rng(0)
    fd = (rng.normal(size=(nant, n_slots, 14, 12 * prb))
          + 1j * rng.normal(size=(nant, n_slots, 14, 12 * prb))
          ).astype(np.complex64)
    from python_5gtoolbox_tpu.utils.host import to_device
    fdj = to_device(fd)

    @jax.jit
    def step(x, c):
        y = filters.tx_lowphy_duc(x * (1.0 + c), scs, bw, int(3500e6),
                                  as_planes="split")
        re, im = (y if isinstance(y, tuple)
                  else (y[:nant], y[nant:]))
        return jnp.abs(jax.lax.complex(re[0, -1], im[0, -1]))

    c = jnp.float32(0.0)
    float(jax.device_get(step(fdj, c)))        # compile + REAL sync
    with jax.profiler.trace(logdir):
        acc = jnp.float32(0.0)
        for _ in range(steps):
            acc = step(fdj, acc * 1e-12)
        float(jax.device_get(acc))
    out_samples = n_slots * (num.fft_size(prb) * 15) * \
        int(round(245.76e6 / (num.fft_size(prb) * scs * 1000)))
    return out_samples


def parse_trace(logdir: str, steps: int):
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {logdir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # identify device lanes: process names containing TPU / device
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "tpu" in name or "/device" in name}
    agg = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_step"):
            continue                      # envelope event
        base = name.split(".")[0].split("(")[0]
        agg[base] += e.get("dur", 0)
    total = sum(agg.values())
    groups = [dict(op_group=k, ms_per_step=round(v / 1e3 / steps, 3))
              for k, v in agg.most_common()
              if v / 1e3 / steps >= 0.01]
    return (dict(pid_names=pid_names) if not groups else None,
            groups, round(total / 1e3 / steps, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="out/duc_trace_r05.json")
    args = ap.parse_args()
    with tempfile.TemporaryDirectory() as logdir:
        out_samples = run_chain(args.steps, logdir)
        debug, groups, total_ms = parse_trace(logdir, args.steps)
    doc = dict(
        purpose="per-op device time of the warm OFDM+DUC bench chain "
                "(jax.profiler trace, envelope excluded)",
        method=f"{args.steps} warm chained jit steps of the "
               "tx_lowphy_duc planar fused path",
        config="scs30 bw100 slots64 ant2, "
               f"{out_samples/1e6:.1f}M output samples/step",
        total_device_ms_per_step=total_ms,
        gs_per_s_device=round(out_samples / max(total_ms, 1e-9) / 1e6, 2),
        op_groups=groups,
    )
    if debug:
        doc["debug"] = debug
    with open(REPO / args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc)[:1500])


if __name__ == "__main__":
    main()
