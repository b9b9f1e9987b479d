"""Weak-scaling harness on a virtual device mesh -> SCALING.json.

VERDICT r1 item 4. Real multi-chip hardware is not available in this
environment, so this measures sharding overhead on the 8-virtual-
device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8):
for each parallel axis the framework uses — dp-slots (OFDM+DUC),
dp-codewords (LDPC decode), sp-filter (overlap-save ppermute halos) —
it times the SAME total work unsharded vs sharded over n = 2, 4, 8
virtual devices.

Interpretation: all virtual devices share this host's physical cores,
so a speedup is impossible by construction; efficiency here is
t_unsharded / t_sharded, i.e. the fraction of throughput that SURVIVES
partitioning (collectives, halo exchange, reshards). That overhead
fraction is the quantity that transfers to a real slice where each
shard runs on its own chip; >= 0.95 on the dp axes means the inserted
collectives cost < 5% of compute.

Usage:  python tools/scaling_bench.py        (re-execs itself with the
virtual-mesh env and writes SCALING.json at the repo root)
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
N_DEV = 8


def _reexec():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={N_DEV}")
    env["JAX_PLATFORMS"] = "cpu"
    env["_PY5G_SCALING_CHILD"] = "1"
    return subprocess.call([sys.executable, __file__], env=env, cwd=REPO)


def _time(fn, repeats=5):
    fn()  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    # the session env pins an axon (remote TPU) platform that overrides
    # JAX_PLATFORMS; force the virtual CPU mesh in-code
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(REPO))
    from python_5gtoolbox_tpu.ops import ofdm, filters
    from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode
    from python_5gtoolbox_tpu.parallel import mesh as pmesh, timeshard
    from python_5gtoolbox_tpu.utils import numerology as num

    assert len(jax.devices()) == N_DEV, jax.devices()
    rng = np.random.default_rng(0)
    results = []

    # ---- dp-slots: OFDM + DUC over a slot batch ----
    scs, bw = 30, 20
    prb = num.carrier_prb_size(scs, bw)
    n_slots = 16
    fd = (rng.normal(size=(n_slots, 1, 14, 12 * prb))
          + 1j * rng.normal(size=(n_slots, 1, 14, 12 * prb))
          ).astype(np.complex64)

    def ofdm_step(x):
        td = ofdm.tx_low_phy(x, scs, bw, int(3500e6))
        flat = jnp.swapaxes(td, 0, 1).reshape(td.shape[1], -1)
        return filters.tx_channel_filter(flat, scs, bw, 245.76e6)

    x1 = jnp.asarray(fd)
    f1 = jax.jit(ofdm_step)
    t_base = _time(lambda: f1(x1).block_until_ready())
    for n in (2, 4, 8):
        m = pmesh.make_mesh(n)
        xs = jax.device_put(x1, NamedSharding(m, P("dp")))
        fs_ = jax.jit(ofdm_step)
        t = _time(lambda: fs_(xs).block_until_ready())
        results.append({"axis": "dp-slots", "n_shards": n,
                        "t_unsharded_s": round(t_base, 4),
                        "t_sharded_s": round(t, 4),
                        "efficiency": round(t_base / t, 4)})

    # ---- dp-codewords: LDPC decode batch ----
    # B/8 shards must each carry enough codewords that per-shard launch
    # overhead stays amortized (16/shard at n=8)
    zc, bgn, B = 64, 2, 128
    N = 50 * zc
    llr = jnp.asarray((rng.normal(size=(B, N)) * 4).astype(np.float32))

    def ldpc_step(v):
        return ldpc_decode(v, zc, bgn, 8, "min-sum", 0.8, 0.3,
                           backend="jax")[0]

    g1 = jax.jit(ldpc_step)
    t_base = _time(lambda: g1(llr).block_until_ready())
    for n in (2, 4, 8):
        m = pmesh.make_mesh(n)
        vs = jax.device_put(llr, NamedSharding(m, P("dp")))
        gs = jax.jit(ldpc_step)
        t = _time(lambda: gs(vs).block_until_ready())
        results.append({"axis": "dp-codewords", "n_shards": n,
                        "t_unsharded_s": round(t_base, 4),
                        "t_sharded_s": round(t, 4),
                        "efficiency": round(t_base / t, 4)})

    # ---- sp-filter: overlap-save time sharding (explicit ppermute) ----
    T = 1 << 17
    td = (rng.normal(size=(1, T)) + 1j * rng.normal(size=(1, T))
          ).astype(np.complex64)
    td1 = jnp.asarray(td)
    h1 = jax.jit(lambda v: filters.tx_channel_filter(v, scs, bw, 245.76e6))
    t_base = _time(lambda: h1(td1).block_until_ready())
    for n in (2, 4, 8):
        m = pmesh.make_mesh(n, axis="sp")
        ts = jax.device_put(td1, NamedSharding(m, P(None, "sp")))
        hs = jax.jit(lambda v: timeshard.sharded_tx_channel_filter(
            v, scs, bw, mesh=m, axis="sp"))
        t = _time(lambda: hs(ts).block_until_ready())
        results.append({"axis": "sp-filter", "n_shards": n,
                        "t_unsharded_s": round(t_base, 4),
                        "t_sharded_s": round(t, 4),
                        "efficiency": round(t_base / t, 4)})

    summary = {
        "method": ("equal total work, unsharded vs sharded over n virtual "
                   "CPU devices sharing this host's cores; efficiency = "
                   "t_unsharded / t_sharded = fraction of throughput "
                   "surviving partitioning (collective/halo overhead)"),
        "n_virtual_devices": N_DEV,
        "results": results,
        "min_dp_efficiency": min(r["efficiency"] for r in results
                                 if r["axis"].startswith("dp")),
        "min_sp_efficiency": min(r["efficiency"] for r in results
                                 if r["axis"] == "sp-filter"),
    }
    with open(REPO / "SCALING.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    if os.environ.get("_PY5G_SCALING_CHILD") == "1":
        main()
    else:
        sys.exit(_reexec())
