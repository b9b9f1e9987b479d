"""Platform selection for host-interleaved pipelines.

The axon TPU plugin (experimental) cannot move complex buffers across
the host<->device boundary, and a complex h2d poisons the process's
device channel (utils/host.py). As of round 2 every pipeline boundary
is planar (float32 pairs fused/split on device) and every eager
complex-literal site is lax.complex-based, so the full simulation
stack RUNS on the TPU with PY5G_FORCE_TPU=1 — measured PDSCH
throughput-sim step (scs30/BW20, 2x2 AWGN, MMSE-IRC, 2 slots):
~1.1 s steady-state on chip, but ~14 min of axon executable compiles
on first use of each config shape.

Host-interleaved sims DEFAULT to CPU on this machine — by MEASUREMENT,
not compile cost (round 3, out/tpu_vs_cpu_sim.json): with the
persistent compile cache warm, a 20-slot PDSCH sweep runs 5.4 s on the
chip vs 1.9 s on the 2-vCPU host, and the heavier PUSCH _2_11 loop
5.4 s vs 3.4 s. Decode outcomes are identical on both platforms. The
chip loses because per-slot interleaved RX issues hundreds of small
dispatches (~0.65-3 ms each over the axon tunnel) and the numpy
channel-estimation stage forces per-slot host<->device transfers;
flipping the default needs slot-batched RX dispatch, not just cached
compiles. Set PY5G_FORCE_TPU=1 to run sims on the accelerator anyway.
The batched pure-device paths (bench, graft entry) always use the TPU
and win big there.
"""
from __future__ import annotations

import os
import pathlib


def enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at <repo>/.jax_cache.

    On axon this is what makes TPU sims viable: each config shape's
    multi-minute executable compile is paid once EVER instead of once
    per process. CPU runs benefit too (the test suite compiles
    thousands of small executables).
    """
    import jax

    path = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    path.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # older jax: cache simply stays off


def use_cpu_for_host_pipelines() -> None:
    """Route this process's JAX work to CPU unless PY5G_FORCE_TPU=1.

    Must be called before the first JAX device use. Always enables the
    persistent compile cache (see enable_persistent_compile_cache).
    """
    enable_persistent_compile_cache()
    if os.environ.get("PY5G_FORCE_TPU") == "1":
        return
    import jax

    jax.config.update("jax_platforms", "cpu")
