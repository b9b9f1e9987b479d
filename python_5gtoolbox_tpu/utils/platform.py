"""Platform selection for simulation pipelines.

Two pipeline profiles, chosen by MEASUREMENT (out/tpu_vs_cpu_sim.json):

* "sweep" — the slot-batched link-level sims and decoder BLER sweeps.
  Since round 4 the whole RX (LS est -> jitted DFT/DCT CE -> equalize
  -> decode, rx/ce_jax.py + rx_process_batch) runs as ONE device
  dispatch per sweep and the waveform/channel/Rx-low-PHY chain stays
  device-resident, so the accelerator WINS: warm 20-slot PDSCH sweep
  0.29 s on the chip vs 1.29 s on the 2-vCPU host; PUSCH _2_11
  10-trial loop 0.33 s vs 2.32 s (identical decode outcomes). Sweeps
  therefore DEFAULT TO THE ACCELERATOR; PY5G_FORCE_CPU=1 restores CPU
  routing. First-touch axon compiles (~40 s per config with the
  persistent cache cold) are paid once ever.

* "latency" — per-slot interleaved paths (single-waveform generation,
  per-slot RX_process with the NumPy CE, HARQ chains). These issue
  many small dispatches whose ~0.1-0.5 s axon tunnel round trips
  dominate, so they default to CPU; PY5G_FORCE_TPU=1 opts in to the
  chip (everything still runs there — round-2/3 made every boundary
  planar because a complex transfer poisons the axon device channel,
  utils/host.py).
"""
from __future__ import annotations

import os
import pathlib


def enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at <repo>/.jax_cache.

    On axon this is what makes TPU sims viable: each config shape's
    multi-minute executable compile is paid once EVER instead of once
    per process. CPU test runs must NOT use it (PY5G_NO_COMPILE_CACHE
    gate below): XLA-CPU segfaults serializing the largest
    executables.
    """
    import jax

    if os.environ.get("PY5G_NO_COMPILE_CACHE") == "1":
        # test runs disable the cache: XLA-CPU segfaults serializing
        # the large batched-RX executables (tests/conftest.py)
        return

    path = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    path.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass  # older jax: cache simply stays off


def select_platform(profile: str = "sweep") -> None:
    """Pick the process's JAX platform for a pipeline profile.

    profile="sweep": batched sweeps — stay on the accelerator (the
    measured winner; see module docstring) unless PY5G_FORCE_CPU=1.
    profile="latency": per-slot interleaved paths — CPU unless
    PY5G_FORCE_TPU=1.
    Must be called before the first JAX device use; always enables the
    persistent compile cache.
    """
    assert profile in ("sweep", "latency"), profile
    enable_persistent_compile_cache()
    import jax

    if profile == "sweep":
        if os.environ.get("PY5G_FORCE_CPU") == "1":
            jax.config.update("jax_platforms", "cpu")
        return
    if os.environ.get("PY5G_FORCE_TPU") == "1":
        return
    jax.config.update("jax_platforms", "cpu")


def use_cpu_for_host_pipelines() -> None:
    """Back-compat alias: the per-slot "latency" profile routing."""
    select_platform("latency")
