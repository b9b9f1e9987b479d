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

Host-interleaved sims therefore still DEFAULT to CPU on this machine:
their per-RE/per-slot shapes recompile per config, and the remote
axon compile latency dominates any device speedup for short sweeps.
Set PY5G_FORCE_TPU=1 to run them on the accelerator (works; useful
for long sweeps that reuse one config shape). The bench/graft paths
always run on the TPU.
"""
from __future__ import annotations

import os


def use_cpu_for_host_pipelines() -> None:
    """Route this process's JAX work to CPU unless PY5G_FORCE_TPU=1.

    Must be called before the first JAX device use.
    """
    if os.environ.get("PY5G_FORCE_TPU") == "1":
        return
    import jax

    jax.config.update("jax_platforms", "cpu")
