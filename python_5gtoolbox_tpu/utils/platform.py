"""Platform selection for host-interleaved pipelines.

The axon TPU plugin (experimental) reliably runs pure-device programs
(the bench/graft paths) but intermittently returns UNIMPLEMENTED when
complex64-containing programs are compiled interleaved with host
transfers, and complex64 device->host transfer is unimplemented
outright (see utils/host.py). Host-interleaved simulation pipelines
(scripts/, golden tests) therefore default to the CPU backend; set
PY5G_FORCE_TPU=1 to opt back into the accelerator.
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
