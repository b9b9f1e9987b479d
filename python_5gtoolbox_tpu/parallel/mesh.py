"""Device mesh and sharding helpers.

The reference is single-process NumPy (SURVEY.md section 2.8); this module
provides the TPU-native scaling fabric that replaces it:

  * data parallelism over slots / carriers / SNR points ("dp"),
  * codeword-batch parallelism for LDPC/polar ("dp" too — same axis),
  * sample-axis sharding for the 245.76 Msps channel filter with
    XLA-partitioned convolutions (halo exchanges inserted by SPMD).

Mesh axes: ("dp",) 1-D by default; ("host", "chip") 2-D for multi-host.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, x, axis: str = "dp"):
    """Place x with its leading axis sharded over the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
