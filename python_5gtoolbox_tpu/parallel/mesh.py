"""Device mesh, multi-host init, and sharding helpers.

The reference is single-process NumPy (SURVEY.md section 2.8); this module
provides the TPU-native scaling fabric that replaces it:

  * data parallelism over slots / carriers / SNR points ("dp"),
  * codeword-batch parallelism for LDPC/polar ("dp" too — same axis),
  * sample-axis sharding for the 245.76 Msps channel filter ("sp",
    explicit ppermute halo exchange in parallel/timeshard.py),
  * multi-host: jax.distributed initialization + a (host, chip) 2-D
    mesh whose inner axis rides ICI and outer axis DCN. Sweep-level
    work (carriers / SNR points) shards on "host" so DCN only carries
    the embarrassingly-parallel axis; intra-waveform collectives
    (filter halos, codeword all-gathers) stay on "chip"/ICI.

Mesh axes: ("dp",) 1-D by default; ("host", "chip") 2-D for multi-host.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DIST_INITIALIZED = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Multi-host entry point: initialize jax.distributed once.

    The reference has no distributed story at all (SURVEY.md section
    5.8); this is the framework's. Call it before any device use on
    every host of a multi-host slice. Arguments default to the
    standard JAX environment discovery (JAX_COORDINATOR_ADDRESS /
    cloud-TPU metadata); explicit args take precedence. Returns True
    if a multi-process runtime was initialized, False when running
    single-process (the no-op case: nothing to coordinate).
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return jax.process_count() > 1
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and env_addr is None \
            and num_processes is None:
        # single-process (this machine): jax.distributed would block
        # waiting for a coordinator that never comes
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _DIST_INITIALIZED = True
    return jax.process_count() > 1


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_host_chip_mesh(axes: tuple[str, str] = ("host", "chip")) -> Mesh:
    """2-D (host, chip) mesh over ALL global devices.

    Rows group each process's local devices so the inner axis stays on
    ICI; works identically on a virtual CPU mesh (1 process, n rows of
    1) for testing — pass axes=("host", "chip") and shard sweep work
    on "host", waveform work on "chip".
    """
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_host = len(devs) // n_proc
    grid = np.array(devs).reshape(n_proc, per_host)
    return Mesh(grid, axes)


def make_mesh_2d(rows: int, cols: int,
                 axes: tuple[str, str] = ("dp", "sp"),
                 devices=None) -> Mesh:
    """Arbitrary rows x cols mesh from the (global) device list."""
    devs = list(jax.devices()) if devices is None else list(devices)
    assert rows * cols <= len(devs), (rows, cols, len(devs))
    grid = np.array(devs[:rows * cols]).reshape(rows, cols)
    return Mesh(grid, axes)


def shard_batch(mesh: Mesh, x, axis: str = "dp"):
    """Place x with its leading axis sharded over the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
