"""Test configuration: force an 8-virtual-device CPU mesh for all tests.

Bench and production paths run on real TPU; tests validate numerics and
multi-chip sharding on host CPU so they run anywhere.
"""
import os

# The session environment pins JAX_PLATFORMS=axon (single real TPU chip)
# and something re-appends it even when the env var is overridden, so we
# must force the platform through jax.config. Tests run on a virtual
# 8-device CPU mesh.
_ON_TPU = os.environ.get("PY5G_TEST_ON_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import sys
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
# Disable the persistent compilation cache for CPU test runs: writing
# the large one-dispatch RX executables through the cache serializer
# segfaults XLA-CPU (observed deterministically at
# test_batch_rx_harq's rx_process_batch compile; the crash is inside
# compilation_cache.put_executable_and_time). The cache exists to
# amortize the multi-minute axon TPU compiles (utils/platform.py),
# which tests never do.
os.environ["PY5G_NO_COMPILE_CACHE"] = "1"
try:
    jax.config.update("jax_enable_compilation_cache", False)
except Exception:
    pass
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

REFERENCE = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE.exists()


def import_reference():
    """Make the reference py5gphy importable (golden-vector generation)."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))


# ---------------------------------------------------------------------------
# mmap-count guard: every XLA-CPU compiled executable holds ~6 anonymous
# mappings, and eager-mode host paths compile thousands of unique small
# executables across the suite. Linux vm.max_map_count (65530 default)
# then aborts LLVM with "Cannot allocate memory" mid-compile. Clear the
# JAX executable caches whenever we approach the limit.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_MAPS_FILE = f"/proc/{os.getpid()}/maps"
_MAPS_LIMIT = 45000


def _n_maps() -> int:
    try:
        with open(_MAPS_FILE) as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _jax_map_guard():
    yield
    if _n_maps() > _MAPS_LIMIT:
        jax.clear_caches()


@pytest.fixture(autouse=True, scope="module")
def _fresh_executable_space():
    """Clear JAX executable caches at every test-module boundary.

    XLA-CPU segfaults inside backend_compile_and_load when one of the
    very large one-dispatch RX executables (rx/batch_core.py) is
    compiled into a process already holding many earlier modules'
    executables (reproduced deterministically: test_aclr_evm +
    test_batch_rx then test_batch_rx_harq's rx_process_batch compile;
    each file passes alone). Executables are rarely shared across
    modules (shapes differ), so the only cost is a per-module
    recompile of shared helpers.
    """
    jax.clear_caches()
    yield
