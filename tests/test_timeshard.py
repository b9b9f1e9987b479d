"""Sharded overlap-save channel filter == unsharded filter, sample-exact.

The time-axis sharding (parallel/timeshard.py) is the framework's
sequence-parallel mechanism; these tests run on the 8-virtual-device CPU
mesh and assert the ppermute halo exchange reproduces the single-device
upfirdn conventions of ops/filters.py (and hence the reference's
py5gphy/nr_lowphy offsets) to float32 exactness.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from python_5gtoolbox_tpu.ops import filters
from python_5gtoolbox_tpu.parallel import timeshard


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:n]), ("sp",))


def test_sharded_tx_filter_matches_unsharded():
    scs, bw = 30, 20  # oversample 245.76/30.72 = 8 -> 3 halfband stages
    rng = np.random.default_rng(0)
    T = 8 * 1024
    td = (rng.normal(size=(2, T)) + 1j * rng.normal(size=(2, T))
          ).astype(np.complex64)
    ref = np.array(filters.tx_channel_filter(jnp.asarray(td), scs, bw))
    with _mesh():
        got = np.array(timeshard.sharded_tx_channel_filter(
            jnp.asarray(td), scs, bw, mesh=_mesh()))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_sharded_rx_filter_matches_unsharded():
    scs, bw = 30, 20
    rng = np.random.default_rng(1)
    T = 8 * 4096  # at 245.76 Msps; /8 decimation
    rx = (rng.normal(size=(2, T)) + 1j * rng.normal(size=(2, T))
          ).astype(np.complex64)
    ref = np.array(filters.rx_channel_filter(jnp.asarray(rx), scs, bw,
                                             245.76e6))
    with _mesh():
        got = np.array(timeshard.sharded_rx_channel_filter(
            jnp.asarray(rx), scs, bw, mesh=_mesh()))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_sharded_tx_filter_jit_composes():
    scs, bw = 30, 100  # oversample 2 -> 1 halfband stage
    rng = np.random.default_rng(2)
    T = 8 * 512
    td = (rng.normal(size=(1, T)) + 1j * rng.normal(size=(1, T))
          ).astype(np.complex64)
    mesh = _mesh()
    with mesh:
        f = jax.jit(lambda x: timeshard.sharded_tx_channel_filter(
            x, scs, bw, mesh=mesh))
        got = np.array(f(jnp.asarray(td)))
    ref = np.array(filters.tx_channel_filter(jnp.asarray(td), scs, bw))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)
