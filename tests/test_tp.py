"""Tensor-parallel ML2 equalize == unsharded (SURVEY 2.8 TP row).

The candidate axis of the exact-ML search (the framework's largest
intra-operator dimension, 256QAM 2-layer -> 65536) is sharded over a
mesh axis in parallel/tp.py; results must match rx/equalize.py:ml2
bit-for-bit, including the first-index argmin tie-break.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from python_5gtoolbox_tpu.parallel.tp import tp_ml2
from python_5gtoolbox_tpu.rx import equalize


def _mesh(ntp):
    devs = jax.devices()
    if len(devs) < ntp:
        pytest.skip(f"needs {ntp} devices")
    return Mesh(np.array(devs[:ntp]), ("tp",))


def _rand_problem(n, nr, nl, seed=0):
    rng = np.random.default_rng(seed)
    y = (rng.normal(size=(n, nr)) + 1j * rng.normal(size=(n, nr))
         ).astype(np.complex64)
    h = (rng.normal(size=(n, nr, nl)) + 1j * rng.normal(size=(n, nr, nl))
         ).astype(np.complex64)
    a = (rng.normal(size=(n, nr, nr)) + 1j * rng.normal(size=(n, nr, nr))
         ).astype(np.complex64)
    cov = 0.1 * np.eye(nr, dtype=np.complex64) \
        + 0.05 * (a @ a.conj().swapaxes(-1, -2))
    return jnp.asarray(y), jnp.asarray(h), jnp.asarray(cov)


@pytest.mark.parametrize("modtype,nl", [("16QAM", 2), ("QPSK", 2),
                                        ("64QAM", 1)])
@pytest.mark.parametrize("irc", [False, True])
def test_tp_ml2_matches_unsharded(modtype, nl, irc):
    mesh = _mesh(8)
    y, h, cov = _rand_problem(64, 2, nl, seed=hash((modtype, irc)) % 997)
    ref = equalize.ml2(y, h, cov, modtype, irc=irc, soft=True)
    got = jax.jit(lambda a, b, c: tp_ml2(
        a, b, c, modtype, mesh, irc=irc, soft=True))(y, h, cov)
    for r, g, name in zip(ref, got, ["s_est", "nv", "hard", "llr"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_tp_ml2_hard_path():
    mesh = _mesh(4)
    y, h, cov = _rand_problem(48, 2, 2, seed=7)
    ref = equalize.ml2(y, h, cov, "16QAM", irc=False, soft=False)
    got = tp_ml2(y, h, cov, "16QAM", mesh, irc=False, soft=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_tp_ml2_rejects_indivisible():
    mesh = _mesh(8)
    y, h, cov = _rand_problem(8, 2, 1, seed=1)
    # BPSK 1-layer: C=2 candidates over 8 devices
    with pytest.raises(ValueError, match="not divisible"):
        tp_ml2(y, h, cov, "BPSK", mesh)
