"""Pallas LDPC min-sum kernel == pure-XLA decoder, bit-exactly.

The kernel (ops/ldpc/pallas_decode.py) must reproduce the reference
min-sum family semantics (py5gphy/ldpc/nr_ldpc_decode.py) that the
pure-JAX decoder already matches: same hard bits, same per-codeword
convergence flags, including the early-exit freeze and the final
hard-decision rule. Runs in interpreter mode on the CPU test mesh.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops.ldpc.encode import ldpc_encode
from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode
from python_5gtoolbox_tpu.ops.ldpc.pallas_decode import (
    batch_tile, ldpc_decode_pallas)


@pytest.mark.parametrize("zc,bgn,alpha,beta", [
    (16, 2, 0.8, 0.3),   # mixed-MS (reference's best variant)
    (10, 1, 1.0, 0.0),   # plain min-sum
    (52, 2, 0.75, 0.0),  # NMS, non-power-of-2 lifting
])
def test_pallas_matches_xla_on_noisy_codewords(zc, bgn, alpha, beta):
    rng = np.random.default_rng(zc * bgn)
    K = (22 if bgn == 1 else 10) * zc
    bits = rng.integers(0, 2, size=(12, K)).astype(np.int8)
    dn = np.array(ldpc_encode(jnp.asarray(bits), bgn))
    sigma2 = 10 ** (-3.0 / 10)
    llr = ((2 / sigma2) * (1 - 2.0 * dn
                           + rng.normal(size=dn.shape) * np.sqrt(sigma2))
           ).astype(np.float32)
    b1, ok1, f1 = ldpc_decode(jnp.asarray(llr), zc, bgn, 8, "min-sum",
                              alpha, beta, backend="jax")
    b2, ok2, f2 = ldpc_decode_pallas(jnp.asarray(llr), zc, bgn, 8,
                                     alpha, beta, interpret=True)
    assert np.array_equal(np.array(f1), np.array(f2))
    assert np.array_equal(np.array(ok1), np.array(ok2))
    # at 3 dB with mixed-MS most codewords converge; sanity that the
    # early-exit path is actually exercised
    ok = np.array(ok1)
    assert np.array_equal(np.array(b1)[ok], bits[ok])


def test_pallas_nonconverged_parity():
    rng = np.random.default_rng(7)
    zc, bgn = 16, 1
    N = 66 * zc
    llr = (2.0 * rng.normal(size=(9, N))).astype(np.float32)  # garbage
    _, ok1, f1 = ldpc_decode(jnp.asarray(llr), zc, bgn, 6, "min-sum",
                             1.0, 0.0, backend="jax")
    _, ok2, f2 = ldpc_decode_pallas(jnp.asarray(llr), zc, bgn, 6,
                                    1.0, 0.0, interpret=True)
    assert np.array_equal(np.array(f1), np.array(f2))
    assert np.array_equal(np.array(ok1), np.array(ok2))


def test_pallas_layered_matches_xla():
    """Layered-schedule kernel == layered pure-XLA decoder, bit-exactly."""
    rng = np.random.default_rng(21)
    zc, bgn, alpha, beta = 16, 2, 0.8, 0.3
    K = 10 * zc
    bits = rng.integers(0, 2, size=(10, K)).astype(np.int8)
    dn = np.array(ldpc_encode(jnp.asarray(bits), bgn))
    sigma2 = 10 ** (-1.0 / 10)  # low SNR: mix of converged/unconverged
    llr = ((2 / sigma2) * (1 - 2.0 * dn
                           + rng.normal(size=dn.shape) * np.sqrt(sigma2))
           ).astype(np.float32)
    b1, ok1, f1 = ldpc_decode(jnp.asarray(llr), zc, bgn, 6, "min-sum",
                              alpha, beta, backend="jax",
                              schedule="layered")
    b2, ok2, f2 = ldpc_decode_pallas(jnp.asarray(llr), zc, bgn, 6,
                                     alpha, beta, schedule="layered",
                                     interpret=True)
    assert np.array_equal(np.array(f1), np.array(f2))
    assert np.array_equal(np.array(ok1), np.array(ok2))


def test_batch_tile_vmem_budget():
    for zc in (2, 52, 128, 240, 384):
        for bgn in (1, 2):
            bt = batch_tile(zc, bgn)
            assert bt >= 8 and bt % 8 == 0


def test_pallas_fast_semantics_decodes():
    """Opt-in relaxed check node (semantics="fast", VERDICT r4 item 5):
    not bit-identical to the reference, but it must decode clean-ish
    codewords and agree with exact semantics on the easy ensemble."""
    zc, bgn = 16, 2
    rng = np.random.default_rng(5)
    K = 10 * zc
    bits = rng.integers(0, 2, size=(12, K)).astype(np.int8)
    dn = np.array(ldpc_encode(jnp.asarray(bits), bgn))
    sigma2 = 10 ** (-3.5 / 10)
    llr = ((2 / sigma2) * (1 - 2.0 * dn
                           + rng.normal(size=dn.shape) * np.sqrt(sigma2))
           ).astype(np.float32)
    bf, okf, _ = ldpc_decode_pallas(jnp.asarray(llr), zc, bgn, 8,
                                    0.8, 0.3, interpret=True,
                                    semantics="fast")
    okf = np.asarray(okf)
    assert okf.mean() >= 0.9            # decodes at 3.5 dB
    assert np.array_equal(np.asarray(bf)[okf], bits[okf])
    # default stays exact: the bit-pinned tests above guard it, and the
    # jax backend refuses the option
    with pytest.raises(ValueError):
        ldpc_decode(jnp.asarray(llr), zc, bgn, 8, "min-sum",
                    backend="jax", semantics="fast")
