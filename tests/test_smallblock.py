"""Small-block code parity tests vs the reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.golden import get_golden
from python_5gtoolbox_tpu.ops import smallblock as SB


SB_CASES = [(1, 1), (1, 4), (2, 2), (2, 8), (3, 2), (5, 2), (7, 2),
            (11, 2), (11, 8)]


def _gen_sb_goldens():
    from py5gphy.smallblock import nr_smallblock_encoder, nr_smallblock_ratematch
    rng = np.random.default_rng(55)
    out = {}
    for i, (k, qm) in enumerate(SB_CASES):
        bits = rng.integers(0, 2, k).astype("i1")
        dn = nr_smallblock_encoder.encode_smallblock(bits, qm)
        out[f"in_{i}"], out[f"dn_{i}"] = bits, dn
        out[f"rm_{i}"] = nr_smallblock_ratematch.ratematch_smallblock(
            np.where(dn < 0, 0, dn).astype("i1"), dn.size * 2 + 3)
    return out


@pytest.fixture(scope="module")
def sb_goldens():
    return get_golden("smallblock_cases", _gen_sb_goldens)


@pytest.mark.parametrize("i", range(len(SB_CASES)))
def test_sb_encode(sb_goldens, i):
    k, qm = SB_CASES[i]
    got = SB.encode_smallblock_np(sb_goldens[f"in_{i}"], qm)
    np.testing.assert_array_equal(got, sb_goldens[f"dn_{i}"])
    if k >= 3:
        batched = np.asarray(
            SB.encode_smallblock(jnp.asarray(sb_goldens[f"in_{i}"][None]), qm))
        np.testing.assert_array_equal(batched[0], sb_goldens[f"dn_{i}"])


@pytest.mark.parametrize("i", range(len(SB_CASES)))
def test_sb_ratematch(sb_goldens, i):
    dn = np.where(sb_goldens[f"dn_{i}"] < 0, 0,
                  sb_goldens[f"dn_{i}"]).astype("i1")
    E = dn.size * 2 + 3
    got = np.asarray(SB.ratematch_smallblock(jnp.asarray(dn[None]), E))[0]
    np.testing.assert_array_equal(got, sb_goldens[f"rm_{i}"])


def test_sb_decode_roundtrip():
    rng = np.random.default_rng(66)
    for k in range(3, 12):
        bits = rng.integers(0, 2, (6, k)).astype("i1")
        dn = SB.encode_smallblock(jnp.asarray(bits))
        llr = (1.0 - 2.0 * np.asarray(dn)) * 4.0
        llr = llr + rng.normal(size=llr.shape) * 0.5
        dec = np.asarray(SB.decode_smallblock(jnp.asarray(llr), k))
        np.testing.assert_array_equal(dec, bits)


def test_sb_raterecover():
    rng = np.random.default_rng(67)
    llr = rng.normal(size=(2, 77))
    rec = np.asarray(SB.raterecover_smallblock(jnp.asarray(llr), 32))
    ref = np.zeros((2, 32))
    for b in range(2):
        for i in range(77):
            ref[b, i % 32] += llr[b, i]
    np.testing.assert_allclose(rec, ref, rtol=1e-5)
