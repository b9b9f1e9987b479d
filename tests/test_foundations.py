"""Foundation-layer parity tests vs the reference py5gphy (CPU goldens)."""
import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.ops import crc as crc_mod
from python_5gtoolbox_tpu.ops import prbs as prbs_mod
from python_5gtoolbox_tpu.ops import modulation as mod_mod
from python_5gtoolbox_tpu.ops import lowpapr as lp_mod


# ---------------------------------------------------------------------------
# CRC
# ---------------------------------------------------------------------------

CRC_CASES = [
    ("6", 40, 0), ("6", 40, 45678), ("11", 37, 0), ("11", 37, 12345),
    ("16", 123, 0), ("16", 123, 65535), ("24A", 100, 0), ("24A", 3824, 4567),
    ("24B", 64, 0), ("24C", 200, 17), ("24A", 8424, 0), ("24A", 275000, 0),
]


def _gen_crc_goldens():
    from py5gphy.crc import crc as ref_crc
    rng = np.random.default_rng(1234)
    out = {}
    for i, (poly, a, mask) in enumerate(CRC_CASES):
        bits = rng.integers(0, 2, a).astype("i1")
        enc = ref_crc.nr_crc_encode(bits, poly, mask)
        out[f"in_{i}"] = bits
        out[f"out_{i}"] = enc
    return out


@pytest.fixture(scope="module")
def crc_goldens():
    return get_golden("crc_cases", _gen_crc_goldens)


@pytest.mark.parametrize("i", range(len(CRC_CASES)))
def test_crc_np(crc_goldens, i):
    poly, _, mask = CRC_CASES[i]
    got = crc_mod.crc_encode_np(crc_goldens[f"in_{i}"], poly, mask)
    np.testing.assert_array_equal(got, crc_goldens[f"out_{i}"])


@pytest.mark.parametrize("i", range(len(CRC_CASES)))
def test_crc_jax(crc_goldens, i):
    poly, _, mask = CRC_CASES[i]
    got = np.asarray(crc_mod.crc_encode(crc_goldens[f"in_{i}"], poly, mask))
    np.testing.assert_array_equal(got, crc_goldens[f"out_{i}"])


def test_crc_jax_traced_mask(crc_goldens):
    import jax
    import jax.numpy as jnp
    i = 3  # poly 11, mask 12345
    poly, _, mask = CRC_CASES[i]
    fn = jax.jit(lambda b, m: crc_mod.crc_encode(b, poly, m))
    got = np.asarray(fn(crc_goldens[f"in_{i}"], jnp.int32(mask)))
    np.testing.assert_array_equal(got, crc_goldens[f"out_{i}"])


def test_crc_batched_and_check():
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, (5, 300)).astype("i1")
    enc = np.array(crc_mod.crc_encode(bits, "24B"))
    ref = np.stack([crc_mod.crc_encode_np(b, "24B") for b in bits])
    np.testing.assert_array_equal(enc, ref)
    errs = np.asarray(crc_mod.crc_check(enc, "24B"))
    assert not errs.any()
    enc[2, 17] ^= 1
    errs = np.asarray(crc_mod.crc_check(enc, "24B"))
    assert errs.tolist() == [0, 0, 1, 0, 0]


# ---------------------------------------------------------------------------
# PRBS
# ---------------------------------------------------------------------------

PRBS_CASES = [(0, 100), (1, 607), (2**31 - 1, 1600), (12345678, 5000),
              (850, 14 * 12 * 273 * 2)]


def _gen_prbs_goldens():
    from py5gphy.common import nrPRBS
    return {f"seq_{i}": nrPRBS.gen_nrPRBS(c, n)
            for i, (c, n) in enumerate(PRBS_CASES)}


@pytest.fixture(scope="module")
def prbs_goldens():
    return get_golden("prbs_cases", _gen_prbs_goldens)


@pytest.mark.parametrize("i", range(len(PRBS_CASES)))
def test_prbs_np(prbs_goldens, i):
    c, n = PRBS_CASES[i]
    np.testing.assert_array_equal(prbs_mod.gen_prbs_np(c, n),
                                  prbs_goldens[f"seq_{i}"])


@pytest.mark.parametrize("i", range(len(PRBS_CASES)))
def test_prbs_jax(prbs_goldens, i):
    import jax.numpy as jnp
    c, n = PRBS_CASES[i]
    got = np.asarray(prbs_mod.gen_prbs(jnp.int32(c) if c < 2**31 else jnp.uint32(c), n))
    np.testing.assert_array_equal(got, prbs_goldens[f"seq_{i}"])


def test_prbs_offset():
    full = prbs_mod.gen_prbs_np(999, 2000)
    part = prbs_mod.gen_prbs_np(999, 500, offset=700)
    np.testing.assert_array_equal(part, full[700:1200])
    got = np.asarray(prbs_mod.gen_prbs(999, 500, offset=700))
    np.testing.assert_array_equal(got, full[700:1200])


def test_prbs_jax_batched():
    import jax.numpy as jnp
    cinits = np.array([5, 77, 123456], dtype=np.int64)
    got = np.asarray(prbs_mod.gen_prbs(jnp.asarray(cinits, jnp.uint32), 256))
    ref = np.stack([prbs_mod.gen_prbs_np(int(c), 256) for c in cinits])
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# Modulation
# ---------------------------------------------------------------------------

MODTYPES = ["pi/2-bpsk", "bpsk", "qpsk", "16qam", "64qam", "256qam", "1024qam"]


def _gen_mod_goldens():
    from py5gphy.common import nrModulation
    rng = np.random.default_rng(42)
    out = {}
    for i, mt in enumerate(MODTYPES):
        qm = mod_mod.QM_TABLE[mt]
        bits = rng.integers(0, 2, 120 * qm).astype("i1")
        out[f"in_{i}"] = bits
        out[f"out_{i}"] = nrModulation.nrModulate(bits, mt)
    return out


@pytest.fixture(scope="module")
def mod_goldens():
    return get_golden("modulation_cases", _gen_mod_goldens)


@pytest.mark.parametrize("i", range(len(MODTYPES)))
def test_modulate(mod_goldens, i):
    mt = MODTYPES[i]
    got = np.asarray(mod_mod.modulate(mod_goldens[f"in_{i}"], mt))
    np.testing.assert_allclose(got, mod_goldens[f"out_{i}"], atol=1e-6)
    got_np = mod_mod.modulate_np(mod_goldens[f"in_{i}"], mt)
    np.testing.assert_allclose(got_np, mod_goldens[f"out_{i}"], atol=1e-6)


# ---------------------------------------------------------------------------
# Low-PAPR sequences
# ---------------------------------------------------------------------------

LP_CASES = [(0, 0, 0.0, 6), (29, 0, 1.5, 12), (7, 0, 0.7, 18), (13, 0, 0.0, 24),
            (5, 0, 2.1, 30), (11, 1, 0.3, 72), (25, 0, 4.0, 144),
            (17, 1, 0.9, 839 - 839 % 6)]


def _gen_lp_goldens():
    from py5gphy.common import lowPAPR_seq
    return {f"seq_{i}": lowPAPR_seq.gen_lowPAPR_seq(u, v, a, m)
            for i, (u, v, a, m) in enumerate(LP_CASES)}


@pytest.fixture(scope="module")
def lp_goldens():
    return get_golden("lowpapr_cases", _gen_lp_goldens)


@pytest.mark.parametrize("i", range(len(LP_CASES)))
def test_lowpapr(lp_goldens, i):
    u, v, a, m = LP_CASES[i]
    got = lp_mod.lowpapr_seq(u, v, a, m)
    np.testing.assert_allclose(got, lp_goldens[f"seq_{i}"], atol=2e-5)


def test_stage_profiler():
    import time as _t
    from python_5gtoolbox_tpu.utils.profiling import StageProfiler
    prof = StageProfiler()
    with prof.stage("x", items=100, unit="cw"):
        _t.sleep(0.01)
    assert prof.stats["x"].calls == 1
    assert prof.rate("x") > 0
    assert "cw/s" in prof.report()
