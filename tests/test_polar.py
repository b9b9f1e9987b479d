"""Polar coding-chain parity tests vs the reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.golden import get_golden

from python_5gtoolbox_tpu.ops import polar as P
from python_5gtoolbox_tpu.ops import crc as crc_ops


CONSTRUCT_CASES = [
    (40, 64, 9), (40, 60, 9), (30, 90, 9), (20, 60, 10), (20, 220, 10),
    (33, 150, 10), (56, 864, 9), (140, 300, 9), (25, 100, 10), (64, 128, 10),
]


def _gen_construct_goldens():
    from py5gphy.polar import polar_construct
    out = {}
    for i, (k, e, nmax) in enumerate(CONSTRUCT_CASES):
        F, qPC, N, nPC, nPCwm = polar_construct.construct(k, e, nmax)
        out[f"F_{i}"] = F
        out[f"qPC_{i}"] = np.asarray(qPC, np.int32)
        out[f"meta_{i}"] = np.array([N, nPC, nPCwm])
    return out


@pytest.fixture(scope="module")
def construct_goldens():
    return get_golden("polar_construct", _gen_construct_goldens)


@pytest.mark.parametrize("i", range(len(CONSTRUCT_CASES)))
def test_construct(construct_goldens, i):
    k, e, nmax = CONSTRUCT_CASES[i]
    F, qpc, N, nPC, nPCwm = P.construct(k, e, nmax)
    np.testing.assert_array_equal(F, construct_goldens[f"F_{i}"])
    np.testing.assert_array_equal(np.sort(qpc),
                                  np.sort(construct_goldens[f"qPC_{i}"]))
    np.testing.assert_array_equal(np.array([N, nPC, nPCwm]),
                                  construct_goldens[f"meta_{i}"])


ENC_CASES = [
    # (K, E, nMax, iIL)
    (33, 150, 9, 1), (56, 864, 9, 1), (140, 300, 9, 1),
    (20, 60, 10, 0), (20, 220, 10, 0), (33, 150, 10, 0), (64, 128, 10, 0),
]


def _gen_enc_goldens():
    from py5gphy.polar import nr_polar_encoder
    rng = np.random.default_rng(17)
    out = {}
    for i, (k, e, nmax, iil) in enumerate(ENC_CASES):
        bits = rng.integers(0, 2, k).astype("i1")
        out[f"in_{i}"] = bits
        out[f"out_{i}"] = nr_polar_encoder.encode_polar(bits, e, nmax, iil)
    return out


@pytest.fixture(scope="module")
def enc_goldens():
    return get_golden("polar_encode", _gen_enc_goldens)


@pytest.mark.parametrize("i", range(len(ENC_CASES)))
def test_polar_encode(enc_goldens, i):
    k, e, nmax, iil = ENC_CASES[i]
    got = P.polar_encode_np(enc_goldens[f"in_{i}"], e, nmax, iil)
    np.testing.assert_array_equal(got, enc_goldens[f"out_{i}"])


RM_CASES = [
    # (K, E, nMax, iIL, iBIL)
    (40, 64, 9, 1, 0), (40, 60, 9, 1, 0), (30, 90, 9, 1, 0),
    (20, 60, 10, 0, 1), (20, 220, 10, 0, 1), (33, 150, 10, 0, 1),
    (64, 1000, 10, 0, 1),  # repetition E > N
]


def _gen_rm_goldens():
    from py5gphy.polar import nr_polar_ratematch, nr_polar_raterecover
    from py5gphy.polar import gen_N_value
    rng = np.random.default_rng(19)
    out = {}
    for i, (k, e, nmax, iil, ibil) in enumerate(RM_CASES):
        N, _ = gen_N_value.genNnvalue(k, e, nmax)
        bits = rng.integers(0, 2, N).astype("i1")
        out[f"in_{i}"] = bits
        out[f"out_{i}"] = nr_polar_ratematch.ratematch_polar(bits, k, e, ibil)
        llr = rng.normal(size=e)
        out[f"llr_{i}"] = llr
        out[f"rec_{i}"] = nr_polar_raterecover.ratemrecover_polar(
            llr, k, N, ibil)
    return out


@pytest.fixture(scope="module")
def rm_goldens():
    return get_golden("polar_ratematch", _gen_rm_goldens)


@pytest.mark.parametrize("i", range(len(RM_CASES)))
def test_polar_ratematch(rm_goldens, i):
    k, e, nmax, iil, ibil = RM_CASES[i]
    dn = rm_goldens[f"in_{i}"]
    got = np.asarray(P.polar_ratematch(jnp.asarray(dn[None]), k, e, ibil))[0]
    np.testing.assert_array_equal(got, rm_goldens[f"out_{i}"])


@pytest.mark.parametrize("i", range(len(RM_CASES)))
def test_polar_raterecover(rm_goldens, i):
    k, e, nmax, iil, ibil = RM_CASES[i]
    N = rm_goldens[f"in_{i}"].size
    got = np.asarray(P.polar_raterecover(
        jnp.asarray(rm_goldens[f"llr_{i}"][None]), k, N, ibil,
        reference_compat=True))[0]
    np.testing.assert_allclose(got, rm_goldens[f"rec_{i}"], rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# SCL decoder: noiseless + noisy round trips through the full chain
# ---------------------------------------------------------------------------

DEC_CASES = [
    # (A payload, E, nMax, iIL, crc_len, pad_crc, rnti, L)
    (32, 120, 10, 0, 11, 0, 0, 8),     # UL UCI-style
    (12, 60, 10, 0, 6, 0, 0, 8),       # UL small
    (32, 150, 9, 1, 24, 0, 0, 8),      # DL BCH-style
    (40, 200, 9, 1, 24, 1, 4567, 8),   # DL DCI-style with RNTI mask
]


def _chain_tx(rng, A, E, nmax, iil, crc_len, pad_crc, rnti):
    poly = {6: "6", 11: "11", 24: "24C"}[crc_len]
    payload = rng.integers(0, 2, A).astype("i1")
    if pad_crc:
        padded = np.concatenate([np.ones(24, "i1"), payload])
        ck = crc_ops.crc_encode_np(padded, poly, rnti)[24:]
    else:
        ck = crc_ops.crc_encode_np(payload, poly, rnti if pad_crc else 0)
    K = ck.size
    enc = P.polar_encode_np(ck, E, nmax, iil)
    ibil = 1 if nmax == 10 else 0
    fe = np.asarray(P.polar_ratematch(jnp.asarray(enc[None]), K, E, ibil))[0]
    return payload, ck, fe, K, ibil


@pytest.mark.parametrize("i", range(len(DEC_CASES)))
def test_scl_roundtrip_noiseless(i):
    A, E, nmax, iil, crc_len, pad_crc, rnti, L = DEC_CASES[i]
    rng = np.random.default_rng(100 + i)
    payload, ck, fe, K, ibil = _chain_tx(rng, A, E, nmax, iil, crc_len,
                                         pad_crc, rnti)
    llr_e = 8.0 * (1 - 2.0 * fe)
    N = 0
    from python_5gtoolbox_tpu.ops.polar.construct import gen_n_value
    N, _ = gen_n_value(K, E, nmax)
    llr_n = P.polar_raterecover(jnp.asarray(llr_e[None], jnp.float32), K, N,
                                ibil)
    ck_hat, ok = P.polar_decode_scl(llr_n, E, K, L, nmax, iil, crc_len,
                                    pad_crc, rnti)
    assert bool(np.asarray(ok)[0])
    np.testing.assert_array_equal(np.asarray(ck_hat)[0], ck)


@pytest.mark.parametrize("i", range(len(DEC_CASES)))
def test_scl_roundtrip_noisy(i):
    """Moderate SNR: all codewords must decode (BLER ~0 regime)."""
    A, E, nmax, iil, crc_len, pad_crc, rnti, L = DEC_CASES[i]
    rng = np.random.default_rng(200 + i)
    from python_5gtoolbox_tpu.ops.polar.construct import gen_n_value
    nwords = 4
    llrs, cks = [], []
    for w in range(nwords):
        payload, ck, fe, K, ibil = _chain_tx(rng, A, E, nmax, iil, crc_len,
                                             pad_crc, rnti)
        snr_db = 5.0
        sigma = 10 ** (-snr_db / 20)
        rx = (1 - 2.0 * fe) + rng.normal(size=fe.size) * sigma
        llr_e = 2 * rx / sigma ** 2
        N, _ = gen_n_value(K, E, nmax)
        llrs.append(np.asarray(P.polar_raterecover(
            jnp.asarray(llr_e[None], jnp.float32), K, N, ibil))[0])
        cks.append(ck)
    ck_hat, ok = P.polar_decode_scl(jnp.asarray(np.stack(llrs)), E, K, L,
                                    nmax, iil, crc_len, pad_crc, rnti)
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(ck_hat), np.stack(cks))


def test_sc_decoder():
    """L=1 plain SC on an easy case."""
    rng = np.random.default_rng(7)
    A, E, nmax, iil, crc_len = 32, 256, 10, 0, 11
    payload, ck, fe, K, ibil = _chain_tx(rng, A, E, nmax, iil, crc_len, 0, 0)
    from python_5gtoolbox_tpu.ops.polar.construct import gen_n_value
    N, _ = gen_n_value(K, E, nmax)
    llr_n = P.polar_raterecover(
        jnp.asarray(8.0 * (1 - 2.0 * fe)[None], jnp.float32), K, N, ibil)
    ck_hat, ok = P.polar_decode_scl(llr_n, E, K, 1, nmax, iil, crc_len, 0, 0)
    assert bool(np.asarray(ok)[0])
    np.testing.assert_array_equal(np.asarray(ck_hat)[0], ck)


@pytest.mark.parametrize("K,E,nmax,iil,clen,pad,rnti,L", [
    (75, 128, 10, 0, 11, 0, 0, 8),    # UL CA-SCL
    (56, 150, 9, 1, 24, 0, 0, 8),     # DL BCH-style (distributed CRC)
    (64, 200, 9, 1, 24, 1, 4567, 4),  # DCI with RNTI mask
    (22, 80, 10, 0, 6, 0, 0, 8),      # PC bits (K in 18..25)
])
@pytest.mark.parametrize("impl", ["scan", "chunked"])
def test_scl_impls_match_unrolled(impl, K, E, nmax, iil, clen, pad, rnti,
                                  L):
    """Every fast SCL impl == the unrolled decoder, bit-exact.

    'scan' is the O(1)-compile uniform-leaf-body impl (VERDICT r1 item
    5); 'chunked' is the high-throughput impl auto-selected for
    N >= 512 (VERDICT r2 item 1: one-hot MXU matmul path permutes,
    per-chunk lazy permutation of the O(N) state)."""
    from python_5gtoolbox_tpu.ops.polar.construct import gen_n_value
    rng = np.random.default_rng(K + E)
    N, _ = gen_n_value(K, E, nmax)
    llr = (rng.normal(size=(6, N)) * 2).astype(np.float32)
    a, oka = P.polar_decode_scl(jnp.asarray(llr), E, K, L, nmax, iil,
                                clen, pad, rnti, impl="unrolled")
    b, okb = P.polar_decode_scl(jnp.asarray(llr), E, K, L, nmax, iil,
                                clen, pad, rnti, impl=impl)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(oka), np.asarray(okb))


def test_scl_chunked_matches_scan_n1024():
    """chunked == scan at N=1024 (PUSCH UCI scale, nMax=10).

    The unrolled decoder takes ~8 min to compile at N=1024, so the
    identity anchor here is the scan impl (itself unrolled-verified at
    N <= 512 by test_scl_impls_match_unrolled)."""
    from python_5gtoolbox_tpu.ops.polar.construct import gen_n_value
    K, E, nmax, iil, clen, L = 300, 1024, 10, 0, 11, 8
    rng = np.random.default_rng(99)
    N, _ = gen_n_value(K, E, nmax)
    assert N == 1024
    llr = (rng.normal(size=(4, N)) * 2).astype(np.float32)
    a, oka = P.polar_decode_scl(jnp.asarray(llr), E, K, L, nmax, iil,
                                clen, 0, 0, impl="scan")
    b, okb = P.polar_decode_scl(jnp.asarray(llr), E, K, L, nmax, iil,
                                clen, 0, 0, impl="chunked")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(oka), np.asarray(okb))


def _scl_bler_at(rng, K, E, B, snr_db, list_size):
    """Full UL CA-polar chain (CRC11, nMax=10, iBIL=1) BLER at one SNR.

    Stimulus matches the reference's self-test harness
    (py5gphy/polar/nr_polar_decoder.py:46 for_test_5g_polar_encoder):
    BPSK 1-2b, AWGN sigma = 10^(-snr/20), LLR = 2x/sigma^2. NOTE the
    sim's "K" is the payload length BEFORE CRC (randint(2, size=K)),
    so the decoder K here is A + 11.
    """
    from python_5gtoolbox_tpu.ops.polar.construct import gen_n_value

    A = K - 11
    payload = rng.integers(0, 2, size=(B, A)).astype(np.int8)
    ck = np.stack([crc_ops.crc_encode_np(row, "11") for row in payload])
    enc = np.stack([P.polar_encode_np(row, E, 10, 0) for row in ck])
    fe = np.asarray(P.polar_ratematch(jnp.asarray(enc), K, E, 1))
    sigma = 10 ** (-snr_db / 20)
    rx = (1 - 2.0 * fe) + rng.normal(size=fe.shape) * sigma
    llr_e = (2.0 * rx / sigma ** 2).astype(np.float32)
    N, _ = gen_n_value(K, E, 10)
    llr_n = P.polar_raterecover(jnp.asarray(llr_e), K, N, 1)
    ck_hat, ok = P.polar_decode_scl(llr_n, E, K, list_size, 10, 0, 11, 0, 0)
    err = np.any(np.asarray(ck_hat) != ck, axis=1) | ~np.asarray(ok)
    return float(np.mean(err))


def test_bler_baseline_scl8_scl32():
    """Statistical anchor vs SURVEY.md section 6 polar BLER baselines.

    Reference out/polar_decode_result_all.pickle, payload 64 (decoder
    K = 64 + CRC11 = 75), N=E=128, UL (nMax=10, iIL=0, iBIL=1); the
    published SNR grid is arange(0.5, 4, 0.5), so index 3 = 2.0 dB:
    SCL L=8 -> BLER 0.105 @ 2.0 dB; SCL L=32 -> 0.040 @ 2.0 dB.
    Bands are the published value +/- ~4 binomial sigma at B=400 plus
    calibration slack.
    """
    rng = np.random.default_rng(7)
    K, E, B, snr_db = 75, 128, 400, 2.0
    bler8 = _scl_bler_at(rng, K, E, B, snr_db, 8)
    bler32 = _scl_bler_at(np.random.default_rng(8), K, E, B, snr_db, 32)
    assert 0.04 <= bler8 <= 0.19, bler8
    assert 0.004 <= bler32 <= 0.10, bler32
    assert bler32 <= bler8, (bler8, bler32)
