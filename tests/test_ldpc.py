"""LDPC coding-chain parity tests vs the reference (goldens on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.golden import get_golden

from python_5gtoolbox_tpu.ops import ldpc as L


# ---------------------------------------------------------------------------
# Segmentation / parameters
# ---------------------------------------------------------------------------

SEG_CASES = [(100, 2), (3840, 2), (7000, 2), (8448, 1), (16000, 1),
             (20004, 1), (960, 2), (269280, 1)]


def _gen_seg_goldens():
    from py5gphy.ldpc import ldpc_info
    out = {}
    for i, (b, bgn) in enumerate(SEG_CASES):
        C, cbz, Lc, F, K, Zc = ldpc_info.get_cbs_info(b, bgn)
        out[f"info_{i}"] = np.array([C, cbz, Lc, F, K, Zc])
    return out


@pytest.fixture(scope="module")
def seg_goldens():
    return get_golden("ldpc_seg", _gen_seg_goldens)


@pytest.mark.parametrize("i", range(len(SEG_CASES)))
def test_cbs_info(seg_goldens, i):
    b, bgn = SEG_CASES[i]
    info = L.get_cbs_info(b, bgn)
    got = np.array([info.C, info.cbz, info.L, info.F, info.K, info.Zc])
    np.testing.assert_array_equal(got, seg_goldens[f"info_{i}"])


def _gen_cbseg_goldens():
    from py5gphy.ldpc import nr_ldpc_cbsegment
    rng = np.random.default_rng(3)
    out = {}
    for i, (b, bgn) in enumerate(SEG_CASES[:6]):
        bits = rng.integers(0, 2, b).astype("i1")
        cbs, zc = nr_ldpc_cbsegment.ldpc_cbsegment(bits, bgn)
        out[f"in_{i}"], out[f"cbs_{i}"] = bits, cbs
        out[f"zc_{i}"] = np.array([zc])
    return out


@pytest.fixture(scope="module")
def cbseg_goldens():
    return get_golden("ldpc_cbseg", _gen_cbseg_goldens)


@pytest.mark.parametrize("i", range(6))
def test_cb_segment(cbseg_goldens, i):
    _, bgn = SEG_CASES[i]
    cbs, zc = L.cb_segment_np(cbseg_goldens[f"in_{i}"], bgn)
    np.testing.assert_array_equal(cbs, cbseg_goldens[f"cbs_{i}"])
    assert zc == cbseg_goldens[f"zc_{i}"][0]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

ENC_CASES = [(2, 1), (2, 2), (13, 1), (52, 2), (96, 1), (208, 2), (384, 1),
             (384, 2), (144, 2), (56, 1)]


def _gen_enc_goldens():
    from py5gphy.ldpc import nr_ldpc_encode
    rng = np.random.default_rng(5)
    out = {}
    for i, (zc, bgn) in enumerate(ENC_CASES):
        K = (22 if bgn == 1 else 10) * zc
        ck = rng.integers(0, 2, K).astype("i1")
        nfiller = zc // 2
        if nfiller:
            ck[K - nfiller:] = -1
        out[f"in_{i}"] = ck.copy()
        out[f"dn_{i}"] = nr_ldpc_encode.encode_ldpc(ck.copy(), bgn)
    return out


@pytest.fixture(scope="module")
def enc_goldens():
    return get_golden("ldpc_encode", _gen_enc_goldens)


@pytest.mark.parametrize("i", range(len(ENC_CASES)))
def test_ldpc_encode(enc_goldens, i):
    _, bgn = ENC_CASES[i]
    dn = L.ldpc_encode_np(enc_goldens[f"in_{i}"], bgn)
    np.testing.assert_array_equal(dn, enc_goldens[f"dn_{i}"])


def test_ldpc_encode_batched():
    rng = np.random.default_rng(6)
    zc, bgn = 64, 1
    K = 22 * zc
    cks = rng.integers(0, 2, (4, K)).astype("i1")
    batched = np.asarray(L.ldpc_encode(jnp.asarray(cks), bgn))
    for i in range(4):
        single = np.asarray(L.ldpc_encode(jnp.asarray(cks[i:i + 1]), bgn))[0]
        np.testing.assert_array_equal(batched[i], single)


# ---------------------------------------------------------------------------
# Rate match / recover
# ---------------------------------------------------------------------------

RM_CASES = [
    # (zc, bgn, E, rv, Qm, nfiller)
    (24, 2, 1000, 0, 2, 10), (24, 2, 1500, 2, 4, 10), (64, 1, 3000, 1, 6, 30),
    (64, 1, 9000, 3, 8, 0), (13, 2, 2000, 0, 2, 5), (52, 1, 3456, 2, 2, 0),
]


def _gen_rm_goldens():
    from py5gphy.ldpc import nr_ldpc_ratematch, nr_ldpc_raterecover
    rng = np.random.default_rng(11)
    out = {}
    for i, (zc, bgn, E, rv, qm, nfiller) in enumerate(RM_CASES):
        K = (22 if bgn == 1 else 10) * zc
        N = (66 if bgn == 1 else 50) * zc
        dn = rng.integers(0, 2, N).astype("i1")
        kd = K - nfiller
        # dn filler span = [kd-2Zc, K-2Zc)
        if nfiller:
            dn[kd - 2 * zc: K - 2 * zc] = -1
        ncb = N
        k0 = nr_ldpc_ratematch.get_k0(ncb, bgn, rv, zc)
        fe = nr_ldpc_ratematch.ratematch_ldpc(dn.copy(), ncb, E, k0, qm)
        out[f"dn_{i}"], out[f"fe_{i}"] = dn, fe
        # LLR recover golden
        llr = rng.normal(size=E).astype(np.float64)
        out[f"llr_{i}"] = llr
        out[f"rec_{i}"] = nr_ldpc_raterecover.raterecover_ldpc(
            llr, ncb, N, k0, qm, zc, kd, K)
    return out


@pytest.fixture(scope="module")
def rm_goldens():
    return get_golden("ldpc_ratematch", _gen_rm_goldens)


def _info_for(zc, bgn, nfiller):
    K = (22 if bgn == 1 else 10) * zc
    return L.CBInfo(C=1, cbz=K - nfiller - 24, L=24, F=nfiller, K=K, Zc=zc,
                    bgn=bgn)


@pytest.mark.parametrize("i", range(len(RM_CASES)))
def test_ratematch(rm_goldens, i):
    zc, bgn, E, rv, qm, nfiller = RM_CASES[i]
    info = _info_for(zc, bgn, nfiller)
    dn = np.where(rm_goldens[f"dn_{i}"] == -1, 0, rm_goldens[f"dn_{i}"])
    fe = np.asarray(L.ldpc_ratematch(jnp.asarray(dn[None]), info, E, rv, qm))[0]
    np.testing.assert_array_equal(fe, rm_goldens[f"fe_{i}"])


@pytest.mark.parametrize("i", range(len(RM_CASES)))
def test_raterecover(rm_goldens, i):
    zc, bgn, E, rv, qm, nfiller = RM_CASES[i]
    info = _info_for(zc, bgn, nfiller)
    llr = rm_goldens[f"llr_{i}"]
    rec = np.asarray(L.ldpc_raterecover(
        jnp.asarray(llr[None]), info, rv, qm))[0]
    np.testing.assert_allclose(rec, rm_goldens[f"rec_{i}"], rtol=1e-5,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Decoder: bit parity vs reference on identical LLRs + round-trip BLER sanity
# ---------------------------------------------------------------------------

DEC_CASES = [
    # (zc, bgn, snr_db, algo, alpha, beta, n_iter)
    (10, 1, 1.0, "min-sum", 1.0, 0.0, 16),
    (10, 1, 1.0, "min-sum", 0.8, 0.3, 16),
    (16, 2, 2.0, "min-sum", 0.8, 0.0, 12),
    (10, 1, 2.0, "BP", 1.0, 0.0, 12),
]
_N_DEC = 8  # codewords per case


def _gen_dec_goldens():
    from py5gphy.ldpc import nr_ldpc_decode
    rng = np.random.default_rng(21)
    out = {}
    for i, (zc, bgn, snr, algo, alpha, beta, niter) in enumerate(DEC_CASES):
        K = (22 if bgn == 1 else 10) * zc
        N = (66 if bgn == 1 else 50) * zc
        llrs = np.zeros((_N_DEC, N))
        bits = np.zeros((_N_DEC, K), "i1")
        oks = np.zeros(_N_DEC, "i1")
        for b in range(_N_DEC):
            from py5gphy.ldpc import nr_ldpc_encode
            ck = rng.integers(0, 2, K).astype("i1")
            dn = nr_ldpc_encode.encode_ldpc(ck.copy(), bgn)
            sigma = 10 ** (-snr / 20)
            noise = rng.normal(size=N) * sigma
            rx = (1 - 2.0 * dn) + noise
            llr = 2 * rx / (sigma ** 2)
            dec, _, ok = nr_ldpc_decode.nr_decode_ldpc(
                llr.copy(), zc, bgn, niter, algo, alpha, beta)
            llrs[b], bits[b], oks[b] = llr, dec[:K], ok
        out[f"llr_{i}"], out[f"bits_{i}"], out[f"ok_{i}"] = llrs, bits, oks
    return out


@pytest.fixture(scope="module")
def dec_goldens():
    return get_golden("ldpc_decode", _gen_dec_goldens)


@pytest.mark.parametrize("i", range(len(DEC_CASES)))
def test_ldpc_decode_parity(dec_goldens, i):
    zc, bgn, snr, algo, alpha, beta, niter = DEC_CASES[i]
    llrs = jnp.asarray(dec_goldens[f"llr_{i}"], jnp.float32)
    bits, ok, _ = L.ldpc_decode(llrs, zc, bgn, niter, algo, alpha, beta)
    np.testing.assert_array_equal(np.asarray(ok).astype("i1"),
                                  dec_goldens[f"ok_{i}"])
    np.testing.assert_array_equal(np.asarray(bits), dec_goldens[f"bits_{i}"])


def test_ldpc_roundtrip_noiseless():
    rng = np.random.default_rng(33)
    zc, bgn = 36, 2
    K, N = 10 * zc, 50 * zc
    ck = rng.integers(0, 2, (3, K)).astype("i1")
    dn = np.asarray(L.ldpc_encode(jnp.asarray(ck), bgn))
    llr = jnp.asarray(8.0 * (1 - 2.0 * dn), jnp.float32)
    bits, ok, _ = L.ldpc_decode(llr, zc, bgn, 5)
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(bits), ck)


def test_bler_baseline_mixed_ms():
    """Statistical anchor vs SURVEY.md section 6 BLER baselines.

    Reference out/ldpc_decode_result_all.pickle: Zc=10 bgn=1, mixed-MS
    alpha=0.8 beta=0.3 L=32, SNR grid arange(-1, 1.5, 0.5) (the grid is
    set in /root/reference/scripts/sim_ldpc_decoder.py:37) -> BLER
    0.277 @ -1.0 dB, 0.070 @ -0.5 dB, 0.0092 @ 0.0 dB. Bit-parity vs
    the reference decoder is asserted elsewhere on identical LLRs (and
    exhaustively by tools/bler_parity.py -> out/bler_parity.json); this
    checks the end-to-end encode->AWGN->decode statistics land on the
    same waterfall. Bands are reference-p +/- ~3.5 sigma binomial at
    the batch size used per point.
    """
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops.ldpc.encode import ldpc_encode
    from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode

    rng = np.random.default_rng(42)
    zc, bgn = 10, 1
    K = 22 * zc
    for snr_db, B, lo, hi in [(-1.0, 400, 0.19, 0.36),
                              (-0.5, 800, 0.038, 0.105),
                              (0.0, 3000, 0.003, 0.016)]:
        bits = rng.integers(0, 2, size=(B, K)).astype(np.int8)
        dn = np.array(ldpc_encode(jnp.asarray(bits), bgn))
        sigma2 = 10 ** (-snr_db / 10)
        noisy = (1 - 2.0 * dn) + rng.normal(size=dn.shape) * np.sqrt(sigma2)
        llr = ((2 / sigma2) * noisy).astype(np.float32)
        dec, ok, _ = ldpc_decode(jnp.asarray(llr), zc, bgn, 32, "min-sum",
                                 0.8, 0.3, backend="jax")
        blk_err = np.mean(np.any(np.array(dec) != bits, axis=1))
        assert lo <= blk_err <= hi, (snr_db, blk_err)


def test_bler_layered_half_iterations():
    """Layered schedule reaches the flooded-L=32 BLER with L=16.

    The serial-C layered sweep converges ~2x per iteration, so 16
    layered iterations must land inside the same mixed-MS L=32 curve
    band as test_bler_baseline_mixed_ms (reference 0.070 @ -0.5 dB,
    Zc=10 bgn=1), and 32 layered iterations must not be worse.
    """
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops.ldpc.encode import ldpc_encode
    from python_5gtoolbox_tpu.ops.ldpc.decode import ldpc_decode

    rng = np.random.default_rng(11)
    zc, bgn, snr_db, B = 10, 1, -0.5, 800
    K = 22 * zc
    bits = rng.integers(0, 2, size=(B, K)).astype(np.int8)
    dn = np.array(ldpc_encode(jnp.asarray(bits), bgn))
    sigma2 = 10 ** (-snr_db / 10)
    noisy = (1 - 2.0 * dn) + rng.normal(size=dn.shape) * np.sqrt(sigma2)
    llr = jnp.asarray((2 / sigma2) * noisy, jnp.float32)
    dec16, _, _ = ldpc_decode(llr, zc, bgn, 16, "min-sum", 0.8, 0.3,
                              backend="jax", schedule="layered")
    err16 = np.mean(np.any(np.array(dec16) != bits, axis=1))
    assert 0.030 <= err16 <= 0.105, err16
    dec32, _, _ = ldpc_decode(llr, zc, bgn, 32, "min-sum", 0.8, 0.3,
                              backend="jax", schedule="layered")
    err32 = np.mean(np.any(np.array(dec32) != bits, axis=1))
    assert err32 <= err16, (err16, err32)
