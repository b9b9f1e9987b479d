"""Parity tests for the reduced-complexity ML equalizers
(MMSE-ML, opt-rank2-ML) vs the reference implementations."""
import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.rx import equalize as eq_mod

# (algo, Nr, NL)
CASES = [
    ("MMSE-ML", 2, 2),
    ("MMSE-ML-IRC", 4, 2),
    ("opt-rank2-ML", 2, 2),
    ("opt-rank2-ML-IRC", 4, 2),
    ("opt-rank2-ML", 4, 1),       # NL!=2 fallback path (full ML)
]
MODTYPE = "16qam"


def _gen_cases():
    """Draw y = H s + n at decent SNR so candidate selections are stable."""
    from py5gphy.common import nrModulation
    rng = np.random.default_rng(7)
    out = {}
    for i, (algo, nr, nl) in enumerate(CASES):
        n = 24
        mod_array, _ = nrModulation.get_mod_list(MODTYPE)
        s = mod_array[rng.integers(len(mod_array), size=(n, nl))]
        h = (rng.normal(size=(n, nr, nl))
             + 1j * rng.normal(size=(n, nr, nl))) / np.sqrt(2)
        noise = 0.05 * (rng.normal(size=(n, nr))
                        + 1j * rng.normal(size=(n, nr)))
        y = np.einsum("nrl,nl->nr", h, s) + noise
        cov = np.zeros((n, nr, nr), complex)
        for m in range(n):
            a = 0.2 * (rng.normal(size=(nr, nr))
                       + 1j * rng.normal(size=(nr, nr)))
            cov[m] = a @ a.conj().T / 8 + 0.05 * np.eye(nr)
        out[f"y_{i}"], out[f"h_{i}"], out[f"cov_{i}"] = y, h, cov
    return out


def _gen_goldens():
    from py5gphy.channel_equalization import nr_channel_eq
    data = _gen_cases()
    out = dict(data)
    for i, (algo, nr, nl) in enumerate(CASES):
        y, h, cov = data[f"y_{i}"], data[f"h_{i}"], data[f"cov_{i}"]
        n = y.shape[0]
        s_all = np.zeros((n, nl), complex)
        llr_all = []
        for m in range(n):
            s, nv, hb, llr = nr_channel_eq.channel_equ_and_demod(
                y[m].copy(), h[m].copy(), cov[m].copy(), MODTYPE,
                {"algo": algo})
            s_all[m] = np.asarray(s).reshape(-1)
            llr_all.append(np.asarray(llr).reshape(-1))
        out[f"s_{i}"] = s_all
        out[f"llr_{i}"] = np.concatenate(llr_all)
    return out


@pytest.fixture(scope="module")
def goldens():
    return get_golden("equalize_ml_cases", _gen_goldens)


@pytest.mark.parametrize("i", range(len(CASES)))
def test_ml_variants(goldens, i):
    algo, nr, nl = CASES[i]
    s, nv, hard, llr = eq_mod.channel_equ_and_demod(
        goldens[f"y_{i}"], goldens[f"h_{i}"], goldens[f"cov_{i}"],
        MODTYPE, {"algo": algo})
    np.testing.assert_allclose(np.asarray(s), goldens[f"s_{i}"],
                               rtol=1e-3, atol=1e-3, err_msg=algo)
    np.testing.assert_allclose(np.asarray(llr).reshape(-1),
                               goldens[f"llr_{i}"], rtol=2e-2, atol=2e-2,
                               err_msg=algo)


# --- ML2 (exact max-log over the full candidate set, ML2.py:47-163) ---
ML2_CASES = [
    ("ML2-soft", 2, 2),
    ("ML2-IRC-soft", 4, 2),
    ("ML2-soft", 4, 1),
]


def _gen_ml2_goldens():
    from py5gphy.channel_equalization import nr_channel_eq
    from py5gphy.common import nrModulation
    rng = np.random.default_rng(11)
    out = {}
    for i, (algo, nr, nl) in enumerate(ML2_CASES):
        n = 24
        mod_array, _ = nrModulation.get_mod_list(MODTYPE)
        s = mod_array[rng.integers(len(mod_array), size=(n, nl))]
        h = (rng.normal(size=(n, nr, nl))
             + 1j * rng.normal(size=(n, nr, nl))) / np.sqrt(2)
        noise = 0.05 * (rng.normal(size=(n, nr))
                        + 1j * rng.normal(size=(n, nr)))
        y = np.einsum("nrl,nl->nr", h, s) + noise
        cov = np.zeros((n, nr, nr), complex)
        for m in range(n):
            a = 0.2 * (rng.normal(size=(nr, nr))
                       + 1j * rng.normal(size=(nr, nr)))
            cov[m] = a @ a.conj().T / 8 + 0.05 * np.eye(nr)
        out[f"y_{i}"], out[f"h_{i}"], out[f"cov_{i}"] = y, h, cov
        s_all = np.zeros((n, nl), complex)
        llr_all = []
        for m in range(n):
            sr, nv, hb, llr = nr_channel_eq.channel_equ_and_demod(
                y[m].copy(), h[m].copy(), cov[m].copy(), MODTYPE,
                {"algo": algo})
            s_all[m] = np.asarray(sr).reshape(-1)
            llr_all.append(np.asarray(llr).reshape(-1))
        out[f"s_{i}"] = s_all
        out[f"llr_{i}"] = np.concatenate(llr_all)
    return out


@pytest.fixture(scope="module")
def ml2_goldens():
    return get_golden("equalize_ml2_cases", _gen_ml2_goldens)


@pytest.mark.parametrize("i", range(len(ML2_CASES)))
def test_ml2_exact_maxlog(ml2_goldens, i):
    """ML2 parity vs the reference's exact max-log LLRs (VERDICT r2
    item 7: previously silently aliased to the opposite-symbol ML)."""
    algo, nr, nl = ML2_CASES[i]
    g = ml2_goldens
    s, nv, hard, llr = eq_mod.channel_equ_and_demod(
        g[f"y_{i}"], g[f"h_{i}"], g[f"cov_{i}"], MODTYPE, {"algo": algo})
    np.testing.assert_allclose(np.asarray(s), g[f"s_{i}"],
                               rtol=1e-3, atol=1e-3, err_msg=algo)
    np.testing.assert_allclose(np.asarray(llr).reshape(-1),
                               g[f"llr_{i}"], rtol=2e-2, atol=2e-2,
                               err_msg=algo)
