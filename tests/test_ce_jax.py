"""Jitted batched CE (rx/ce_jax.py) vs the NumPy NrChannelEstimation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from python_5gtoolbox_tpu.rx import ce_jax
from python_5gtoolbox_tpu.rx.channel_estimate import NrChannelEstimation


def _mk_hls(rng, s, n_sym, re_num, nr, nt, fo_hz=0.0, to_s=0.0, scs=30):
    """Synthetic multipath H_LS with optional CFO/TO signatures."""
    from python_5gtoolbox_tpu.utils.numerology import symbol_timing_offsets
    offs = np.asarray(symbol_timing_offsets(scs)[0])
    taps = (rng.normal(size=(s, 3, nr, nt))
            + 1j * rng.normal(size=(s, 3, nr, nt)))
    delays = np.array([0.0, 0.3e-6, 0.9e-6])
    k = np.arange(re_num) * 4 * scs * 1000.0
    h = np.einsum("spab,pk->skab", taps,
                  np.exp(-2j * np.pi * delays[:, None] * k[None]))
    h = np.repeat(h[:, None], n_sym, axis=1)       # (S, sym, RE, nr, nt)
    if to_s:
        h = h * np.exp(-2j * np.pi * to_s * k)[None, None, :, None, None]
    if fo_hz:
        ph = np.exp(2j * np.pi * fo_hz * offs[:n_sym])
        h = h * ph[None, :, None, None, None]
    noise = (rng.normal(size=h.shape) + 1j * rng.normal(size=h.shape))
    return (h + 0.05 * noise).astype(np.complex64)


CASES = [
    dict(algo="DFT", sym=2, fo=True),
    dict(algo="DFT_symmetric", sym=2, fo=False),
    dict(algo="DCT", sym=1, fo=False),
    dict(algo="DCT_symmetric", sym=3, fo=True),
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["algo"])
def test_matches_numpy_class(case):
    rng = np.random.default_rng(11)
    s, n_sym, re_num, nr, nt = 3, case["sym"], 60, 4, 2
    rs_map = {1: [2], 2: [2, 11], 3: [2, 7, 11]}[n_sym]
    h_ls = _mk_hls(rng, s, n_sym, re_num, nr, nt,
                   fo_hz=40.0 if case["fo"] else 0.0, to_s=2e-7)
    rs_info = dict(RSSymMap=rs_map, RE_distance=4,
                   NumCDMGroupsWithoutData=1, scs=30)
    ce_cfg = dict(CE_algo=case["algo"], L_symm_left_in_ns=1400,
                  L_symm_right_in_ns=1200, eRB=4, enable_TO_comp=True,
                  enable_FO_est=case["fo"] and n_sym > 1,
                  enable_FO_comp=case["fo"] and n_sym > 1)

    out = jax.jit(
        lambda h: ce_jax.channel_est_batch(h, rs_info, dict(ce_cfg))
    )(jnp.asarray(h_ls))
    H_b = np.asarray(out["H"])
    cov_b = np.asarray(out["cov"])

    for i in range(s):
        est = NrChannelEstimation(h_ls[i].copy(), dict(rs_info),
                                  dict(ce_cfg))
        H_ref, cov_ref = est.channel_est()
        scale = np.abs(H_ref).max()
        assert np.abs(H_b[i] - H_ref).max() < 2e-3 * scale, case
        cscale = max(np.abs(cov_ref).max(), 1e-9)
        assert np.abs(cov_b[i] - cov_ref).max() < 5e-3 * cscale, case
        assert abs(float(out["to_avg"][i]) - np.mean(est.TO_est)) \
            < 2e-9 + 1e-3 * abs(np.mean(est.TO_est))
        if ce_cfg["enable_FO_est"]:
            assert abs(float(out["fo"][i]) - est.FO_est) \
                < 1e-2 + 1e-3 * abs(est.FO_est)


def test_small_allocation_cov_shape():
    """Sub-16-PRB allocation (ADVICE r4 finding 1): the covariance PRB
    axis must be exactly total_prbs, matching the NumPy CE, not
    total_prbs+16 from a negative block count."""
    rng = np.random.default_rng(3)
    s, n_sym, re_num, nr, nt = 2, 2, 36, 4, 2        # 12 PRB < 16-PRB block
    rs_map = [2, 11]
    h_ls = _mk_hls(rng, s, n_sym, re_num, nr, nt, to_s=1e-7)
    rs_info = dict(RSSymMap=rs_map, RE_distance=4,
                   NumCDMGroupsWithoutData=1, scs=30)
    ce_cfg = dict(CE_algo="DFT_symmetric", L_symm_left_in_ns=1400,
                  L_symm_right_in_ns=1200, eRB=4, enable_TO_comp=True,
                  enable_FO_est=False, enable_FO_comp=False)
    out = jax.jit(
        lambda h: ce_jax.channel_est_batch(h, rs_info, dict(ce_cfg))
    )(jnp.asarray(h_ls))
    cov_b = np.asarray(out["cov"])
    est = NrChannelEstimation(h_ls[0].copy(), dict(rs_info), dict(ce_cfg))
    H_ref, cov_ref = est.channel_est()
    assert cov_b.shape[1:] == cov_ref.shape, (cov_b.shape, cov_ref.shape)
    cscale = max(np.abs(cov_ref).max(), 1e-9)
    assert np.abs(cov_b[0] - cov_ref).max() < 5e-3 * cscale


def test_comp_data_matches_numpy():
    rng = np.random.default_rng(5)
    s, n_sym, re_num, nr, nt = 2, 2, 60, 2, 2
    h_ls = _mk_hls(rng, s, n_sym, re_num, nr, nt, fo_hz=60.0, to_s=1e-7)
    rs_info = dict(RSSymMap=[2, 11], RE_distance=4,
                   NumCDMGroupsWithoutData=1, scs=30)
    ce_cfg = dict(CE_algo="DFT", L_symm_left_in_ns=1400,
                  L_symm_right_in_ns=1200, eRB=4, enable_TO_comp=True,
                  enable_FO_est=True, enable_FO_comp=True)
    data = (rng.normal(size=(s, 12, 240, nr))
            + 1j * rng.normal(size=(s, 12, 240, nr))).astype(np.complex64)

    out = ce_jax.channel_est_batch(jnp.asarray(h_ls), rs_info,
                                   dict(ce_cfg))
    got = np.asarray(ce_jax.comp_data_batch(
        jnp.asarray(data), 2, 30, out["to_avg"], out["fo"], ce_cfg))

    for i in range(s):
        est = NrChannelEstimation(h_ls[i].copy(), dict(rs_info),
                                  dict(ce_cfg))
        est.channel_est()
        ref = est.process_pdsch_data(data[i].copy(), 2)
        assert np.abs(got[i] - ref).max() < 2e-3 * np.abs(ref).max()
