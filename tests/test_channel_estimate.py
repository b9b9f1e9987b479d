"""Channel-estimation parity vs the reference (incl. the symmetric
DFT/DCT variant used by the PUSCH throughput sims)."""
import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.rx.channel_estimate import dft_dct_channel_estimate


def _mk_case(rng, sym_num, re_num, nr, nt):
    """Plausible H_LS: a few taps + noise, sampled every 2nd RE."""
    rd = 2
    taps = (rng.normal(size=(1, 1, nr, nt, 3))
            + 1j * rng.normal(size=(1, 1, nr, nt, 3)))
    k = np.arange(re_num)[None, :, None, None, None]
    delays = np.array([0.0, 0.8e-6, 2.0e-6])[None, None, None, None, :]
    h = np.sum(taps * np.exp(-2j * np.pi * k * rd * 30e3 * delays), axis=-1)
    h = np.broadcast_to(h, (sym_num, re_num, nr, nt)).copy()
    h += 0.05 * (rng.normal(size=h.shape) + 1j * rng.normal(size=h.shape))
    return h.astype(np.complex64)


CASES = [  # (algo, sym_num, re_num, nr, nt)
    # re_num >= 96 (16 PRB at RE_distance 2): the reference's
    # cov_m_estimate block split breaks below 16 PRB
    ("DFT_symmetric", 2, 120, 4, 2),
    ("DCT_symmetric", 2, 120, 2, 2),
    ("DFT_symmetric", 1, 96, 2, 1),
]


def _gen_goldens():
    from py5gphy.channel_estimate import dft_dct_symmetric_CE
    rng = np.random.default_rng(17)
    out = {}
    for i, (algo, sym_num, re_num, nr, nt) in enumerate(CASES):
        h_ls = _mk_case(rng, sym_num, re_num, nr, nt)
        rs_info = {"RE_distance": 2, "scs": 30,
                   "RSSymMap": [2, 7][:sym_num],
                   "NumCDMGroupsWithoutData": 2}
        ce_cfg = {"CE_algo": algo, "L_symm_left_in_ns": 1400,
                  "L_symm_right_in_ns": 1200, "eRB": 4,
                  "enable_TO_comp": True, "enable_FO_est": False,
                  "enable_FO_comp": False, "freq_intp_method": "linear",
                  "timing_intp_method": "linear"}
        model = algo.replace("_symmetric", "")
        h_ref, cov_ref = \
            dft_dct_symmetric_CE.DFT_DCT_symmetric_channel_estimate(
                h_ls.copy(), dict(rs_info), dict(ce_cfg), model)
        out[f"hls_{i}"] = h_ls
        out[f"h_{i}"] = np.asarray(h_ref, np.complex64)
        out[f"cov_{i}"] = np.asarray(cov_ref, np.complex64)
    return out


@pytest.fixture(scope="module")
def goldens():
    return get_golden("ce_symmetric_cases", _gen_goldens)


@pytest.mark.parametrize("i", range(len(CASES)))
def test_symmetric_ce_parity(goldens, i):
    """Symmetric-extension DFT/DCT CE == reference implementation
    (py5gphy/channel_estimate/dft_dct_symmetric_CE.py:11)."""
    algo, sym_num, re_num, nr, nt = CASES[i]
    rs_info = {"RE_distance": 2, "scs": 30, "RSSymMap": [2, 7][:sym_num],
               "NumCDMGroupsWithoutData": 2}
    ce_cfg = {"CE_algo": algo, "L_symm_left_in_ns": 1400,
              "L_symm_right_in_ns": 1200, "eRB": 4,
              "freq_intp_method": "linear", "timing_intp_method": "linear"}
    h, cov = dft_dct_channel_estimate(
        goldens[f"hls_{i}"], rs_info, ce_cfg,
        algo.replace("_symmetric", ""), symmetric=True)
    np.testing.assert_allclose(h, goldens[f"h_{i}"], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(cov, goldens[f"cov_{i}"], rtol=2e-4,
                               atol=2e-4)
