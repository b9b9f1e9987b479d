"""HARQ LLR-combining round trips for DLSCH and ULSCH (VERDICT r1 item 6).

Reference behavior: py5gphy/nr_pdsch/nr_dlsch_decode.py:72-88 — rate
recover each retransmission into the circular buffer, then combine with
the stored LLRs (average where both nonzero, sum where either is a
punctured zero) before LDPC decode.

Scenario: a high-rate first transmission (G ~ 0.9 * K) at an SNR where
it cannot decode, followed by rv=2 which fills the other half of the
circular buffer; the combined effective rate ~0.45 decodes cleanly.
"""
import numpy as np
import jax.numpy as jnp

from python_5gtoolbox_tpu.phy.pdsch import dlsch_encode
from python_5gtoolbox_tpu.phy.pdsch_rx import dlsch_decode
from python_5gtoolbox_tpu.phy.pusch import ulsch_encode
from python_5gtoolbox_tpu.phy.pusch_rx import ulsch_decode

LDPC_CFG = {"L": 16, "algo": "min-sum", "alpha": 0.8, "beta": 0.3}
TBSIZE, QM, RATE1024, G = 2000, 2, 900, 2240
SNR_DB = 3.0


def _llr(fe: np.ndarray, rng) -> np.ndarray:
    sigma = 10 ** (-SNR_DB / 20)
    rx = (1 - 2.0 * fe.astype(np.float64)) + rng.normal(size=fe.shape) * sigma
    return (2.0 * rx / sigma ** 2).astype(np.float32)


def test_dlsch_harq_rv_cycle():
    rng = np.random.default_rng(5)
    tbs_lbrm = 10 ** 9  # no LBRM limiting
    for trial in range(2):
        trblk = rng.integers(0, 2, TBSIZE).astype(np.int8)
        fe0 = np.asarray(dlsch_encode(jnp.asarray(trblk), TBSIZE, QM,
                                      RATE1024, 1, 0, tbs_lbrm, G))
        ok0, _, llr_dns = dlsch_decode(_llr(fe0, rng), TBSIZE, QM,
                                       RATE1024, 1, 0, tbs_lbrm, LDPC_CFG,
                                       harq_on=True, current_llr_dns=None)
        assert not ok0, "first transmission should fail at this rate/SNR"

        fe2 = np.asarray(dlsch_encode(jnp.asarray(trblk), TBSIZE, QM,
                                      RATE1024, 1, 2, tbs_lbrm, G))
        ok2, tbblk, _ = dlsch_decode(_llr(fe2, rng), TBSIZE, QM, RATE1024,
                                     1, 2, tbs_lbrm, LDPC_CFG,
                                     harq_on=True,
                                     current_llr_dns=llr_dns)
        assert ok2, "rv=2 retransmission must decode after combining"
        np.testing.assert_array_equal(tbblk, trblk)


def test_dlsch_no_combine_still_fails():
    """Control: the rv=2 LLRs alone (no combining) do not decode."""
    rng = np.random.default_rng(6)
    trblk = rng.integers(0, 2, TBSIZE).astype(np.int8)
    fe2 = np.asarray(dlsch_encode(jnp.asarray(trblk), TBSIZE, QM, RATE1024,
                                  1, 2, 10 ** 9, G))
    ok, _, _ = dlsch_decode(_llr(fe2, rng), TBSIZE, QM, RATE1024, 1, 2,
                            10 ** 9, LDPC_CFG, harq_on=False)
    assert not ok


def test_ulsch_harq_rv_cycle():
    rng = np.random.default_rng(7)
    for trial in range(2):
        trblk = rng.integers(0, 2, TBSIZE).astype(np.int8)
        fe0 = ulsch_encode(trblk, TBSIZE, QM, RATE1024, 1, 0, G)
        ok0, _, llr_dns = ulsch_decode(_llr(fe0, rng), TBSIZE, QM,
                                       RATE1024, 1, 0, LDPC_CFG,
                                       harq_on=True, current_llr_dns=None)
        assert not ok0

        fe2 = ulsch_encode(trblk, TBSIZE, QM, RATE1024, 1, 2, G)
        ok2, tbblk, _ = ulsch_decode(_llr(fe2, rng), TBSIZE, QM, RATE1024,
                                     1, 2, LDPC_CFG, harq_on=True,
                                     current_llr_dns=llr_dns)
        assert ok2
        np.testing.assert_array_equal(tbblk, trblk)
