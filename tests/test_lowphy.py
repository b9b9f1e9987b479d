"""Low-PHY (OFDM + channel filter) parity tests vs the reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.golden import get_golden

from python_5gtoolbox_tpu.ops import ofdm, filters
from python_5gtoolbox_tpu.utils import numerology as num


LP_CASES = [
    # (scs, BW, num_ant, carrier_freq_mhz)
    (15, 5, 1, 0),
    (15, 20, 2, 1900.05),
    (30, 20, 2, 3500.1),
    (30, 100, 4, 3500.1),
]


def _carrier_cfg(scs, bw, nant, fc):
    return {"carrier_frequency_in_mhz": fc, "num_of_ant": nant, "Nr": nant,
            "scs": scs, "BW": bw}


def _gen_lowphy_goldens():
    from py5gphy.nr_lowphy import tx_lowphy_process, rx_lowphy_process
    rng = np.random.default_rng(77)
    out = {}
    for i, (scs, bw, nant, fc) in enumerate(LP_CASES):
        prb = num.carrier_prb_size(scs, bw)
        fd = (rng.normal(size=(nant, 14 * 12 * prb))
              + 1j * rng.normal(size=(nant, 14 * 12 * prb))).astype("c8")
        cfg = _carrier_cfg(scs, bw, nant, fc)
        td = tx_lowphy_process.Tx_low_phy(fd.copy(), cfg)
        out[f"fd_{i}"], out[f"td_{i}"] = fd, td
        # channel filter to 245.76 Msps (skip the largest case for time)
        if bw <= 20:
            dl = tx_lowphy_process.channel_filter(td, cfg, 245.76e6)
            out[f"dl_{i}"] = dl
        # rx low phy on the tx td slot (loopback, no filters)
        fd_rx = rx_lowphy_process.Rx_low_phy(td, cfg)
        out[f"fdrx_{i}"] = fd_rx
    return out


@pytest.fixture(scope="module")
def lowphy_goldens():
    return get_golden("lowphy_cases", _gen_lowphy_goldens)


@pytest.mark.parametrize("i", range(len(LP_CASES)))
def test_tx_low_phy(lowphy_goldens, i):
    scs, bw, nant, fc = LP_CASES[i]
    prb = num.carrier_prb_size(scs, bw)
    fd = lowphy_goldens[f"fd_{i}"].reshape(nant, 14, 12 * prb)
    td = np.asarray(ofdm.tx_low_phy(jnp.asarray(fd), scs, bw,
                                    int(fc * 1e6)))
    np.testing.assert_allclose(td, lowphy_goldens[f"td_{i}"], atol=2e-4)


@pytest.mark.parametrize("i", range(len(LP_CASES)))
def test_tx_channel_filter(lowphy_goldens, i):
    scs, bw, nant, fc = LP_CASES[i]
    if f"dl_{i}" not in lowphy_goldens:
        pytest.skip("large case skipped in golden gen")
    td = lowphy_goldens[f"td_{i}"]
    dl = np.asarray(filters.tx_channel_filter(jnp.asarray(td), scs, bw))
    ref = lowphy_goldens[f"dl_{i}"]
    assert dl.shape == ref.shape
    np.testing.assert_allclose(dl, ref, atol=2e-4)


@pytest.mark.parametrize("i", range(len(LP_CASES)))
def test_rx_low_phy(lowphy_goldens, i):
    scs, bw, nant, fc = LP_CASES[i]
    td = lowphy_goldens[f"td_{i}"]
    prb = num.carrier_prb_size(scs, bw)
    fd = np.asarray(ofdm.rx_low_phy(jnp.asarray(td), scs, bw, int(fc * 1e6)))
    ref = lowphy_goldens[f"fdrx_{i}"].reshape(nant, 14, 12 * prb)
    np.testing.assert_allclose(fd, ref, atol=2e-4)


def test_tx_rx_roundtrip():
    """tx_low_phy -> rx_low_phy recovers the grid (loopback sanity)."""
    rng = np.random.default_rng(5)
    scs, bw = 30, 20
    prb = num.carrier_prb_size(scs, bw)
    fd = (rng.normal(size=(2, 2, 14, 12 * prb))
          + 1j * rng.normal(size=(2, 2, 14, 12 * prb))).astype("c8")
    td = ofdm.tx_low_phy(jnp.asarray(fd), scs, bw, 0)
    back = np.asarray(ofdm.rx_low_phy(td, scs, bw, 0))
    np.testing.assert_allclose(back, fd, atol=1e-3)
