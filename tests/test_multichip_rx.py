"""Sharded batched-RX core == unsharded (VERDICT r4 item 6).

The flagship r4 component — the one-dispatch slot-batched RX
(rx/batch_core.py) — must produce identical decode results when its
slot axis is sharded over a multi-device mesh (the framework's own
SURVEY 5.8 obligation; the reference is single-process NumPy and has
no analogue). Runs on the 8-virtual-device CPU mesh from conftest.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from python_5gtoolbox_tpu.phy.pdsch import Pdsch
from python_5gtoolbox_tpu.utils.config import get_default_config, merged
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size

CE = dict(CE_algo="DFT_symmetric", L_symm_left_in_ns=1400,
          L_symm_right_in_ns=1200, eRB=4, enable_TO_comp=True,
          enable_FO_est=False, enable_FO_comp=False)
LDPC = dict(L=8, algo="min-sum", alpha=0.8, beta=0.3)


def _build(s):
    carrier = merged(get_default_config("dl_carrier"),
                     dict(BW=10, scs=30, num_of_ant=2, Nr=2,
                          maxMIMO_layers=2, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    pdsch = merged(get_default_config("pdsch"),
                   dict(mcs_index=2, mcs_table="256QAM", num_of_layers=2,
                        rv=[0], data_source=[], StartSymbolIndex=2,
                        NrOfSymbols=12))
    pdsch["ResAlloType1"].update(RBStart=0, RBSize=12)
    pdsch["DMRS"].update(nNIDnSCID=1, NumCDMGroupsWithoutData=1,
                         DMRSAddPos=1)
    pdsch["precoding_matrix"] = np.empty(0)
    p = Pdsch(pdsch, carrier)
    prb = carrier_prb_size(30, 10)
    n_sc = 12 * prb
    fn, dmrs_planes, scr_sign = p.rx_batch_prepare(
        2, list(range(s)), {"algo": "MMSE-IRC"}, dict(LDPC), dict(CE))
    rng = np.random.default_rng(21)
    rx_planes = rng.normal(size=(2, s, 2, 14 * n_sc)).astype(np.float32)
    return fn, rx_planes, dmrs_planes, scr_sign


def test_rx_core_sharded_matches_unsharded():
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    s = 2 * n_dev
    fn, rx_planes, dmrs_planes, scr_sign = _build(s)

    err_u, tb_u = fn(jnp.asarray(rx_planes), jnp.asarray(dmrs_planes),
                     jnp.asarray(scr_sign))
    err_u, tb_u = np.asarray(err_u), np.asarray(tb_u)

    mesh = Mesh(np.array(jax.devices()).reshape(-1, 2), ("dp", "sp"))
    slot_shard = NamedSharding(mesh, P(("dp", "sp")))
    with mesh:
        rx_s = jax.device_put(
            rx_planes, NamedSharding(mesh, P(None, ("dp", "sp"))))
        dm_s = jax.device_put(
            dmrs_planes, NamedSharding(mesh, P(None, ("dp", "sp"))))
        sc_s = jax.device_put(scr_sign, NamedSharding(mesh, P(None)))
        err_s, tb_s = fn(rx_s, dm_s, sc_s)
        # outputs must come back slot-sharded (SPMD, not a gather-to-0)
        assert len(err_s.sharding.device_set) == len(jax.devices()) or \
            err_s.sharding.is_fully_replicated
    np.testing.assert_array_equal(err_u, np.asarray(err_s))
    np.testing.assert_array_equal(tb_u, np.asarray(tb_s))
    del slot_shard
