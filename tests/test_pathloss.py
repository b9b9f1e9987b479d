"""Pathloss model parity vs reference (TR 38.901 7.4 scenarios)."""
import numpy as np
import pytest

from tests.golden import get_golden

from python_5gtoolbox_tpu.models.pathloss import NrPathloss

# (scenario, LOS, distance key/value, extra config)
CASES = [
    ("RMa", True, ("d2D", 20.0), {}),
    ("RMa", True, ("d2D", 5000.0), {}),
    ("RMa", False, ("d2D", 3000.0), {}),
    ("UMa", True, ("d2D", 20.0), {}),
    ("UMa", False, ("d2D", 3000.0), {}),
    ("UMa", False, ("d2D", 3000.0), {"optional": True}),
    ("UMi", True, ("d2D", 20.0), {}),
    ("UMi", False, ("d2D", 3000.0), {}),
    ("InH", True, ("d3D", 20.0), {}),
    ("InH", False, ("d3D", 20.0), {"office_type": "Open"}),
    ("InF", True, ("d3D", 20.0), {}),
    ("InF", False, ("d3D", 20.0), {"type": "DL"}),
    ("InF", False, ("d3D", 20.0), {"type": "DH"}),
]
FREQ = 2e9


def _gen_goldens():
    from py5gphy.channel_model import nr_pathloss
    out = {}
    for i, (scen, los, (dk, dv), extra) in enumerate(CASES):
        pl = nr_pathloss.NrPathloss(scen, FREQ, los)
        pl.LOS = los
        pl.PLmodel.config[dk] = dv
        for k, v in extra.items():
            pl.PLmodel.config[k] = v
        res = pl.gen_pathloss_info()
        out[f"res_{i}"] = np.asarray([float(res[0]), float(res[1]),
                                      float(res[2])])
    return out


@pytest.fixture(scope="module")
def goldens():
    return get_golden("pathloss_cases", _gen_goldens)


@pytest.mark.parametrize("i", range(len(CASES)))
def test_pathloss(goldens, i):
    scen, los, (dk, dv), extra = CASES[i]
    pl = NrPathloss(scen, FREQ, los, **{dk: dv}, **extra)
    got = pl.gen_pathloss_info()
    np.testing.assert_allclose(
        [float(got[0]), float(got[1]), float(got[2])], goldens[f"res_{i}"],
        rtol=1e-10, err_msg=f"{scen} LOS={los}")


def test_pathloss_vectorized():
    pl, sf, pr = NrPathloss("UMa", FREQ, True,
                            d2D=np.array([20.0, 100.0, 3000.0])
                            ).gen_pathloss_info()
    assert pl.shape == (3,)
    assert np.all(np.diff(pl) > 0)  # monotone in distance
