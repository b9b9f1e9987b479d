"""CSI report (RI/PMI/CQI) tests.

No reference goldens exist: the reference ships this feature as a stub
(py5gphy scripts/NR_CSIRS_report_example.py:118-128). Tests assert the
spec properties instead: codebook orthonormality (38.214 5.2.2.2.1),
PMI/RI recovery on synthetic channels built FROM codebook precoders,
CQI monotonicity in SNR, and subband bookkeeping per Table 5.2.1.4-2.
"""
import copy

import numpy as np
import pytest

from python_5gtoolbox_tpu.phy import csirs_report as rep
from python_5gtoolbox_tpu.phy.csirs import NrCSIRS
from python_5gtoolbox_tpu.utils.config import get_default_config


def _cfgs(ports, row, bits, nrb=48, density="one", cdm="fd-CDM2"):
    carrier = copy.deepcopy(get_default_config("dl_carrier"))
    carrier["scs"], carrier["BW"] = 30, 40
    carrier["num_of_ant"] = ports
    csirs = copy.deepcopy(get_default_config("csirs"))
    csirs["frequencyDomainAllocation"]["row"] = row
    csirs["frequencyDomainAllocation"]["bitstring"] = bits
    csirs["nrofPorts"] = ports
    csirs["density"] = density
    csirs["cdm_type"] = cdm
    csirs["startingRB"], csirs["nrofRBs"] = 0, nrb
    csirs["periodicity"], csirs["slotoffset"] = 10, 0
    report = copy.deepcopy(get_default_config("csirs_report"))
    report["SubbandSize "] = 8  # default 4 is invalid for 106 PRB
    return carrier, csirs, report


@pytest.mark.parametrize("ports", [1, 2, 4])
def test_codebook_orthonormal(ports):
    # columns orthogonal, total power 1: W^H W = I/rank (38.214 tables)
    for rank in range(1, ports + 1):
        w, meta = rep.type1_sp_codebook(ports, rank)
        assert len(meta) == w.shape[0]
        g = np.einsum("cpv,cpu->cvu", w.conj(), w)
        want = np.eye(rank) / rank
        assert np.allclose(g, want[None], atol=1e-6), (ports, rank)


def _rx_grid(carrier, csirs, h, nrx, noise, seed=0):
    """Pass the CSI-RS TX grid through a flat MIMO channel h (nrx, P)."""
    ports = csirs["nrofPorts"]
    n_sc = 12 * 106  # scs30/BW40
    tx = np.zeros((ports, 14 * n_sc), np.complex64)
    use = np.zeros_like(tx, np.int8)
    tx, _ = NrCSIRS(carrier, csirs).process(tx, use, 0, 0)
    rng = np.random.default_rng(seed)
    y = h @ tx
    y += noise * (rng.normal(size=y.shape) + 1j * rng.normal(size=y.shape)
                  ).astype(np.complex64) / np.sqrt(2)
    return y


@pytest.mark.parametrize("ports,row,bits", [
    (2, 3, "000001"), (4, 4, "001"), (4, 5, "000010")])
def test_channel_estimate_despread(ports, row, bits):
    carrier, csirs, _ = _cfgs(ports, row, bits)
    rng = np.random.default_rng(1)
    h = (rng.normal(size=(3, ports)) + 1j * rng.normal(size=(3, ports))
         ).astype(np.complex64)
    y = _rx_grid(carrier, csirs, h, 3, noise=0.0)
    hh, prbs, n_var = rep.csirs_channel_estimate(
        y, NrCSIRS(carrier, csirs), 0, 0)
    hh = np.asarray(hh)
    assert hh.shape[1:] == (3, ports) and len(prbs) == hh.shape[0]
    # flat channel: every group recovers h exactly (covers orthogonal)
    assert np.allclose(hh, np.broadcast_to(h, hh.shape), atol=1e-4)
    assert float(n_var) < 1e-6


@pytest.mark.parametrize("ports,row,bits,rank", [
    (2, 3, "000001", 1), (2, 3, "000001", 2),
    (4, 4, "001", 1), (4, 4, "001", 2), (4, 5, "000010", 4)])
def test_pmi_ri_recovery(ports, row, bits, rank):
    """Channel built from a codebook precoder reports that rank+PMI."""
    carrier, csirs, rcfg = _cfgs(ports, row, bits)
    w, meta = rep.type1_sp_codebook(ports, rank)
    c_true = len(meta) // 2
    # h = G @ W^H with well-conditioned G: best match is W itself
    rng = np.random.default_rng(2)
    g = np.linalg.qr(rng.normal(size=(rank, rank))
                     + 1j * rng.normal(size=(rank, rank)))[0] * 3.0
    h = (g @ w[c_true].conj().T).astype(np.complex64)  # (rank, P)
    nrx = max(rank, 2)
    h = np.concatenate([h, np.zeros((nrx - rank, ports))]).astype(
        np.complex64)
    y = _rx_grid(carrier, csirs, h, nrx, noise=1e-3)
    r = rep.NrCSIRSReport(carrier, csirs, rcfg, n_rx=nrx)
    out = r.report(y, 0, 0, noise_var=1e-2)
    assert out["RI"] == rank
    if rank == ports:
        # at full rank every (scaled-)unitary W yields identical MMSE
        # capacity, so the PMI is not identifiable - RI is the claim
        return
    if rcfg.get("PMIMode ", "Subband") == "Subband":
        i2 = out["PMI"]["i2"]
        i2 = i2[0] if isinstance(i2, list) else i2
    else:
        i2 = out["PMI"]["i2"]
    got = {"i11": out["PMI"]["i11"], "i13": out["PMI"]["i13"], "i2": i2}
    assert got == meta[c_true], (got, meta[c_true])


def test_cqi_monotonic_in_snr():
    carrier, csirs, rcfg = _cfgs(2, 3, "000001")
    rcfg["CQIMode "] = "Wideband"
    rcfg["PMIMode "] = "Wideband"
    rng = np.random.default_rng(3)
    h = (rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
         ).astype(np.complex64)
    r = rep.NrCSIRSReport(carrier, csirs, rcfg, n_rx=2)
    cqis = []
    for snr_db in (-25.0, 0.0, 30.0):
        nv = 10 ** (-snr_db / 10)
        y = _rx_grid(carrier, csirs, h, 2, noise=np.sqrt(nv))
        cqis.append(r.report(y, 0, 0, noise_var=nv)["CQI"])
    assert cqis == sorted(cqis)
    assert cqis[0] <= 2 and cqis[-1] == 15


def test_subband_report_shapes():
    carrier, csirs, rcfg = _cfgs(4, 4, "001", nrb=48)
    rcfg["CQIMode "] = "Subband"
    rcfg["PMIMode "] = "Subband"
    rcfg["SubbandSize "] = 8
    rng = np.random.default_rng(4)
    h = (rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
         ).astype(np.complex64)
    y = _rx_grid(carrier, csirs, h, 4, noise=0.05)
    out = rep.NrCSIRSReport(carrier, csirs, rcfg, n_rx=4).report(
        y, 0, 0, noise_var=0.01)
    n_sb = len(out["subbands"])
    assert n_sb == 48 // 8
    assert len(out["subband_CQI"]) == n_sb
    assert len(out["PMI"]["i2"]) == n_sb


def test_subband_size_validation():
    carrier, csirs, rcfg = _cfgs(4, 4, "001")
    rcfg["CQIMode "] = "Subband"
    rcfg["SubbandSize "] = 32  # invalid for 106 PRB (allows 8/16)
    with pytest.raises(AssertionError, match="SubbandSize"):
        rep.NrCSIRSReport(carrier, csirs, rcfg, n_rx=2)
    assert rep.valid_subband_sizes(106) == (8, 16)
    assert rep.valid_subband_sizes(24) == (4, 8)
    assert rep.valid_subband_sizes(270) == (16, 32)
