"""Extract 3GPP specification constant tables into npz data files.

These are pure spec data (TS 38.212 / 38.211 tables): LDPC base-graph
shift tables (38.212 Tables 5.3.2-2/3), the polar reliability sequence
(38.212 Table 5.3.1.2-1), and the low-PAPR phi tables (38.211 Tables
5.2.2.2-1..4). The reference repo ships them as .mat files / python
literals; we re-store them as npz under python_5gtoolbox_tpu/data/.

Run once: python tools/extract_spec_tables.py
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np
from scipy.io import loadmat

REF = pathlib.Path("/root/reference")
OUT = pathlib.Path(__file__).resolve().parents[1] / "python_5gtoolbox_tpu" / "data"


def extract_ldpc_bg():
    tables = {}
    for bgn in (1, 2):
        for ils in range(8):
            mat = loadmat(REF / f"py5gphy/ldpc/tables/BG{bgn}S{ils}.mat1")
            tables[f"BG{bgn}S{ils}"] = mat["BG"].astype(np.int32)
    np.savez_compressed(OUT / "ldpc_basegraphs.npz", **tables)
    print("ldpc_basegraphs.npz:", {k: v.shape for k, v in tables.items()})


def extract_polar_reliability():
    sys.path.insert(0, str(REF))
    from py5gphy.polar import frozen_table

    seq = np.asarray(frozen_table.frozen_pos_table, dtype=np.int16)
    assert seq.size == 1024 and sorted(seq.tolist()) == list(range(1024))
    np.savez_compressed(OUT / "polar_reliability.npz", sequence=seq)
    print("polar_reliability.npz:", seq.shape)


def extract_lowpapr_phi():
    sys.path.insert(0, str(REF))
    from py5gphy.common import lowPAPR_seq

    tables = {}
    for mzc in (6, 12, 18, 24):
        tables[f"phi_{mzc}"] = np.asarray(
            lowPAPR_seq._get_phitable(mzc), dtype=np.int8)
    np.savez_compressed(OUT / "lowpapr_phi.npz", **tables)
    print("lowpapr_phi.npz:", {k: v.shape for k, v in tables.items()})


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    extract_ldpc_bg()
    extract_polar_reliability()
    extract_lowpapr_phi()


def extract_srs_bw_table():
    """38.211 Table 6.4.1.4.3-1 SRS bandwidth configurations (64 rows)."""
    sys.path.insert(0, str(REF))
    from py5gphy.nr_srs import nr_srs_tables

    rows = [nr_srs_tables.get_srs_bw_config(c) for c in range(64)]
    np.savez_compressed(OUT / "srs_bw_config.npz",
                        table=np.asarray(rows, np.int32))
