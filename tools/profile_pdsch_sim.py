"""Regenerate the warm-TPU PDSCH link-level sweep stage profile
(successor of out/profile_pdsch_sim_r04.json; VERDICT r4 Weak #2
lineage: the artifact that attributed 42% of the sweep to the per-slot
host TX loop before the r5 device-batched TX + fused-spec DUC).

Runs bench.py's exact link-level config with a StageProfiler attached
and writes out/profile_pdsch_sim_r05.json.

Usage: python tools/profile_pdsch_sim.py
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402

select_platform("sweep")

from python_5gtoolbox_tpu.models import channel as chan_mod  # noqa: E402
from python_5gtoolbox_tpu.utils.config import (  # noqa: E402
    get_default_config, merged)
from python_5gtoolbox_tpu.utils.profiling import StageProfiler  # noqa: E402
from scripts.internal import (  # noqa: E402
    sim_pdsch_throughput_internal as pdsim)


def main() -> None:
    carrier = merged(get_default_config("dl_carrier"),
                     dict(BW=20, scs=30, num_of_ant=2, Nr=4,
                          maxMIMO_layers=2, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    pdsch = merged(get_default_config("pdsch"),
                   dict(mcs_index=2, mcs_table="256QAM", num_of_layers=2,
                        rv=[0], data_source=[], StartSymbolIndex=2,
                        NrOfSymbols=12))
    pdsch["ResAlloType1"].update(RBStart=0, RBSize=20)
    pdsch["DMRS"].update(nNIDnSCID=1, NumCDMGroupsWithoutData=1,
                         DMRSAddPos=1)
    pdsch["precoding_matrix"] = np.empty(0)
    chan = chan_mod.gen_channel_model_config(
        model_format="customized", Nt=2, Nr=4, fm_inHz=200,
        multi_paths=[[0, 0, "Rayleigh", 0, 0]])
    ce = dict(CE_algo="DFT", L_symm_left_in_ns=200,
              L_symm_right_in_ns=200, eRB=2, enable_TO_comp=True,
              enable_FO_est=False, enable_FO_comp=False)
    ldpc = dict(L=16, algo="min-sum", alpha=0.8, beta=0.3)
    snrs = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    kw = dict(ceq_algo_list=["MMSE-IRC"], n_slots=20, ce_config=ce,
              ldpc_config=ldpc, seed=3)
    pdsim.run_pdsch_throughput(carrier, pdsch, chan, snrs, **kw)  # warm
    prof = StageProfiler()
    t0 = time.perf_counter()
    pdsim.run_pdsch_throughput(carrier, pdsch, chan, snrs, prof=prof,
                               **kw)
    total = time.perf_counter() - t0
    n_slots_total = len(snrs) * 20
    doc = dict(
        purpose=("Per-stage wall time of the warm TPU PDSCH link-level "
                 "sweep after the r5 device-batched TX and the "
                 "fully-fused Pallas DUC (successor of the r4 artifact "
                 "where tx_waveform was 0.502 s = 42% of the sweep). "
                 "Stage times include only host-blocking time - device "
                 "work overlaps the next point's TX staging."),
        config=("BW20 scs30 Nt2/Nr4 QPSK one-tap Rayleigh fm=200, "
                "MMSE-IRC, LDPC L=16, 20 slots x 6 SNR points, warm "
                "executables"),
        total_sweep_s=round(total, 3),
        slots_per_s=round(n_slots_total / total, 1),
        stages={name: dict(calls=s.calls, seconds=round(s.seconds, 3),
                           items=s.items, unit=s.unit)
                for name, s in sorted(prof.stats.items())},
    )
    out = REPO / "out" / "profile_pdsch_sim_r05.json"
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
