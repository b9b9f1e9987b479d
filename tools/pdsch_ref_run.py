"""Run the REFERENCE PDSCH throughput sim at a discriminating operating
point (VERDICT r3 item 3) and record its BLER curve.

Config is byte-for-byte the reference's own NR_PDSCH_throughput_example.py
"customized Rayleigh" setup (Nt2/Nr4, MCS5 256QAM-table => 16QAM, 20 PRB,
12 sym from 2, DMRS AddPos1 NumCDM1, DFT_symmetric CE 1400/1200 eRB4 with
FO est off, LDPC min-sum alpha=0.8 beta=0.3 L=32) — only the SNR grid is
moved down to where the curve actually discriminates (the committed
reference artifact out/nr_pdsch_throughput.pickle ran at SNR 8..11 dB
where BLER==0 for every algo).

Emits one JSON line per (snr, algo) batch to out/pdsch_ref_bler.jsonl
(append; resumable by skipping already-done keys) so the repo-side
comparison (tools/pdsch_bler_parity.py) can consume partial results.

Usage: python tools/pdsch_ref_run.py [--trials 40] [--algos MMSE-IRC]
       [--snrs -8,-6,-4,-2,0]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
import types

import numpy as np

# the reference imports an absent tests package (unused symbol) — stub it
sys.path.insert(0, "/root/reference")
_m = types.ModuleType("tests"); _m.__path__ = []
_sub = types.ModuleType("tests.nr_pdsch")
_leaf = types.ModuleType("tests.nr_pdsch.test_nr_pdsch_rx_AWGN")
sys.modules.setdefault("tests", _m)
sys.modules.setdefault("tests.nr_pdsch", _sub)
sys.modules.setdefault("tests.nr_pdsch.test_nr_pdsch_rx_AWGN", _leaf)

OUT = pathlib.Path(__file__).resolve().parents[1] / "out"
JSONL = OUT / "pdsch_ref_bler.jsonl"

CE_CONFIG = {"CE_algo": "DFT_symmetric", "L_symm_left_in_ns": 1400,
             "L_symm_right_in_ns": 1200, "eRB": 4, "enable_TO_comp": True,
             "enable_FO_est": False, "enable_FO_comp": False}
CHANNEL_PARAMETER = ["customized", "Rayleigh", 0, 0, 0, 0, 0, [0, 0]]
LDPC_CONFIG = {"L": 32, "algo": "min-sum", "alpha": 0.8, "beta": 0.3}


def build_configs():
    from py5gphy.common import nr_slot
    from scripts.internal import default_config_files

    Nt, Nr = 2, 4
    BW, scs = 40, 30
    prb = nr_slot.get_carrier_prb_size(scs, BW)
    fs = nr_slot.get_FFT_IFFT_size(prb) * scs * 1000 * 2
    d = default_config_files.read_DL_default_config_files()
    wf, car, pdsch = (d["DL_waveform_config"], d["DL_carrier_config"],
                      d["pdsch_config"])
    wf.update(numofslots=1, startSFN=0, startslot=0,
              samplerate_in_mhz=fs / 1e6)
    car.update(BW=BW, scs=scs, PCI=1, carrier_frequency_in_mhz=3840.0,
               num_of_ant=Nt, Nr=Nr, maxMIMO_layers=Nt)
    pdsch["mcs_index"] = 5
    pdsch["num_of_layers"] = Nt
    pdsch["ResAlloType1"]["RBSize"] = 20
    pdsch["ResAlloType1"]["RBStart"] = 0
    pdsch["mcs_table"] = "256QAM"
    pdsch["DMRS"]["nNIDnSCID"] = 1
    pdsch["DMRS"]["NumCDMGroupsWithoutData"] = 1
    pdsch["DMRS"]["DMRSAddPos"] = 1
    pdsch["precoding_matrix"] = np.empty(0)
    pdsch["data_source"] = []
    pdsch["rv"] = [0]
    pdsch["StartSymbolIndex"] = 2
    pdsch["NrOfSymbols"] = 12
    pdsch["codebook"]["enable"] = "False"
    return wf, car, pdsch


def build_configs_tdl4x4corr():
    """4-ant correlated-MIMO TDL cell (VERDICT r4 item 4): Nt=4/Nr=4,
    2 layers through an explicit rank-2 precoder, TDL-A DS=100ns with
    Kronecker spatial correlation alpha=0.9/beta=0.3 ("medium" DL per
    TS 38.101-4 B.2.3.1; reference builds it via the customized
    [alpha, beta] path of nr_spatial_correlation_matrix.py:18)."""
    wf, car, pdsch = build_configs()
    car.update(num_of_ant=4, Nr=4, maxMIMO_layers=4)
    pdsch["num_of_layers"] = 2
    pdsch["precoding_matrix"] = PREC_4X2
    return wf, car, pdsch


# TS 38.211-style rank-2/4-ant precoder (columns orthogonal, unit power)
PREC_4X2 = (np.array([[1, 0], [0, 1], [1, 0], [0, -1]], dtype=np.complex64)
            / np.sqrt(2))

CELLS = {
    "rayleigh2x4": (build_configs, CHANNEL_PARAMETER),
    "tdl4x4corr": (build_configs_tdl4x4corr,
                   ["TDL-A", 0, 0, 0, 0, 100, [0.9, 0.3]]),
}


def done_trials(jsonl, cell):
    """Total accumulated reference trials per (snr, algo) key, summed
    across batch lines (accumulation support: each run appends batch
    records; totals are summed here and in tools/pdsch_bler_parity.py)."""
    totals = {}
    if not jsonl.exists():
        return totals
    for line in jsonl.read_text().splitlines():
        try:
            d = json.loads(line)
        except Exception:
            continue
        if d.get("cell", "rayleigh2x4") != cell:
            continue
        k = (d["snr_db"], d["algo"])
        totals[k] = totals.get(k, 0) + d["trials"]
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=40,
                    help="TOTAL trials target per (snr, algo); existing "
                         "jsonl lines count toward it")
    ap.add_argument("--batch", type=int, default=8,
                    help="trials per appended jsonl record")
    ap.add_argument("--algos", default="MMSE-IRC")
    ap.add_argument("--snrs", default="-8,-6,-4,-2,0")
    ap.add_argument("--cell", default="rayleigh2x4", choices=sorted(CELLS))
    args = ap.parse_args()
    algos = args.algos.split(",")
    snrs = [float(s) for s in args.snrs.split(",")]

    from scripts.internal import sim_pdsch_throughput_internal as simint

    build, chan_param = CELLS[args.cell]
    wf, car, pdsch = build()
    OUT.mkdir(exist_ok=True)
    # round-robin over SNRs one batch at a time so an early kill leaves
    # a balanced trial count at every point
    while True:
        done = done_trials(JSONL, args.cell)
        work = [(snr, [a for a in algos
                       if done.get((snr, a), 0) < args.trials])
                for snr in snrs]
        work = [(snr, todo) for snr, todo in work if todo]
        if not work:
            break
        for snr, todo in work:
            n = min(args.batch,
                    max(args.trials - done.get((snr, a), 0) for a in todo))
            fails = {a: 0 for a in todo}
            t0 = time.time()
            for trial in range(n):
                nrPdsch, rx_fd, slot, H, cov, est = \
                    simint.pdsch_before_CEQ_processing(
                        wf, car, pdsch, chan_param, CE_CONFIG, -snr)
                for algo in todo:
                    status, _, _, est = simint.pdsch_CEQ_processing(
                        nrPdsch, rx_fd, slot, H, cov, dict(LDPC_CONFIG),
                        est, {"algo": algo})
                    fails[algo] += int(not status)
                print(f"snr={snr} trial={trial} "
                      + " ".join(f"{a}:fails={fails[a]}" for a in todo),
                      flush=True)
            for algo in todo:
                rec = dict(snr_db=snr, algo=algo, trials=n,
                           fails=fails[algo], bler=fails[algo] / n,
                           cell=args.cell,
                           wall_s=round(time.time() - t0, 1))
                with open(JSONL, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print("BATCH " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
