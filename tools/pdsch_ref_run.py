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


def done_keys():
    if not JSONL.exists():
        return set()
    keys = set()
    for line in JSONL.read_text().splitlines():
        try:
            d = json.loads(line)
            keys.add((d["snr_db"], d["algo"]))
        except Exception:
            pass
    return keys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--algos", default="MMSE-IRC")
    ap.add_argument("--snrs", default="-8,-6,-4,-2,0")
    args = ap.parse_args()
    algos = args.algos.split(",")
    snrs = [float(s) for s in args.snrs.split(",")]

    from scripts.internal import sim_pdsch_throughput_internal as simint

    wf, car, pdsch = build_configs()
    OUT.mkdir(exist_ok=True)
    done = done_keys()
    for snr in snrs:
        todo = [a for a in algos if (snr, a) not in done]
        if not todo:
            continue
        fails = {a: 0 for a in todo}
        t0 = time.time()
        for trial in range(args.trials):
            nrPdsch, rx_fd, slot, H, cov, est = \
                simint.pdsch_before_CEQ_processing(
                    wf, car, pdsch, CHANNEL_PARAMETER, CE_CONFIG, -snr)
            for algo in todo:
                status, _, _, est = simint.pdsch_CEQ_processing(
                    nrPdsch, rx_fd, slot, H, cov, dict(LDPC_CONFIG), est,
                    {"algo": algo})
                fails[algo] += int(not status)
            print(f"snr={snr} trial={trial} "
                  + " ".join(f"{a}:fails={fails[a]}" for a in todo),
                  flush=True)
        for algo in todo:
            rec = dict(snr_db=snr, algo=algo, trials=args.trials,
                       fails=fails[algo],
                       bler=fails[algo] / args.trials,
                       wall_s=round(time.time() - t0, 1))
            with open(JSONL, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print("DONE " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
