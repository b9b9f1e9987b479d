"""Run the REFERENCE PUSCH sim on a TIME-VARYING fading channel
(VERDICT r3 item 4: TDL-A at f_m > 0 with a real timing-offset
impairment) and record its BLER.

Config = the reference's committed _2_11 operating point
(out/nr_pusch_throughput_2_11.pickle: MMSE-IRC, Nt2/Nr4, 2 layers,
BW40 scs30, 20 PRB 11 sym, 16QAM, DFT_symmetric CE 1400/1200 eRB4,
LDPC min-sum 0.8/0.3 L=32) with ONLY the channel swapped to
TDL-A (DS 100 ns) at f_m with Timeoff_ns — the cell where the repo's
sum-of-sinusoids fading generator, FO-estimator heuristics and CE
tracking could all diverge from the reference.

Appends one JSON line per SNR to out/pusch_fading_ref.jsonl.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import pickle
import sys
import time
import types

import numpy as np

sys.path.insert(0, "/root/reference")
for name in ("tests", "tests.nr_pdsch",
             "tests.nr_pdsch.test_nr_pdsch_rx_AWGN"):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["tests"].__path__ = []

OUT = pathlib.Path(__file__).resolve().parents[1] / "out"
JSONL = OUT / "pusch_fading_ref.jsonl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--snrs", default="5")
    ap.add_argument("--fm", type=float, default=30.0)
    ap.add_argument("--timeoff-ns", type=float, default=20.0)
    ap.add_argument("--batch", type=int, default=8,
                    help="trials per appended jsonl record; --trials is "
                         "the accumulated TOTAL target per SNR")
    args = ap.parse_args()

    from scripts.internal import sim_pusch_throughput_internal as simint

    with open("/root/reference/out/nr_pusch_throughput_2_11.pickle",
              "rb") as f:
        d = pickle.load(f)
    _, _, _, wf, car, pusch, _, ce = d
    # TDL channel_parameter layout (NR_PUSCH_throughput_example.py):
    # [format, Timeoff_ns, rho, fm, fDo, DSdesired, [alpha, beta]]
    chan_param = ["TDL-A", args.timeoff_ns, 0, args.fm, 0, 100, [0, 0]]
    ldpc = {"L": 32, "algo": "min-sum", "alpha": 0.8, "beta": 0.3}

    snrs = [float(s) for s in args.snrs.split(",")]
    OUT.mkdir(exist_ok=True)

    def done_trials():
        totals = {s: 0 for s in snrs}
        if JSONL.exists():
            for line in JSONL.read_text().splitlines():
                try:
                    r = json.loads(line)
                except Exception:
                    continue
                if (r.get("fm_hz") == args.fm
                        and r.get("timeoff_ns") == args.timeoff_ns
                        and r["snr_db"] in totals):
                    totals[r["snr_db"]] += r["trials"]
        return totals

    # round-robin one batch per SNR so an early kill leaves balanced counts
    while True:
        totals = done_trials()
        todo = [s for s in snrs if totals[s] < args.trials]
        if not todo:
            break
        for snr in todo:
            n = min(args.batch, args.trials - totals[snr])
            t0 = time.time()
            fails = 0
            for trial in range(n):
                nrP, rx_fd, slot, H, cov, est = \
                    simint.pusch_before_CEQ_processing(
                        dict(wf), dict(car), dict(pusch), chan_param,
                        dict(ce), -snr)
                status, _, _, est = simint.pusch_CEQ_processing(
                    nrP, rx_fd, slot, H, cov, dict(ldpc), est,
                    {"algo": "MMSE-IRC"})
                fails += int(not status)
                print(f"snr={snr} trial={trial} fails={fails}", flush=True)
            rec = dict(snr_db=snr, algo="MMSE-IRC", trials=n,
                       fails=fails, bler=fails / n,
                       fm_hz=args.fm, timeoff_ns=args.timeoff_ns,
                       channel="TDL-A DS100ns",
                       wall_s=round(time.time() - t0, 1))
            with open(JSONL, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print("BATCH " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
