"""Repo-vs-reference PUSCH BLER parity under a TIME-VARYING fading
channel (VERDICT r3 item 4 / Weak 5).

Cell: the reference's _2_11 operating point with the channel swapped
to TDL-A (DS 100 ns) at f_m = 30 Hz and Timeoff_ns = 20 — real
timing-offset + Doppler impairments exercising the sum-of-sinusoids
fading generator, TO estimator and CE time-tracking against the
reference implementation. Reference side: tools/pusch_fading_ref_run.py
(out/pusch_fading_ref.jsonl). Repo side here runs `trials` fresh
one-slot realizations per SNR through the slot-batched RX and writes
out/pusch_fading_parity.json with two-proportion z-scores.

Usage: python tools/pusch_fading_parity.py [--trials 160] [--snrs 5]
       [--scout]   (scout: quick 3-SNR repo-only sweep to locate the
                    discriminating region)
"""
from __future__ import annotations

import argparse
import json
import pathlib
import pickle
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402

select_platform("sweep")

OUT = REPO / "out"
FM_HZ, TIMEOFF_NS = 30.0, 20.0
LDPC = dict(L=32, algo="min-sum", alpha=0.8, beta=0.3)


def repo_bler(snrs, trials, batch=40):
    import jax.numpy as jnp

    from python_5gtoolbox_tpu.models import channel as chan_mod
    from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
    from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size
    from python_5gtoolbox_tpu.waveform import rx as rx_wf
    from python_5gtoolbox_tpu.waveform import ul as ul_wf

    with open("/root/reference/out/nr_pusch_throughput_2_11.pickle",
              "rb") as f:
        d = pickle.load(f)
    _, _, _, wf, car, pusch, _, ce = d
    scs = car["scs"]
    prb = carrier_prb_size(scs, car["BW"])
    fs_hz = wf["samplerate_in_mhz"] * 1e6
    chan_cfg = chan_mod.gen_channel_model_config(
        model_format="TDL-A",
        Rspat_config=("customized", "uniform", "DL", (0, 0)),
        Nt=car["num_of_ant"], Nr=car["Nr"], Timeoff_ns=TIMEOFF_NS,
        rho=0, fm_inHz=FM_HZ, DSdesired=100)
    waveform_config = dict(numofslots=1, startSFN=0, startslot=0,
                           samplerate_in_mhz=fs_hz / 1e6)
    slot_size = 14 * 12 * prb
    out = {}
    for snr in snrs:
        t0 = time.time()
        fails = 0
        done = 0
        while done < trials:
            n = min(batch, trials - done)
            slots = []
            for k in range(n):
                # fresh TB payload + DMRS realization per trial, matching
                # the reference runner's per-trial TX regeneration
                # (ADVICE r4 finding 4)
                nr_pusch = NrPUSCH(dict(car), dict(pusch))
                _, _, ul = ul_wf.gen_ul_waveform(
                    waveform_config, dict(car), nrPusch_list=[nr_pusch],
                    return_device=True)
                model = chan_mod.NrChannelModel(
                    chan_cfg, -float(snr),
                    car["carrier_frequency_in_mhz"] * 1e6, fs_hz, scs,
                    seed=int(snr * 1000) + 7919 * (done + k))
                rxw = model.filter(ul, return_device=True)
                _, rx_fd = rx_wf.waveform_rx_processing(
                    rxw, dict(car), fs_hz, return_device=True)
                slots.append(rx_fd[:, :slot_size])
            nr_pusch.rvidx = -1
            ok, _ = nr_pusch.rx_process_batch(
                jnp.stack(slots), [0] * n, {"algo": "MMSE-IRC"},
                dict(LDPC), dict(ce))
            fails += int(n - np.sum(ok))
            done += n
        out[float(snr)] = dict(fails=fails, trials=trials,
                               bler=fails / trials,
                               wall_s=round(time.time() - t0, 1))
        print(f"repo snr={snr}: bler={fails / trials:.3f} "
              f"({out[float(snr)]['wall_s']}s)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=160)
    ap.add_argument("--snrs", default="5")
    ap.add_argument("--scout", action="store_true")
    args = ap.parse_args()
    if args.scout:
        repo_bler([float(s) for s in args.snrs.split(",")], 40)
        return
    snrs = [float(s) for s in args.snrs.split(",")]
    repo = repo_bler(snrs, args.trials)

    # sum accumulated batch records per SNR (the runner appends one
    # line per batch; see tools/pusch_fading_ref_run.py)
    refs = {}
    for line in (OUT / "pusch_fading_ref.jsonl").read_text().splitlines():
        r = json.loads(line)
        if r.get("fm_hz") != FM_HZ or r.get("timeoff_ns") != TIMEOFF_NS:
            continue
        acc = refs.setdefault(float(r["snr_db"]),
                              dict(trials=0, fails=0))
        acc["trials"] += r["trials"]
        acc["fails"] += r["fails"]
    for r in refs.values():
        r["bler"] = r["fails"] / r["trials"]
    details = []
    for snr in snrs:
        if snr not in refs:
            continue
        r, p = refs[snr], repo[snr]
        n_ref, n_repo = r["trials"], p["trials"]
        pool = (r["fails"] + p["fails"]) / (n_ref + n_repo)
        se = np.sqrt(max(pool * (1 - pool), 1e-12)
                     * (1 / n_ref + 1 / n_repo))
        z = (p["bler"] - r["bler"]) / se if se > 0 else 0.0
        details.append(dict(snr_db=snr, repo_bler=p["bler"],
                            ref_bler=r["bler"], z=round(float(z), 2),
                            repo_trials=n_repo, ref_trials=n_ref))
        print(json.dumps(details[-1]), flush=True)
    doc = dict(
        generated_by="tools/pusch_fading_parity.py",
        reference_runner="tools/pusch_fading_ref_run.py",
        config=("_2_11 operating point, channel TDL-A DS100ns "
                f"fm={FM_HZ}Hz Timeoff={TIMEOFF_NS}ns, MMSE-IRC, "
                "DFT_symmetric CE, LDPC min-sum 0.8/0.3 L=32"),
        points=details,
        in_3sigma=[d["snr_db"] for d in details if abs(d["z"]) <= 3.0],
    )
    with open(OUT / "pusch_fading_parity.json", "w") as f:
        json.dump(doc, f, indent=1)
    print("written out/pusch_fading_parity.json")


if __name__ == "__main__":
    main()
