"""PDSCH side-by-side BLER parity vs the REFERENCE sim at a
discriminating operating point (VERDICT r3 item 3).

The reference's committed artifact (out/nr_pdsch_throughput.pickle) ran
above the waterfall (BLER 0 everywhere), so round 4 ran the reference
itself at SNR -8..-2 dB (tools/pdsch_ref_run.py ->
out/pdsch_ref_bler.jsonl; ~70 s/trial of pure NumPy — the 40-trial
curve takes hours of CPU). This tool runs the REPO at the identical
config with `trials` fresh one-slot realizations per SNR through the
slot-batched TPU RX, and writes out/pdsch_bler_parity.json with
two-proportion z-scores per (snr, algo).

Config (byte-for-byte the reference NR_PDSCH_throughput_example.py
customized-Rayleigh setup): BW40 scs30, Nt2/Nr4, MCS5 256QAM-table
(16QAM) 2 layers, 20 PRB, sym 2..13, DMRS AddPos1 NumCDM1 nNIDnSCID=1,
one-tap Rayleigh (identity Rspat), 2x-rate DUC/DDC, DFT_symmetric CE
1400/1200 eRB4 (TO comp on, FO est off), LDPC min-sum 0.8/0.3 L=32.

Usage: python tools/pdsch_bler_parity.py [--trials 160]
       [--snrs=-8,-5,-4,-3,-2] [--algos MMSE-IRC,ML2-IRC-soft]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402

select_platform("sweep")

OUT = REPO / "out"
LDPC = dict(L=32, algo="min-sum", alpha=0.8, beta=0.3)
CE = dict(CE_algo="DFT_symmetric", L_symm_left_in_ns=1400,
          L_symm_right_in_ns=1200, eRB=4, enable_TO_comp=True,
          enable_FO_est=False, enable_FO_comp=False)


def build(cell="rayleigh2x4"):
    from python_5gtoolbox_tpu.models import channel as chan_mod
    from python_5gtoolbox_tpu.phy.pdsch import Pdsch
    from python_5gtoolbox_tpu.utils.config import get_default_config, merged
    from python_5gtoolbox_tpu.utils.numerology import (carrier_prb_size,
                                                       fft_size)

    nt, nr = (4, 4) if cell == "tdl4x4corr" else (2, 4)
    carrier = merged(get_default_config("dl_carrier"),
                     dict(BW=40, scs=30, num_of_ant=nt, Nr=nr,
                          maxMIMO_layers=nt, PCI=1,
                          carrier_frequency_in_mhz=3840.0))
    prb = carrier_prb_size(30, 40)
    fs_hz = fft_size(prb) * 30 * 1000 * 2        # reference: 2x base rate
    carrier["samplerate_in_mhz"] = fs_hz / 1e6
    pdsch = merged(get_default_config("pdsch"),
                   dict(mcs_index=5, mcs_table="256QAM", num_of_layers=2,
                        rv=[0], data_source=[], StartSymbolIndex=2,
                        NrOfSymbols=12))
    pdsch["ResAlloType1"].update(RBStart=0, RBSize=20)
    pdsch["DMRS"].update(nNIDnSCID=1, NumCDMGroupsWithoutData=1,
                         DMRSAddPos=1)
    if cell == "tdl4x4corr":
        # 4-ant correlated-MIMO TDL cell (VERDICT r4 item 4) — must
        # mirror tools/pdsch_ref_run.py build_configs_tdl4x4corr
        pdsch["precoding_matrix"] = (
            np.array([[1, 0], [0, 1], [1, 0], [0, -1]],
                     dtype=np.complex64) / np.sqrt(2))
        chan_cfg = chan_mod.gen_channel_model_config(
            model_format="TDL-A",
            Rspat_config=("customized", "uniform", "DL", (0.9, 0.3)),
            Nt=4, Nr=4, DSdesired=100)
    else:
        pdsch["precoding_matrix"] = np.empty(0)
        chan_cfg = chan_mod.gen_channel_model_config(
            model_format="customized",
            Rspat_config=("customized", "uniform", "DL", (0, 0)),
            Nt=2, Nr=4, multi_paths=[[0, 0, "Rayleigh", 0, 0]])
    return carrier, pdsch, chan_cfg, fs_hz, prb


def repo_bler(snrs, algos, trials, batch=40, cell="rayleigh2x4"):
    import jax.numpy as jnp

    from python_5gtoolbox_tpu.models import channel as chan_mod
    from python_5gtoolbox_tpu.phy.pdsch import Pdsch
    from python_5gtoolbox_tpu.waveform import dl as dl_wf
    from python_5gtoolbox_tpu.waveform import rx as rx_wf

    carrier, pdsch_cfg, chan_cfg, fs_hz, prb = build(cell)
    waveform_config = dict(numofslots=1, startSFN=0, startslot=0,
                           samplerate_in_mhz=fs_hz / 1e6)
    slot_size = 14 * 12 * prb
    out = {}
    for snr in snrs:
        t0 = time.time()
        fails = {a: 0 for a in algos}
        done = 0
        while done < trials:
            n = min(batch, trials - done)
            slots = []
            for k in range(n):
                # fresh TB data AND channel per trial, like the
                # reference's per-sim regeneration
                nr_pdsch = Pdsch(dict(pdsch_cfg), carrier)
                _, _, dl, _ = dl_wf.gen_dl_waveform(
                    waveform_config, carrier, nrPdsch_list=[nr_pdsch],
                    return_device=True)
                model = chan_mod.NrChannelModel(
                    chan_cfg, -float(snr),
                    carrier["carrier_frequency_in_mhz"] * 1e6, fs_hz, 30,
                    seed=int(snr * 100) * 131 + 7919 * (done + k))
                rxw = model.filter(dl, return_device=True)
                _, rx_fd = rx_wf.waveform_rx_processing(
                    rxw, carrier, fs_hz, return_device=True)
                slots.append(rx_fd[:, :slot_size])
            stack = jnp.stack(slots)
            for algo in algos:
                nr_pdsch.rvidx = -1
                ok, _ = nr_pdsch.rx_process_batch(
                    stack, [0] * n, {"algo": algo}, dict(LDPC), dict(CE))
                fails[algo] += int(n - np.sum(ok))
            done += n
        for algo in algos:
            out[(float(snr), algo)] = dict(
                fails=fails[algo], trials=trials,
                bler=fails[algo] / trials)
            print(f"repo snr={snr} {algo}: bler={fails[algo]/trials:.3f}"
                  f" ({time.time()-t0:.0f}s)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=160)
    ap.add_argument("--snrs", default="-8,-5,-4,-3,-2")
    ap.add_argument("--algos", default="MMSE-IRC,ML2-IRC-soft")
    ap.add_argument("--cell", default="rayleigh2x4",
                    choices=("rayleigh2x4", "tdl4x4corr"))
    ap.add_argument("--scout", action="store_true",
                    help="repo-only quick sweep (no artifact) to find "
                         "the discriminating SNR region")
    args = ap.parse_args()
    snrs = [float(s) for s in args.snrs.split(",")]
    algos = args.algos.split(",")
    if args.scout:
        repo_bler(snrs, algos, min(args.trials, 40), cell=args.cell)
        return
    repo = repo_bler(snrs, algos, args.trials, cell=args.cell)

    # sum accumulated batch records per (snr, algo) key (the runner
    # appends one line per batch; see tools/pdsch_ref_run.py)
    refs = {}
    ref_file = OUT / "pdsch_ref_bler.jsonl"
    if ref_file.exists():
        for line in ref_file.read_text().splitlines():
            r = json.loads(line)
            if r.get("cell", "rayleigh2x4") != args.cell:
                continue
            k = (float(r["snr_db"]), r["algo"])
            acc = refs.setdefault(k, dict(trials=0, fails=0))
            acc["trials"] += r["trials"]
            acc["fails"] += r["fails"]
    for r in refs.values():
        r["bler"] = r["fails"] / r["trials"]
    details = []
    for (snr, algo), p in sorted(repo.items()):
        d = dict(snr_db=snr, algo=algo, repo_bler=p["bler"],
                 repo_trials=p["trials"])
        r = refs.get((snr, algo))
        if r:
            pool = (r["fails"] + p["fails"]) / (r["trials"] + p["trials"])
            se = np.sqrt(max(pool * (1 - pool), 1e-12)
                         * (1 / r["trials"] + 1 / p["trials"]))
            z = (p["bler"] - r["bler"]) / se if se > 0 else 0.0
            d.update(ref_bler=r["bler"], ref_trials=r["trials"],
                     z=round(float(z), 2))
        details.append(d)
        print(json.dumps(d), flush=True)
    compared = [d for d in details if "z" in d]
    discr = [d for d in compared if 0.0 < d["ref_bler"] < 1.0]
    doc = dict(
        generated_by="tools/pdsch_bler_parity.py",
        cell=args.cell,
        reference_runner="tools/pdsch_ref_run.py (reference NumPy sim "
                         "run this round at a discriminating grid)",
        config="NR_PDSCH_throughput_example.py customized-Rayleigh "
               "point: BW40 scs30 Nt2/Nr4 MCS5(16QAM,256QAM-table) "
               "2-layer 20PRB, DFT_symmetric CE, LDPC min-sum 0.8/0.3 "
               "L=32",
        points=details,
        discriminating_points=len(discr),
        discriminating_in_3sigma=len([d for d in discr
                                      if abs(d["z"]) <= 3.0]),
    )
    out_name = ("pdsch_bler_parity.json" if args.cell == "rayleigh2x4"
                else f"pdsch_bler_parity_{args.cell}.json")
    with open(OUT / out_name, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"in-band {doc['discriminating_in_3sigma']}"
          f"/{doc['discriminating_points']} discriminating points")


if __name__ == "__main__":
    main()
