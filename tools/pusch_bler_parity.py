"""PUSCH link-level BLER parity vs the reference's published _2_11 curve.

SURVEY.md section 7 phase-6 gate / VERDICT r2 item 2. The reference's
committed artifact /root/reference/out/nr_pusch_throughput_2_11.pickle
holds a real (discriminating) BLER curve:

    MMSE-IRC, Nt=2 Nr=4, 2 layers, BW40 scs30, 20 PRB, 11 symbols,
    256QAM-table MCS 5 (16QAM), DMRS AddPos1, one-tap static Rayleigh
    (identity Rspat, no impairments), DFT_symmetric CE (1400/1200 ns,
    eRB 4), LDPC min-sum alpha=0.8 beta=0.3 L=32, 40 one-slot sims per
    SNR, SNR 0..7 dB -> BLER (failed_counts / num_of_sim)
    0.775/0.625/0.35/0.325/0.125/0.075/0.0/0.025.

This tool reruns the exact operating point with the repo stack
(configs loaded from the reference pickle itself for provenance),
`trials` fresh one-slot channel realizations per SNR, and reports
per-SNR two-proportion z-scores vs the reference curve.

Writes out/pusch_bler_parity.json.

Usage: python tools/pusch_bler_parity.py [--trials 160] [--quick]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import use_cpu_for_host_pipelines

use_cpu_for_host_pipelines()

REPO = pathlib.Path(__file__).resolve().parents[1]
REF_PICKLE = pathlib.Path(
    "/root/reference/out/nr_pusch_throughput_2_11.pickle")
OUT = REPO / "out"

LDPC_CONFIG = dict(L=32, algo="min-sum", alpha=0.8, beta=0.3)


def load_reference():
    with open(REF_PICKLE, "rb") as f:
        d = pickle.load(f)
    bler, snrs, algos, wf, car, pusch, chan_param, ce = d
    assert algos == ["MMSE-IRC"]
    return (np.asarray(bler)[0], list(snrs), wf, car, pusch, chan_param,
            dict(ce))


def run(trials: int):
    import jax
    from python_5gtoolbox_tpu.models import channel as chan_mod
    from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
    from python_5gtoolbox_tpu.rx.channel_estimate import NrChannelEstimation
    from python_5gtoolbox_tpu.utils.numerology import (carrier_prb_size,
                                                       fft_size)
    from python_5gtoolbox_tpu.waveform import rx as rx_wf
    from python_5gtoolbox_tpu.waveform import ul as ul_wf

    ref_bler, snrs, wf, car, pusch, chan_param, ce_cfg = load_reference()
    scs, bw = car["scs"], car["BW"]
    prb = carrier_prb_size(scs, bw)
    fs_hz = wf["samplerate_in_mhz"] * 1e6     # 2x base rate (122.88 Msps)

    # reference channel_parameter (customized):
    # [format, channel, Timeoff_ns, rho, fm, fDo, K, [alpha, beta]]
    fmt, dist, timeoff, rho, fm, fdo, kdb, (alpha, beta) = chan_param
    chan_cfg = chan_mod.gen_channel_model_config(
        model_format=fmt,
        Rspat_config=("customized", "uniform", "DL", (alpha, beta)),
        Nt=car["num_of_ant"], Nr=car["Nr"], Timeoff_ns=timeoff, rho=rho,
        fm_inHz=fm, multi_paths=[[0, 0, dist, kdb, fdo]], fDo_in_Hz=fdo)

    waveform_config = dict(numofslots=1, startSFN=0, startslot=0,
                           samplerate_in_mhz=fs_hz / 1e6)
    nr_pusch = NrPUSCH(dict(car), dict(pusch))
    fd, td, ul = ul_wf.gen_ul_waveform(waveform_config, dict(car),
                                       nrPusch_list=[nr_pusch])

    slot_size = 14 * 12 * prb
    repo_tput = []
    details = []
    for i_snr, snr in enumerate(snrs):
        t0 = time.time()
        npass = 0
        for trial in range(trials):
            model = chan_mod.NrChannelModel(
                chan_cfg, -float(snr),
                car["carrier_frequency_in_mhz"] * 1e6, fs_hz, scs,
                seed=i_snr * 100003 + trial)
            rx = model.filter(ul)
            _, rx_fd = rx_wf.waveform_rx_processing(rx, dict(car), fs_hz)
            rx_slot = rx_fd[:, :slot_size]
            h_ls, rs_info = nr_pusch.H_LS_est(rx_slot, 0)
            rs_info.setdefault("scs", scs)
            est = NrChannelEstimation(h_ls, rs_info, dict(ce_cfg))
            H, cov = est.channel_est()
            nr_pusch.rvidx = -1
            ok, _, _, _ = nr_pusch.RX_process(
                rx_slot, 0, {"algo": "MMSE-IRC"}, H, cov,
                dict(LDPC_CONFIG), est)
            npass += int(ok)
        p_repo = 1.0 - npass / trials          # BLER
        p_ref = float(ref_bler[i_snr])
        # two-proportion pooled z (reference ran 40 sims per SNR)
        n_ref = 40
        pool = (p_repo * trials + p_ref * n_ref) / (trials + n_ref)
        se = np.sqrt(max(pool * (1 - pool), 1e-12)
                     * (1 / trials + 1 / n_ref))
        z = (p_repo - p_ref) / se if se > 0 else 0.0
        repo_tput.append(p_repo)
        details.append(dict(snr_db=float(snr), repo_bler=p_repo,
                            ref_bler=p_ref, z=round(float(z), 2),
                            trials=trials,
                            wall_s=round(time.time() - t0, 1)))
        print(json.dumps(details[-1]), flush=True)

    in_band = [d for d in details
               if 0.0 < d["ref_bler"] < 1.0 and abs(d["z"]) <= 3.0]
    discr = [d for d in details if 0.0 < d["ref_bler"] < 1.0]
    summary = dict(
        generated_by="tools/pusch_bler_parity.py",
        reference_artifact=str(REF_PICKLE),
        reference_script="scripts/NR_PUSCH_throughput_example.py",
        config="_2_11: MMSE-IRC Nt2/Nr4 2-layer 16QAM(mcs5/256QAM-table) "
               "20PRB 11sym one-tap static Rayleigh, DFT_symmetric CE, "
               "LDPC mixed-MS 0.8/0.3 L=32",
        snr_db=list(map(float, snrs)),
        ref_bler=[float(x) for x in ref_bler],
        repo_bler=repo_tput,
        trials_per_snr=trials,
        ref_trials_per_snr=40,
        points_in_3sigma_of_discriminating=len(in_band),
        discriminating_points=len(discr),
        details=details,
    )
    OUT.mkdir(exist_ok=True)
    with open(OUT / "pusch_bler_parity.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"in-band {len(in_band)}/{len(discr)} discriminating points")
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=160)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    run(20 if args.quick else args.trials)


if __name__ == "__main__":
    main()
