"""Chip-vs-CPU timing of the link-level sims with the slot-batched RX.

Round-4 re-measurement of out/tpu_vs_cpu_sim.json (VERDICT r3 items 1c
and Weak 3): same two pipelines as round 3 —
  (a) PDSCH 20-slot sweep (BW20 scs30 Nt2/Nr4 QPSK, one-tap Rayleigh
      fm=200, DFT CE, MMSE-IRC, LDPC L=16)
  (b) PUSCH _2_11 10-trial loop (the reference artifact's config,
      DFT_symmetric CE, MMSE-IRC, LDPC min-sum 0.8/0.3 L=32)
— but the RX now runs as ONE jitted dispatch per sweep
(rx_process_batch) instead of hundreds of per-slot calls.

Run per platform, then merge:
    python tools/tpu_vs_cpu.py --platform cpu
    PY5G_FORCE_TPU=1 python tools/tpu_vs_cpu.py --platform tpu
    python tools/tpu_vs_cpu.py --merge
Each platform run writes out/tpu_vs_cpu_<platform>.json with cold +
warm wall times and the decode outcomes (for cross-platform identity
checking); --merge combines them into out/tpu_vs_cpu_sim.json.
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
OUT = REPO / "out"


def case_pdsch():
    from python_5gtoolbox_tpu.models import channel as chan_mod
    from python_5gtoolbox_tpu.utils.config import get_default_config, merged
    from scripts.internal import sim_pdsch_throughput_internal as pdsim

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
    ce = dict(CE_algo="DFT", L_symm_left_in_ns=200, L_symm_right_in_ns=200,
              eRB=2, enable_TO_comp=True, enable_FO_est=True,
              enable_FO_comp=True)
    ldpc = dict(L=16, algo="min-sum", alpha=0.8, beta=0.3)

    def run():
        return pdsim.run_pdsch_throughput(
            carrier, pdsch, chan, [2.0], ["MMSE-IRC"], n_slots=20,
            ce_config=ce, ldpc_config=ldpc, seed=3)["MMSE-IRC"]

    return ("PDSCH 20-slot sweep (BW20 scs30 Nt2/Nr4 QPSK, one-tap "
            "Rayleigh fm=200, DFT CE, MMSE-IRC, LDPC L=16, batched RX)",
            run)


def case_pusch():
    from python_5gtoolbox_tpu.models import channel as chan_mod
    from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
    from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size
    from python_5gtoolbox_tpu.waveform import rx as rx_wf
    from python_5gtoolbox_tpu.waveform import ul as ul_wf

    with open("/root/reference/out/nr_pusch_throughput_2_11.pickle",
              "rb") as f:
        d = pickle.load(f)
    _, _, _, wf, car, pusch, chan_param, ce = d
    scs = car["scs"]
    prb = carrier_prb_size(scs, car["BW"])
    fs_hz = wf["samplerate_in_mhz"] * 1e6
    fmt, dist, timeoff, rho, fm, fdo, kdb, (alpha, beta) = chan_param
    chan_cfg = chan_mod.gen_channel_model_config(
        model_format=fmt,
        Rspat_config=("customized", "uniform", "DL", (alpha, beta)),
        Nt=car["num_of_ant"], Nr=car["Nr"], Timeoff_ns=timeoff, rho=rho,
        fm_inHz=fm, multi_paths=[[0, 0, dist, kdb, fdo]], fDo_in_Hz=fdo)
    waveform_config = dict(numofslots=1, startSFN=0, startslot=0,
                           samplerate_in_mhz=fs_hz / 1e6)
    nr_pusch = NrPUSCH(dict(car), dict(pusch))
    slot_size = 14 * 12 * prb
    ldpc = dict(L=32, algo="min-sum", alpha=0.8, beta=0.3)

    def run():
        import jax.numpy as jnp

        # TX once, 10 channel realizations; everything device-resident
        _, _, ul = ul_wf.gen_ul_waveform(waveform_config, dict(car),
                                         nrPusch_list=[nr_pusch],
                                         return_device=True)
        slots = []
        for trial in range(10):
            model = chan_mod.NrChannelModel(
                chan_cfg, -4.0, car["carrier_frequency_in_mhz"] * 1e6,
                fs_hz, scs, seed=trial * 37)
            rx = model.filter(ul, return_device=True)
            _, rx_fd = rx_wf.waveform_rx_processing(
                rx, dict(car), fs_hz, return_device=True)
            slots.append(rx_fd[:, :slot_size])
        nr_pusch.rvidx = -1
        ok, _ = nr_pusch.rx_process_batch(
            jnp.stack(slots), [0] * 10, {"algo": "MMSE-IRC"}, ldpc,
            dict(ce))
        return [float(np.mean(ok))]

    return ("PUSCH _2_11 10-trial loop (BW40 scs30 Nt2/Nr4 16QAM, "
            "122.88 Msps DUC/DDC, DFT_symmetric CE, MMSE-IRC, LDPC "
            "L=32, batched RX)", run)


def measure(platform: str):
    from python_5gtoolbox_tpu.utils.platform import (
        use_cpu_for_host_pipelines)

    if platform == "cpu":
        use_cpu_for_host_pipelines()
    else:
        from python_5gtoolbox_tpu.utils.platform import (
            enable_persistent_compile_cache)
        enable_persistent_compile_cache()

    results = []
    for name, runner in (case_pdsch(), case_pusch()):
        t0 = time.time()
        out0 = runner()
        cold = time.time() - t0
        warm = []
        for _ in range(2):
            t0 = time.time()
            out = runner()
            warm.append(round(time.time() - t0, 2))
            assert out == out0
        results.append(dict(pipeline=name,
                            cold_first_run_s=round(cold, 1),
                            warm_s=warm, outcomes=out0))
        print(json.dumps(results[-1]), flush=True)
    OUT.mkdir(exist_ok=True)
    with open(OUT / f"tpu_vs_cpu_{platform}.json", "w") as f:
        json.dump(results, f, indent=1)


def merge():
    with open(OUT / "tpu_vs_cpu_cpu.json") as f:
        cpu = json.load(f)
    with open(OUT / "tpu_vs_cpu_tpu.json") as f:
        tpu = json.load(f)
    cases = []
    for c, t in zip(cpu, tpu):
        assert c["pipeline"] == t["pipeline"]
        cases.append(dict(
            pipeline=c["pipeline"],
            tpu_axon_s=dict(cold_first_run=t["cold_first_run_s"],
                            warm=t["warm_s"]),
            cpu_s=dict(cold_first_run=c["cold_first_run_s"],
                       warm=c["warm_s"]),
            decode_outcomes_identical=c["outcomes"] == t["outcomes"]))
    tpu_wins = all(min(x["tpu_axon_s"]["warm"]) < min(x["cpu_s"]["warm"])
                   for x in cases)
    doc = dict(
        purpose=("VERDICT r3 item 1c: chip-vs-CPU timing of the "
                 "link-level sims after the RX was restructured into "
                 "one jitted dispatch per sweep (rx_process_batch, "
                 "device-side ce_jax CE)."),
        measured_utc=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        cases=cases,
        tpu_wins_warm=tpu_wins,
        conclusion=(
            "With the slot-batched one-dispatch RX the warm TPU beats "
            "the 2-vCPU host on both sweeps; utils/platform.py now "
            "defaults batched sweeps to the accelerator "
            "(PY5G_FORCE_CPU=1 restores the old routing)." if tpu_wins
            else
            "The warm TPU still does not beat the 2-vCPU host on every "
            "sweep; the CPU default stands (PY5G_FORCE_TPU=1 opts in)."))
    with open(OUT / "tpu_vs_cpu_sim.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"])
    ap.add_argument("--merge", action="store_true")
    args = ap.parse_args()
    if args.merge:
        merge()
    else:
        assert args.platform
        measure(args.platform)


if __name__ == "__main__":
    main()
