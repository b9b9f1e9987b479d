"""Measure the PUSCH sweep software-pipeline speedup (VERDICT r4 item 7).

Runs the _2_11-shaped PUSCH sweep on the warm TPU twice:
  * pipelined  — run_pusch_throughput's default: decodes dispatch with
    fetch=False, every point's ok flags come back in one stacked
    transfer at sweep end (device decode overlaps next point's
    TX/channel staging);
  * serialized — same stages, but each point's flags are fetched
    (synchronized) before the next point is staged.
Writes out/pp_overlap_pusch_r05.json.
"""
from __future__ import annotations

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
SNRS = [0, 1, 2, 3, 4, 5, 6, 7]
N_SLOTS = 20


def build():
    with open("/root/reference/out/nr_pusch_throughput_2_11.pickle",
              "rb") as f:
        d = pickle.load(f)
    _, _, _, wf, car, pusch, _, ce = d
    chan = {"type": "AWGN", "Rspat": np.eye(
        int(car["num_of_ant"]) * int(car["Nr"]), dtype=np.complex64)}
    from python_5gtoolbox_tpu.models import channel as chan_mod
    chan = chan_mod.gen_channel_model_config(
        model_format="customized", Nt=car["num_of_ant"], Nr=car["Nr"],
        multi_paths=[[0, 0, "Rayleigh", 0, 0]], fm_inHz=200)
    return dict(car), dict(pusch), chan, dict(ce)


def run_sweep(pipelined: bool):
    from scripts.internal import sim_pusch_throughput_internal as pusim

    car, pusch, chan, ce = build()
    kw = dict(snr_db_list=SNRS, ceq_algo_list=["MMSE-IRC"],
              n_slots=N_SLOTS, ce_config=ce,
              ldpc_config=dict(L=16, algo="min-sum", alpha=0.8, beta=0.3))
    if pipelined:
        t0 = time.perf_counter()
        pusim.run_pusch_throughput(car, pusch, chan, seed=5, **kw)
        return time.perf_counter() - t0
    # serialized: stage + decode + SYNC per point
    t0 = time.perf_counter()
    for i, snr in enumerate(SNRS):
        nr_pusch, slots, rx_fd = pusim.pusch_before_ceq_processing(
            car, pusch, chan, -snr, N_SLOTS, 5 + 7919 * i,
            ce, do_ce=False, return_full=True)
        import jax.numpy as jnp
        slot_size = slots[0][0].shape[-1]
        stack = jnp.swapaxes(
            rx_fd[:, :N_SLOTS * slot_size].reshape(
                rx_fd.shape[0], N_SLOTS, slot_size), 0, 1)
        nr_pusch.rvidx = -1
        ok, _ = nr_pusch.rx_process_batch(
            stack, [s[4] for s in slots], {"algo": "MMSE-IRC"},
            dict(L=16, algo="min-sum", alpha=0.8, beta=0.3), ce,
            fetch=True)                 # <- synchronizes every point
        int(np.sum(ok))
    return time.perf_counter() - t0


def main():
    run_sweep(True)    # warm compiles
    run_sweep(False)
    t_pipe = min(run_sweep(True) for _ in range(3))
    t_serial = min(run_sweep(False) for _ in range(3))
    doc = dict(
        generated_by="tools/pusch_pp_overlap.py",
        config=f"_2_11 PUSCH sweep, {len(SNRS)} SNR x {N_SLOTS} slots, "
               "1-tap Rayleigh fm=200, MMSE-IRC, LDPC L=16, warm TPU",
        pipelined_s=round(t_pipe, 3),
        serialized_s=round(t_serial, 3),
        speedup=round(t_serial / t_pipe, 3),
        slots_per_s_pipelined=round(len(SNRS) * N_SLOTS / t_pipe, 1),
        note="pipelined = fetch=False dispatch + one stacked ok fetch "
             "at sweep end; serialized = per-point synchronized fetch",
    )
    with open(OUT / "pp_overlap_pusch_r05.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
