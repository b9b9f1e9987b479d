"""PDSCH link-level simulation internals (TX -> channel -> RX).

Behavior parity target: scripts/internal/sim_pdsch_throughput_internal.py
of the reference (pdsch_before_CEQ_processing + per-slot RX loop in
scripts/NR_PDSCH_throughput_example.py:119-157). Call stack mirrored from
SURVEY.md 3.3:
  gen_channel_model_config -> gen_dl_waveform (with Dm timing injection)
  -> NrChannelModel.filter -> rx channel filter + Rx low-PHY
  -> H_LS_est -> NrChannelEstimation -> Pdsch.RX_process.
"""
from __future__ import annotations

import contextlib

import numpy as np

from python_5gtoolbox_tpu.models import channel as chan_mod
from python_5gtoolbox_tpu.phy.pdsch import Pdsch
from python_5gtoolbox_tpu.rx.channel_estimate import (NrChannelEstimation,
                                                      fo_est_valid_for_doppler)
from python_5gtoolbox_tpu.utils.numerology import (carrier_prb_size,
                                                   fft_size, slots_per_frame)
from python_5gtoolbox_tpu.waveform import dl as dl_wf
from python_5gtoolbox_tpu.waveform import rx as rx_wf

DEFAULT_CE_CONFIG = dict(enable_TO_comp=True, enable_FO_est=True,
                         enable_FO_comp=True, CE_algo="DFT",
                         L_symm_left_in_ns=200, L_symm_right_in_ns=200,
                         eRB=2)
DEFAULT_LDPC_CONFIG = dict(L=16, algo="min-sum", alpha=1.0, beta=0.0)


class _NullProfiler:
    @contextlib.contextmanager
    def stage(self, name, items=0.0, unit="items"):
        yield


def pdsch_before_ceq_processing(carrier_config, pdsch_config, chan_cfg,
                                pnoise_db, n_slots=2, seed=0,
                                ce_config=None, prof=None, do_ce=True,
                                return_full=False):
    """TX + channel + Rx low-PHY + channel estimation for each slot.

    Returns (nrPdsch, per-slot list of (rx_fd_slot, H_result, cov_m, est));
    return_full=True appends the full rx_fd waveform as a third element
    (the batched sweep reshapes it into the slot stack in one device op
    instead of stacking 20 slices).
    prof: optional utils.profiling.StageProfiler accumulating per-stage
    wall time (tx_waveform / channel / rx_lowphy / channel_est).
    do_ce=False skips the per-slot NumPy channel estimation (the batched
    RX runs its own jitted CE on device; see rx/ce_jax.py) — allocated
    slots then carry H_result=None like gated ones.
    """
    prof = prof or _NullProfiler()
    ce_config = dict(DEFAULT_CE_CONFIG, **(ce_config or {}))
    scs, bw = carrier_config["scs"], carrier_config["BW"]
    fm = float(chan_cfg.get("fm_inHz", 0) or 0)
    if ce_config.get("enable_FO_est") and not fo_est_valid_for_doppler(
            fm, scs):
        # freq_offset_est contract (rx/channel_estimate.py): above this
        # Doppler the estimator reads fading rotation as CFO and its
        # "compensation" corrupts decode — clamp it off like the
        # reference sims do
        print(f"[sim] fm={fm:.0f} Hz exceeds the FO-estimator's valid "
              f"range at scs{scs}; disabling FO est/comp")
        ce_config["enable_FO_est"] = False
        ce_config["enable_FO_comp"] = False
    prb = carrier_prb_size(scs, bw)
    nfft = fft_size(prb)
    fs_hz = carrier_config["samplerate_in_mhz"] * 1e6 \
        if "samplerate_in_mhz" in carrier_config else nfft * scs * 1000.0

    waveform_config = dict(numofslots=n_slots, startSFN=0, startslot=0,
                           samplerate_in_mhz=fs_hz / 1e6)
    nr_pdsch = Pdsch(pdsch_config, carrier_config)

    model = chan_mod.NrChannelModel(
        chan_cfg, pnoise_db, carrier_config["carrier_frequency_in_mhz"] * 1e6,
        fs_hz, scs, seed=seed)
    dm = model.gen_Dm(n_slots)

    # batched-RX mode (do_ce=False): the waveform, channel and Rx
    # low-PHY stay ON DEVICE end to end; only the decode flags come
    # back (each host round trip costs a ~0.1-0.5 s tunnel transfer)
    dev = not do_ce
    with prof.stage("tx_waveform", items=n_slots, unit="slots"):
        fd, td, dl, _ = dl_wf.gen_dl_waveform(
            waveform_config, carrier_config, nrPdsch_list=[nr_pdsch],
            Dm=dm, return_device=dev)
    with prof.stage("channel", items=dl.shape[-1], unit="samples"):
        rx = model.filter(dl, return_device=dev)
    with prof.stage("rx_lowphy", items=n_slots, unit="slots"):
        _, rx_fd = rx_wf.waveform_rx_processing(rx, carrier_config, fs_hz,
                                                return_device=dev)

    n_sc = 12 * prb
    slot_size = 14 * n_sc
    spf = slots_per_frame(scs)
    per_slot = []
    for idx in range(n_slots):
        # the TX side numbers slots WITHIN the frame (waveform/dl.py:
        # slot = (startslot + idx) % slots_per_frame) — the RX must use
        # the same number or every DMRS c_init is wrong from frame 2 on
        slot = (waveform_config["startslot"] + idx) % spf
        rx_slot = rx_fd[:, idx * slot_size: (idx + 1) * slot_size]
        if not do_ce or (slot % pdsch_config["period_in_slot"]) not in \
                pdsch_config["allocated_slots"]:
            per_slot.append((rx_slot, None, None, None, slot))
            continue
        with prof.stage("channel_est", items=1, unit="slots"):
            h_ls, rs_info = nr_pdsch.H_LS_est(rx_slot, slot)
            rs_info["scs"] = scs
            est = NrChannelEstimation(h_ls, rs_info, ce_config)
            H, cov = est.channel_est()
        per_slot.append((rx_slot, H, cov, est, slot))
    if return_full:
        return nr_pdsch, per_slot, rx_fd
    return nr_pdsch, per_slot


def run_pdsch_throughput(carrier_config, pdsch_config, chan_cfg,
                         snr_db_list, ceq_algo_list, n_slots=2,
                         ce_config=None, ldpc_config=None, seed=0,
                         prof=None, use_batch=True):
    """-> dict algo -> [TB pass-rate per SNR] (+ 'tbs_bits').

    use_batch=True (default) runs the whole RX — CE included — as ONE
    jitted dispatch per (SNR, algo) via Pdsch.rx_process_batch; False
    keeps the reference-shaped per-slot loop (NumPy CE + per-slot
    RX_process), the path retransmission/HARQ studies need.
    """
    ldpc_config = dict(DEFAULT_LDPC_CONFIG, **(ldpc_config or {}))
    ce_cfg_full = dict(DEFAULT_CE_CONFIG, **(ce_config or {}))
    fm = float(chan_cfg.get("fm_inHz", 0) or 0)
    if ce_cfg_full.get("enable_FO_est") and not fo_est_valid_for_doppler(
            fm, carrier_config["scs"]):
        # same clamp pdsch_before_ceq_processing applies (FO-estimator
        # Doppler contract, rx/channel_estimate.py)
        ce_cfg_full["enable_FO_est"] = False
        ce_cfg_full["enable_FO_comp"] = False
    prof_ = prof or _NullProfiler()
    results = {algo: [] for algo in ceq_algo_list}
    # deferred-fetch queue: decode dispatches stay on the device for the
    # WHOLE sweep and all ok flags come back in ONE stacked transfer at
    # the end — on the axon tunnel every small fetch costs a full
    # round-trip, which dominated the r4 sweep (6 points = 6 syncs)
    pending = []     # [(snr, n_alloc, {algo: device ok flags} | None)]

    def fetch_pending():
        if not pending:
            return
        import jax.numpy as jnp
        chunks = [oks[algo] for _, _, oks in pending if oks
                  for algo in ceq_algo_list]
        flat = np.asarray(jnp.concatenate(chunks)) if chunks else None
        off = 0
        for snr_p, ntot, oks in pending:
            for algo in ceq_algo_list:
                if oks is None:
                    results[algo].append(0.0)
                    print(f"PDSCH snr={snr_p:+.1f}dB {algo}: "
                          f"0/0 TB passed")
                    continue
                npass = int(np.sum(flat[off: off + ntot]))
                off += ntot
                results[algo].append(npass / max(ntot, 1))
                print(f"PDSCH snr={snr_p:+.1f}dB {algo}: "
                      f"{npass}/{ntot} TB passed")
        pending.clear()

    for i_snr, snr in enumerate(snr_db_list):
        # fresh channel trajectory per SNR point: a shared seed would
        # make every point ride the SAME fade sequence and cap the
        # whole curve at that trajectory's outage fraction
        out = pdsch_before_ceq_processing(
            carrier_config, pdsch_config, chan_cfg, -snr, n_slots,
            seed + 7919 * i_snr, ce_config, prof=prof,
            do_ce=not use_batch, return_full=use_batch)
        if use_batch:
            import jax
            import jax.numpy as jnp
            nr_pdsch, slots, rx_fd = out
            alloc_idx = [i for i, (_, _, _, _, slot) in enumerate(slots)
                         if (slot % pdsch_config["period_in_slot"])
                         in pdsch_config["allocated_slots"]]
            if not alloc_idx:
                # no allocated slot in the simulated window: 0.0 pass
                # rate, like the per-slot path's npass/max(ntot, 1)
                pending.append((snr, 0, None))
                continue
            xp = jnp if isinstance(rx_fd, jax.Array) else np
            # one reshape instead of stacking n_slots slices (each
            # slice+stack is a separate device dispatch)
            nr_ant = rx_fd.shape[0]
            slot_size = slots[0][0].shape[-1]
            full = xp.swapaxes(
                rx_fd[:, : n_slots * slot_size].reshape(
                    nr_ant, n_slots, slot_size), 0, 1)
            rx_stack = (full if len(alloc_idx) == n_slots
                        else full[np.asarray(alloc_idx)])
            slot_nums = [slots[i][4] for i in alloc_idx]
            alloc = alloc_idx
            # software-pipelined sweep: dispatch this point's decodes
            # WITHOUT fetching, so the device works on SNR i while the
            # host stages SNR i+1's TX/channel (single-chip PP overlap);
            # every point's flags come back in one transfer at the end
            oks = {}
            nr_pdsch.rvidx = -1
            for algo in ceq_algo_list:
                with prof_.stage(f"rx_batch[{algo}]", items=len(alloc),
                                 unit="slots"):
                    ok, _ = nr_pdsch.rx_process_batch(
                        rx_stack, slot_nums, {"algo": algo},
                        ldpc_config, ce_cfg_full, fetch=False)
                oks[algo] = ok
            pending.append((snr, len(alloc), oks))
            continue
        nr_pdsch, slots = out
        for algo in ceq_algo_list:
            npass = ntot = 0
            nr_pdsch.rvidx = -1
            for rx_slot, H, cov, est, slot in slots:
                if H is None:
                    continue
                with prof_.stage(f"rx_process[{algo}]", items=1,
                                 unit="slots"):
                    ok, tbblk, _ = nr_pdsch.RX_process(
                        rx_slot, slot, {"algo": algo}, H, cov,
                        ldpc_config, est)
                npass += int(ok)
                ntot += 1
            results[algo].append(npass / max(ntot, 1))
            print(f"PDSCH snr={snr:+.1f}dB {algo}: "
                  f"{npass}/{ntot} TB passed")
    fetch_pending()
    if prof is not None and hasattr(prof, "check_dispatch_routing"):
        # platform-routing guard: a long per-slot RX loop on the
        # tunneled accelerator is a misroute (VERDICT r4 item 9)
        prof.check_dispatch_routing()
    results["tbs_bits"] = nr_pdsch.tbsize
    return results
