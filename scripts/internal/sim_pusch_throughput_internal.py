"""PUSCH link-level simulation internals (TX -> channel -> RX).

Behavior parity target: scripts/internal/sim_pusch_throughput_internal.py
of the reference (UL counterpart of the PDSCH pipeline; SURVEY.md 3.3).
"""
from __future__ import annotations

import numpy as np

from python_5gtoolbox_tpu.models import channel as chan_mod
from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
from python_5gtoolbox_tpu.rx.channel_estimate import (NrChannelEstimation,
                                                      fo_est_valid_for_doppler)
from python_5gtoolbox_tpu.utils.numerology import (carrier_prb_size,
                                                   fft_size, slots_per_frame)
from python_5gtoolbox_tpu.waveform import rx as rx_wf
from python_5gtoolbox_tpu.waveform import ul as ul_wf

from scripts.internal.sim_pdsch_throughput_internal import (
    DEFAULT_CE_CONFIG, DEFAULT_LDPC_CONFIG)


def can_batch_pusch_rx(pusch_config: dict, algos=None) -> bool:
    """True when the slot-batched ULSCH RX covers this config: ULSCH
    only (no UCI multiplexing), CP-OFDM or — since r5 — DFT-s-OFDM
    transform precoding (1 layer, NumCDM=2, linear equalizers only;
    see PuschRxMixin.rx_process_batch)."""
    cfg = pusch_config
    if not (cfg["EnableULSCH"] == 1
            and not (cfg["EnableACK"] * cfg["NumACKBits"]
                     or cfg["EnableCSI1"] * cfg["NumCSI1Bits"]
                     or cfg["EnableCSI2"] * cfg["NumCSI2Bits"])):
        return False
    if cfg["nTransPrecode"] == 1:
        if not (cfg["num_of_layers"] == 1
                and cfg["DMRS"]["NumCDMGroupsWithoutData"] == 2):
            return False
        if algos is not None and any(
                a not in ("ZF", "ZF-IRC", "MMSE", "MMSE-IRC")
                for a in algos):
            return False
    return True


def pusch_before_ceq_processing(carrier_config, pusch_config, chan_cfg,
                                pnoise_db, n_slots=2, seed=0,
                                ce_config=None, do_ce=True,
                                return_full=False):
    ce_config = dict(DEFAULT_CE_CONFIG, **(ce_config or {}))
    scs, bw = carrier_config["scs"], carrier_config["BW"]
    fm = float(chan_cfg.get("fm_inHz", 0) or 0)
    if ce_config.get("enable_FO_est") and not fo_est_valid_for_doppler(
            fm, scs):
        # see rx/channel_estimate.py freq_offset_est contract
        print(f"[sim] fm={fm:.0f} Hz exceeds the FO-estimator's valid "
              f"range at scs{scs}; disabling FO est/comp")
        ce_config["enable_FO_est"] = False
        ce_config["enable_FO_comp"] = False
    prb = carrier_prb_size(scs, bw)
    nfft = fft_size(prb)
    fs_hz = nfft * scs * 1000.0
    waveform_config = dict(numofslots=n_slots, startSFN=0, startslot=0,
                           samplerate_in_mhz=fs_hz / 1e6)
    nr_pusch = NrPUSCH(carrier_config, pusch_config)
    model = chan_mod.NrChannelModel(
        chan_cfg, pnoise_db, carrier_config["carrier_frequency_in_mhz"] * 1e6,
        fs_hz, scs, seed=seed)
    dev = not do_ce  # device-resident pipeline for the batched RX
    fd, td, ul = ul_wf.gen_ul_waveform(waveform_config, carrier_config,
                                       nrPusch_list=[nr_pusch],
                                       return_device=dev)
    rx = model.filter(ul, return_device=dev)
    _, rx_fd = rx_wf.waveform_rx_processing(rx, carrier_config, fs_hz,
                                            return_device=dev)

    slot_size = 14 * 12 * prb
    spf = slots_per_frame(scs)
    per_slot = []
    for idx in range(n_slots):
        # TX numbers slots as (startslot + idx) % spf (waveform/ul.py) —
        # derive the RX wrap from the SAME startslot so they cannot drift
        slot = (waveform_config["startslot"] + idx) % spf
        rx_slot = rx_fd[:, idx * slot_size: (idx + 1) * slot_size]
        if not do_ce or (slot % pusch_config["period_in_slot"]) not in \
                pusch_config["allocated_slots"]:
            per_slot.append((rx_slot, None, None, None, slot))
            continue
        h_ls, rs_info = nr_pusch.H_LS_est(rx_slot, slot)
        est = NrChannelEstimation(h_ls, rs_info, ce_config)
        H, cov = est.channel_est()
        per_slot.append((rx_slot, H, cov, est, slot))
    if return_full:
        return nr_pusch, per_slot, rx_fd
    return nr_pusch, per_slot


def run_pusch_throughput(carrier_config, pusch_config, chan_cfg,
                         snr_db_list, ceq_algo_list, n_slots=2,
                         ce_config=None, ldpc_config=None, seed=0,
                         decode_uci=False, use_batch=None, prof=None):
    """-> dict algo -> [TB pass-rate per SNR] (+ 'tbs_bits').

    use_batch None (default) auto-selects the slot-batched one-dispatch
    RX when the config supports it (can_batch_pusch_rx) and no UCI
    decode was requested; the per-slot path remains for transform
    precoding / UCI / HARQ studies. The batched path is
    software-pipelined like the PDSCH sweep (VERDICT r4 item 7):
    decodes dispatch with fetch=False so the device works on SNR i
    while the host stages SNR i+1's TX/channel.
    """
    import contextlib

    class _Null:
        @contextlib.contextmanager
        def stage(self, name, items=0.0, unit="items"):
            yield

    prof_ = prof or _Null()
    ldpc_config = dict(DEFAULT_LDPC_CONFIG, **(ldpc_config or {}))
    ce_cfg_full = dict(DEFAULT_CE_CONFIG, **(ce_config or {}))
    fm = float(chan_cfg.get("fm_inHz", 0) or 0)
    if ce_cfg_full.get("enable_FO_est") and not fo_est_valid_for_doppler(
            fm, carrier_config["scs"]):
        ce_cfg_full["enable_FO_est"] = False
        ce_cfg_full["enable_FO_comp"] = False
    if use_batch is None:
        use_batch = can_batch_pusch_rx(pusch_config, ceq_algo_list) \
            and not decode_uci
    results = {algo: [] for algo in ceq_algo_list}
    # deferred-fetch queue (see the PDSCH internal): one stacked ok
    # transfer for the whole sweep instead of one tunnel sync per point
    pending = []     # [(snr, ntot, {algo: device ok flags} | None)]

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
                    print(f"PUSCH snr={snr_p:+.1f}dB {algo}: "
                          f"0/0 TB passed")
                    continue
                npass = int(np.sum(flat[off: off + ntot]))
                off += ntot
                results[algo].append(npass / max(ntot, 1))
                print(f"PUSCH snr={snr_p:+.1f}dB {algo}: "
                      f"{npass}/{ntot} TB passed")
        pending.clear()

    for i_snr, snr in enumerate(snr_db_list):
        # fresh channel trajectory per SNR point (see PDSCH internal)
        with prof_.stage("tx_channel_staging", items=n_slots,
                         unit="slots"):
            out = pusch_before_ceq_processing(
                carrier_config, pusch_config, chan_cfg, -snr, n_slots,
                seed + 7919 * i_snr, ce_config, do_ce=not use_batch,
                return_full=use_batch)
        if use_batch:
            import jax
            import jax.numpy as jnp
            nr_pusch, slots, rx_fd = out
            alloc_idx = [i for i, (_, _, _, _, slot) in enumerate(slots)
                         if (slot % pusch_config["period_in_slot"])
                         in pusch_config["allocated_slots"]]
            if not alloc_idx:
                pending.append((snr, 0, None))
                continue
            xp = jnp if isinstance(rx_fd, jax.Array) else np
            nr_ant = rx_fd.shape[0]
            slot_size = slots[0][0].shape[-1]
            full = xp.swapaxes(
                rx_fd[:, : n_slots * slot_size].reshape(
                    nr_ant, n_slots, slot_size), 0, 1)
            rx_stack = (full if len(alloc_idx) == n_slots
                        else full[np.asarray(alloc_idx)])
            slot_nums = [slots[i][4] for i in alloc_idx]
            alloc = alloc_idx
            oks = {}
            nr_pusch.rvidx = -1
            for algo in ceq_algo_list:
                with prof_.stage(f"rx_batch[{algo}]", items=len(alloc),
                                 unit="slots"):
                    ok, _ = nr_pusch.rx_process_batch(
                        rx_stack, slot_nums, {"algo": algo}, ldpc_config,
                        ce_cfg_full, fetch=False)
                oks[algo] = ok
            pending.append((snr, len(alloc), oks))
            continue
        nr_pusch, slots = out
        for algo in ceq_algo_list:
            npass = ntot = 0
            nr_pusch.rvidx = -1
            for rx_slot, H, cov, est, slot in slots:
                if H is None:
                    continue
                with prof_.stage(f"rx_process[{algo}]", items=1,
                                 unit="slots"):
                    ok, tbblk, _, _ = nr_pusch.RX_process(
                        rx_slot, slot, {"algo": algo}, H, cov,
                        ldpc_config, est, decode_uci=decode_uci)
                npass += int(ok)
                ntot += 1
            results[algo].append(npass / max(ntot, 1))
            print(f"PUSCH snr={snr:+.1f}dB {algo}: "
                  f"{npass}/{ntot} TB passed")
    fetch_pending()
    if prof is not None and hasattr(prof, "check_dispatch_routing"):
        # platform-routing guard (VERDICT r4 item 9)
        prof.check_dispatch_routing()
    results["tbs_bits"] = nr_pusch.tbsize
    return results
