"""Uplink waveform orchestration.

Behavior parity target: py5gphy/nr_waveform/nr_ul_waveform.py:15-103 —
per-slot PUSCH/PUCCH0-4/SRS composition, batched Tx low-PHY, slot phase
compensation, channel filter. Same batched-device design as waveform/dl.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import filters, ofdm
from python_5gtoolbox_tpu.utils import numerology as num
from python_5gtoolbox_tpu.utils.host import to_device, to_host
from python_5gtoolbox_tpu.waveform.dl import _slot_phase


def gen_ul_waveform(waveform_config: dict, carrier_config: dict,
                    nrPusch_list=(), nrSrs_list=(),
                    nrPucchFormat0_list=(), nrPucchFormat1_list=(),
                    nrPucchFormat2_list=(), nrPucchFormat3_list=(),
                    nrPucchFormat4_list=(), return_device: bool = False):
    """Returns (fd_waveform, td_waveform, ul_waveform).

    return_device=True keeps td/ul on the accelerator (see
    waveform/dl.py)."""
    n_slots = waveform_config["numofslots"]
    start_sfn = waveform_config["startSFN"]
    start_slot = waveform_config["startslot"]
    out_rate_hz = waveform_config["samplerate_in_mhz"] * 1e6

    nant = carrier_config["num_of_ant"]
    fc_hz = int(carrier_config["carrier_frequency_in_mhz"] * 1e6)
    scs, bw = carrier_config["scs"], carrier_config["BW"]
    prb = num.carrier_prb_size(scs, bw)
    n_sc = 12 * prb
    slots_per_frame = num.slots_per_frame(scs)

    # Fast path (UL analogue of waveform/dl.py's, VERDICT r4 item 1): a
    # single batch-capable PUSCH and no other channels — the link-level
    # UL sim shape — encodes and composes ALL slot grids on the device
    # in one traced program (NrPUSCH.tx_grid_batch); the
    # reference-shaped per-slot host loop below is kept for
    # multi-channel waveforms (PUCCH/SRS, UCI-on-PUSCH, ...).
    grids = None
    only_pusch = (len(nrPusch_list) == 1 and not nrSrs_list
                  and not any((nrPucchFormat0_list, nrPucchFormat1_list,
                               nrPucchFormat2_list, nrPucchFormat3_list,
                               nrPucchFormat4_list)))
    if only_pusch and nrPusch_list[0].tx_batch_supported():
        slots = [(start_slot + idx) % slots_per_frame
                 for idx in range(n_slots)]
        if return_device:
            # fully fused device TX: grid (antenna roll folded into the
            # precoder rows) -> tx_lowphy_duc with the slot phase folded
            # pre-IFFT — OFDM + CP + phase + DUC in ONE dispatch; td is
            # not produced (device sweeps consume only ul).
            roll = nant // 2 if nant > 1 else 0
            fd_dev = nrPusch_list[0].tx_grid_batch(slots, roll_ant=roll)
            ul = filters.tx_lowphy_duc(
                jnp.swapaxes(fd_dev, 0, 1), scs, bw, fc_hz,
                out_rate_hz, slot_phase=True, start_slot=start_slot)
            if roll:
                fd_dev = jnp.roll(fd_dev, roll, axis=1)
            fd_waveform = jnp.swapaxes(fd_dev, 0, 1).reshape(nant, -1)
            return fd_waveform, None, ul
        fd_dev = nrPusch_list[0].tx_grid_batch(slots)
    else:
        grids = np.zeros((n_slots, nant, 14 * n_sc), np.complex64)
        usages = np.zeros((n_slots, nant, 14 * n_sc), np.int8)
        # per-slot encode jits pinned to the host CPU backend (latency
        # work); throughput stages below stay on the accelerator — see
        # waveform/dl.py
        with jax.default_device(jax.devices("cpu")[0]):
            for idx in range(n_slots):
                sfn = start_sfn + (start_slot + idx) // slots_per_frame
                slot = (start_slot + idx) % slots_per_frame
                fd, use = grids[idx], usages[idx]
                for ch in nrPusch_list:
                    fd, use = ch.process(fd, use, slot)
                for group in (nrPucchFormat0_list, nrPucchFormat1_list,
                              nrPucchFormat2_list, nrPucchFormat3_list,
                              nrPucchFormat4_list):
                    for ch in group:
                        fd, use = ch.process(fd, use, sfn, slot)
                for ch in nrSrs_list:
                    fd, use = ch.process(fd, use, sfn, slot)
                grids[idx], usages[idx] = fd, use
        fd_dev = to_device(grids.reshape(n_slots, nant, 14, n_sc))

    td = ofdm.tx_low_phy(fd_dev, scs, bw, fc_hz)
    td = td * to_device(_slot_phase(scs, fc_hz, n_slots))[:, None, None]
    td_flat = jnp.swapaxes(td, 0, 1).reshape(nant, -1)
    ul = filters.tx_channel_filter(td_flat, scs, bw, out_rate_hz)
    if grids is not None:
        fd_waveform = grids.transpose(1, 0, 2).reshape(nant, -1)
    else:
        fd_waveform = jnp.swapaxes(fd_dev, 0, 1).reshape(nant, -1)
        if not return_device:
            fd_waveform = to_host(fd_waveform)
    if return_device:
        return fd_waveform, td_flat, ul
    return fd_waveform, to_host(td_flat), to_host(ul)


def gen_ul_channel_list(waveform_config, carrier_config,
                        pusch_config_list=(), srs_config_list=(),
                        pucch_format0_config_list=(),
                        pucch_format1_config_list=(),
                        pucch_format2_config_list=(),
                        pucch_format3_config_list=(),
                        pucch_format4_config_list=()):
    """Instantiate enabled UL channel objects (nr_ul_waveform.py:105-170)."""
    from python_5gtoolbox_tpu.phy.pucch import (
        NrPUCCHFormat0, NrPUCCHFormat1, NrPUCCHFormat2, NrPUCCHFormat3,
        NrPUCCHFormat4)
    from python_5gtoolbox_tpu.phy.pusch import NrPUSCH
    from python_5gtoolbox_tpu.phy.srs import NrSRS

    def build(cls, cfgs):
        return [cls(carrier_config, c) for c in cfgs
                if c["enable"] == "True"]

    return (build(NrPUSCH, pusch_config_list),
            build(NrSRS, srs_config_list),
            build(NrPUCCHFormat0, pucch_format0_config_list),
            build(NrPUCCHFormat1, pucch_format1_config_list),
            build(NrPUCCHFormat2, pucch_format2_config_list),
            build(NrPUCCHFormat3, pucch_format3_config_list),
            build(NrPUCCHFormat4, pucch_format4_config_list))
