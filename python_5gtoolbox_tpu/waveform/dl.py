"""Downlink waveform orchestration.

Behavior parity target: py5gphy/nr_waveform/nr_dl_waveform.py:13-107 —
per-slot channel composition into the frequency grid, Tx low-PHY,
slot-level phase compensation, and the 245.76 Msps channel filter.

TPU design: the per-slot channel `process` calls assemble host NumPy
grids (cheap index math), then ALL slots go through the batched jitted
OFDM modulator in one device call and the full waveform through the
XLA-conv channel filter — the per-symbol/per-slot Python hot loops of
the reference collapse into two device dispatches.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import ofdm, filters
from python_5gtoolbox_tpu.utils import numerology as num
from python_5gtoolbox_tpu.utils.host import to_device, to_host


def _slot_phase(scs: int, carrier_freq_hz: int, n_slots: int) -> np.ndarray:
    """Per-slot phase compensation factors (nr_dl_waveform.py:91-100)."""
    idx = np.arange(n_slots)
    if not carrier_freq_hz:
        return np.ones(n_slots, np.complex64)
    per_ms = carrier_freq_hz / 1e3
    slot_ms = 1.0 if scs == 15 else 0.5
    return np.exp(-1j * 2 * np.pi * per_ms * slot_ms * idx).astype(np.complex64)


def gen_dl_waveform(waveform_config: dict, carrier_config: dict,
                    nrSSB_list=(), nrPdsch_list=(), nrCSIRS_list=(),
                    nrPDCCH_list=(), Dm: np.ndarray | None = None,
                    return_device: bool = False):
    """Returns (fd_waveform, td_waveform, dl_waveform, td_sample_rate_hz).

    Shapes match the reference: fd (ant, S*14*12*prb), td (ant,
    S*15*nfft), dl at waveform_config["samplerate_in_mhz"].
    return_device=True keeps td/dl on the accelerator (fd stays host —
    it IS the host grid bookkeeping) — and on the single-PDSCH fast
    path WITHOUT timing-error injection the whole TX (grid, OFDM, CP,
    slot phase, DUC) runs as one fused device dispatch; td is then
    None (device sweeps consume only dl).
    """
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

    # Fast path (VERDICT r4 item 1): a single batch-capable PDSCH and no
    # other channels — the common link-level-sim shape — encodes and
    # composes ALL slot grids on the device in one traced program
    # (Pdsch.tx_grid_batch); the reference-shaped per-slot host loop
    # below is kept for multi-channel waveforms (test models, SSB, ...).
    grids = None
    if (len(nrPdsch_list) == 1 and not nrSSB_list and not nrCSIRS_list
            and not nrPDCCH_list and nrPdsch_list[0].tx_batch_supported()):
        slots = [(start_slot + idx) % slots_per_frame
                 for idx in range(n_slots)]
        no_dm = Dm is None or len(Dm) == 0 or not np.any(np.asarray(Dm))
        if return_device and no_dm:
            # fully fused device TX: grid (antenna roll folded into the
            # precoder rows) -> tx_lowphy_duc with the slot phase folded
            # pre-IFFT — OFDM + CP + phase + DUC in ONE dispatch on the
            # Pallas fused-filter path, no intermediate td materialized.
            # td is not produced on this path (device sweeps use only
            # dl); host-return callers keep the composed path below.
            roll = nant // 2 if nant > 1 else 0
            fd_dev = nrPdsch_list[0].tx_grid_batch(slots, roll_ant=roll)
            dl = filters.tx_lowphy_duc(
                jnp.swapaxes(fd_dev, 0, 1), scs, bw, fc_hz,
                out_rate_hz, slot_phase=True, start_slot=start_slot)
            if roll:
                # fd return contract is the UNROLLED grid
                fd_dev = jnp.roll(fd_dev, roll, axis=1)
            fd_waveform = jnp.swapaxes(fd_dev, 0, 1).reshape(nant, -1)
            nfft = num.fft_size(prb)
            return fd_waveform, None, dl, nfft * scs * 1000
        fd_dev = nrPdsch_list[0].tx_grid_batch(slots)
    else:
        grids = np.zeros((n_slots, nant, 14 * n_sc), np.complex64)
        usages = np.zeros((n_slots, nant, 14 * n_sc), np.int8)
        # the per-slot encode jits are LATENCY work (small shapes, host
        # grid writes after each) — pin them to the host CPU backend so an
        # accelerated process doesn't pay a tunnel round trip per slot; the
        # throughput stages below (OFDM/DUC over all slots) stay on the
        # default (accelerator) device
        with jax.default_device(jax.devices("cpu")[0]):
            for idx in range(n_slots):
                sfn = start_sfn + (start_slot + idx) // slots_per_frame
                slot = (start_slot + idx) % slots_per_frame
                fd, use = grids[idx], usages[idx]
                for ch in nrSSB_list:
                    fd, use = ch.process(fd, use, sfn, slot)
                for ch in nrCSIRS_list:
                    fd, use = ch.process(fd, use, sfn, slot)
                for ch in nrPDCCH_list:
                    fd, use = ch.process(fd, use, sfn, slot)
                for ch in nrPdsch_list:
                    fd, use = ch.process(fd, use, slot)
                grids[idx], usages[idx] = fd, use
        fd_dev = to_device(grids.reshape(n_slots, nant, 14, n_sc))

    td = ofdm.tx_low_phy(
        fd_dev, scs, bw, fc_hz,
        dm=None if Dm is None or len(Dm) == 0 else jnp.asarray(Dm))
    td = td * to_device(_slot_phase(scs, fc_hz, n_slots))[:, None, None]
    # (S, ant, T) -> (ant, S*T)
    td_flat = jnp.swapaxes(td, 0, 1).reshape(nant, -1)
    dl = filters.tx_channel_filter(td_flat, scs, bw, out_rate_hz)

    if grids is not None:
        fd_waveform = grids.transpose(1, 0, 2).reshape(nant, -1)
    else:
        fd_waveform = jnp.swapaxes(fd_dev, 0, 1).reshape(nant, -1)
        if not return_device:
            fd_waveform = to_host(fd_waveform)
    nfft = num.fft_size(prb)
    if return_device:
        return fd_waveform, td_flat, dl, nfft * scs * 1000
    return (fd_waveform, to_host(td_flat), to_host(dl),
            nfft * scs * 1000)


def gen_dl_channel_list(waveform_config, carrier_config, ssb_config=None,
                        pdcch_config_list=(), search_space_list=(),
                        coreset_config_list=(), csirs_config_list=(),
                        pdsch_config_list=()):
    """Instantiate enabled DL channel objects from configs.

    Reference-parity builder (nr_dl_waveform.py:110-201): returns
    (nrSSB_list, nrPdsch_list, nrCSIRS_list, nrPDCCH_list). `enable`
    flags are the strings "True"/"False" as in the reference configs.
    """
    from python_5gtoolbox_tpu.phy.csirs import NrCSIRS
    from python_5gtoolbox_tpu.phy.pdcch import NrSearchSpace, Pdcch
    from python_5gtoolbox_tpu.phy.pdsch import Pdsch
    from python_5gtoolbox_tpu.phy.ssb import NrSSB

    ssb_list = []
    if ssb_config and ssb_config["enable"] == "True":
        ssb_list.append(NrSSB(carrier_config, ssb_config))
    pdsch_list = [Pdsch(c, carrier_config) for c in pdsch_config_list
                  if c["enable"] == "True"]
    csirs_list = [NrCSIRS(carrier_config, c) for c in csirs_config_list
                  if c["enable"] == "True"]
    ss_list = []
    for ss_cfg in search_space_list:
        if ss_cfg["enable"] != "True":
            continue
        cs = [c for c in coreset_config_list
              if c["coreset_id"] == ss_cfg["controlResourceSetId"]]
        assert cs, "search space references a missing coreset"
        ss_list.append(NrSearchSpace(carrier_config, ss_cfg, cs[0]))
    pdcch_list = []
    for cfg in pdcch_config_list:
        if cfg["enable"] != "True":
            continue
        sel = [s for s in ss_list
               if s.search_space_config["controlResourceSetId"]
               == cfg["searchSpaceId"]]
        assert sel, "PDCCH references a missing search space"
        pdcch_list.append(Pdcch(cfg, sel[0]))
    return ssb_list, pdsch_list, csirs_list, pdcch_list
