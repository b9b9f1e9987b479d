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
                    nrPDCCH_list=(), Dm: np.ndarray | None = None):
    """Returns (fd_waveform, td_waveform, dl_waveform, td_sample_rate_hz).

    Shapes match the reference: fd (ant, S*14*12*prb), td (ant,
    S*15*nfft), dl at waveform_config["samplerate_in_mhz"].
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

    grids = np.zeros((n_slots, nant, 14 * n_sc), np.complex64)
    usages = np.zeros((n_slots, nant, 14 * n_sc), np.int8)
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

    fd_batched = grids.reshape(n_slots, nant, 14, n_sc)
    td = ofdm.tx_low_phy(
        jnp.asarray(fd_batched), scs, bw, fc_hz,
        dm=None if Dm is None or len(Dm) == 0 else jnp.asarray(Dm))
    td = td * jnp.asarray(_slot_phase(scs, fc_hz, n_slots))[:, None, None]
    # (S, ant, T) -> (ant, S*T)
    td_flat = jnp.swapaxes(td, 0, 1).reshape(nant, -1)
    dl = filters.tx_channel_filter(td_flat, scs, bw, out_rate_hz)

    fd_waveform = grids.transpose(1, 0, 2).reshape(nant, -1)
    nfft = num.fft_size(prb)
    return (fd_waveform, np.asarray(td_flat), np.asarray(dl),
            nfft * scs * 1000)
