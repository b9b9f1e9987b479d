"""Receiver waveform processing: DDC + batched Rx low-PHY.

Behavior parity target: py5gphy/nr_lowphy/rx_lowphy_process.py:11-33
(waveform_rx_processing: channel filter + per-slot Rx_low_phy).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import filters, ofdm
from python_5gtoolbox_tpu.utils import numerology as num
from python_5gtoolbox_tpu.utils.host import to_device, to_host


def waveform_rx_processing(rx_waveform, carrier_config: dict,
                           sample_rate_in_hz: float,
                           return_device: bool = False):
    """(ant, N) rx samples -> (td_waveform at carrier rate, fd_waveform).

    fd_waveform is (ant, n_slots*14*12*prb), matching the reference.
    Accepts host or device input; return_device=True keeps both outputs
    on the accelerator (feeds the slot-batched RX without tunnel
    round trips).
    """
    scs, bw = carrier_config["scs"], carrier_config["BW"]
    fc_hz = int(carrier_config["carrier_frequency_in_mhz"] * 1e6)
    prb = num.carrier_prb_size(scs, bw)
    nfft = num.fft_size(prb)
    td = filters.rx_channel_filter(to_device(rx_waveform), scs, bw,
                                   sample_rate_in_hz)
    slot_samp = nfft * 15
    nant = td.shape[0]
    n_slots = td.shape[1] // slot_samp
    td = td[:, : n_slots * slot_samp]
    slots = jnp.swapaxes(td.reshape(nant, n_slots, slot_samp), 0, 1)
    fd = ofdm.rx_low_phy(slots, scs, bw, fc_hz)  # (S, ant, 14, n_sc)
    fd_flat = jnp.swapaxes(fd, 0, 1).reshape(nant, -1)
    if return_device:
        return td, fd_flat
    return to_host(td), to_host(fd_flat)
