"""PRACH: preamble formats 0-2 (LRA=839) and A1..C2 (LRA=139), TS 38.211 6.3.3.

Behavior parity targets:
  py5gphy/nr_prach/nr_prach_seq.py:6    (ZC root cycling + Ncs zones;
      logical->physical root tables stored as data npz)
  py5gphy/nr_prach/nr_prach_info.py     (kbar/NRARB, configuration tables
      38.211 6.3.3.2-2/3 stored as data json, format timing incl. the
      n*16 CP extension rule)
  py5gphy/nr_prach/nr_prach.py:9-171    (Prach object: separate 1.25/5/
      15/30 kHz numerology, IFFT + freq shift + CP at fixed 30.72 Msps)
  py5gphy/nr_waveform/nr_prach_waveform.py (halfband x2 upsampling chain,
      note: no sqrt(2) gain and n//2 offset, unlike the DL DUC)
"""
from __future__ import annotations

import functools
import json
import math
import pathlib

import numpy as np
from python_5gtoolbox_tpu.utils.host import to_device, to_host

from python_5gtoolbox_tpu.ops.filters import _conv1d, halfband_coeff
from python_5gtoolbox_tpu.utils.numerology import carrier_prb_size

import jax.numpy as jnp

_DATA = pathlib.Path(__file__).resolve().parents[1] / "data"

# 38.211 Tables 6.3.3.1-5 / 6.3.3.1-7 (Ncs for unrestricted sets).
_NCS_LONG = [0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119, 167, 279,
             419]
_NCS_SHORT = [0, 2, 4, 6, 8, 10, 12, 13, 15, 17, 19, 23, 27, 34, 46, 69]

_FORMAT_INFO = {
    "0": (24576, 3168), "1": (2 * 24576, 21024), "2": (4 * 24576, 4688),
    "A1": (2 * 2048, 288), "A2": (4 * 2048, 576), "A3": (6 * 2048, 864),
    "B1": (2 * 2048, 216), "B2": (4 * 2048, 360), "B3": (6 * 2048, 504),
    "B4": (12 * 2048, 936), "C0": (2048, 1240), "C2": (4 * 2048, 2048),
}


@functools.lru_cache(maxsize=None)
def _root_tables():
    with np.load(_DATA / "prach_root_sequences.npz") as z:
        return z["short"].copy(), z["long"].copy()


@functools.lru_cache(maxsize=None)
def _config_table(duplex: str):
    name = "prach_config_fr1_tdd.json" if duplex == "TDD" \
        else "prach_config_fr1_fdd.json"
    with open(_DATA / name) as f:
        return json.load(f)


def get_ncs(lra: int, zone_cfg: int) -> int:
    return (_NCS_LONG if lra == 839 else _NCS_SHORT)[zone_cfg]


def get_sequence_number(lra: int, logical_idx: int) -> int:
    short, long_ = _root_tables()
    return int((long_ if lra == 839 else short)[logical_idx])


def prach_seq_gen(root_seq_idx: int, lra: int, zone_cfg: int,
                  preamble_idx: int) -> np.ndarray:
    """Frequency-domain preamble y_uv (38.211 6.3.3.1)."""
    ncs = get_ncs(lra, zone_cfg)
    per_zc = 1 if ncs == 0 else lra // ncs
    if per_zc >= 64:
        logical = root_seq_idx
        v = preamble_idx
    else:
        for m in range(math.ceil(64 / per_zc)):
            if per_zc * (m + 1) > preamble_idx:
                logical = root_seq_idx + m
                if logical > lra - 2:
                    logical -= lra - 1
                v = preamble_idx - per_zc * m
                break
    u = get_sequence_number(lra, logical)
    n = np.arange(lra)
    xu = np.exp(-1j * np.pi * u * n * (n + 1) / lra)
    cv = v * ncs
    xuv = np.roll(xu, -cv)
    return np.fft.fft(xuv)


def get_kbar_nrarb(lra: int, prach_fra, carrier_scs: int):
    if lra == 839:
        return (7, 6) if carrier_scs == 15 else (1, 3)
    nrarb = {(15, 15): 12, (15, 30): 6, (30, 15): 24, (30, 30): 12}[
        (prach_fra, carrier_scs)]
    return 2, nrarb


def get_prach_config_info(cfg_index: int, duplex: str) -> dict:
    row = _config_table(duplex)[cfg_index]
    assert row[0] == cfg_index
    return dict(preamble_formats=row[1], x=row[2], y=row[3],
                subframe_numbers=row[4], start_symbol=row[5],
                nprachslot_insubframe=row[6], NRASlot_t=row[7],
                NRA_dur=row[8])


def get_prach_format_info(fmt: str, msg1_scs):
    assert fmt != "3", "format 3 not supported (as reference)"
    lra = 839 if fmt in ("0", "1", "2", "3") else 139
    nu, cp = _FORMAT_INFO[fmt]
    if msg1_scs == 30:
        nu //= 2
        cp //= 2
    return lra, nu, cp


_SCS15_SYM = [2208] + [2192] * 6 + [2208] + [2192] * 6
_SCS30_SYM = [1112] + [1096] * 13


def get_prach_txinfo(fmt, active_slot, nra_t, start_symbol, nslot_insub,
                     msg1_scs, nu, cp, nra_dur):
    """(nRA_slot, first_symbol, CP length with n*16 rule, tRA_start)."""
    if fmt in ("0", "1", "2", "3"):
        first = start_symbol
        return 0, first, cp, sum(_SCS15_SYM[:first])
    if msg1_scs == 15:
        nra_slot = 0
    elif nslot_insub == 1:
        nra_slot = 1
    else:
        nra_slot = active_slot
    first = start_symbol + nra_t * nra_dur + 14 * nra_slot
    if msg1_scs == 15:
        t_start = sum(_SCS15_SYM[:first])
    else:
        if first >= 14:
            t_start = sum(_SCS30_SYM[: first - 14]) + 30720 // 2
        else:
            t_start = sum(_SCS30_SYM[:first])
    t_last = t_start + nu + cp
    n = 0
    if t_start == 0:
        n += 1
        if t_last >= 15360:
            n += 1
    elif t_start <= 15360 and t_last >= 15360:
        n += 1
    return nra_slot, first, cp + n * 16, t_start


class Prach:
    """PRACH channel object, reference-compatible process(sfn)."""

    def __init__(self, carrier_config: dict, prach_config: dict,
                 prach_parameter: dict):
        self.carrier = carrier_config
        self.cfg = prach_config
        self.par = prach_parameter
        self.prb_size = carrier_prb_size(carrier_config["scs"],
                                         carrier_config["BW"])
        info = get_prach_config_info(prach_config["prach_ConfigurationIndex"],
                                     carrier_config["duplex_type"])
        fmts = info["preamble_formats"]
        if len(fmts) == 1:
            fmt = fmts[0]
        else:
            fmt = fmts[1] if prach_parameter["nRA_t"] == info["NRASlot_t"] - 1 \
                else fmts[0]
        self.fmt = fmt
        msg1_scs = prach_config["msg1_SubcarrierSpacing"]
        if fmt in ("0", "1", "2"):
            msg1_scs = 1.25
        elif fmt == "3":
            msg1_scs = 5
        self.msg1_scs = msg1_scs
        lra, nu, cp = get_prach_format_info(fmt, msg1_scs)
        info.update(LRA=lra, Nu=nu, NRA_CP=cp)
        kbar, nrarb = get_kbar_nrarb(lra, msg1_scs, carrier_config["scs"])
        info.update(kbar=kbar, NRARB=nrarb)
        self.info = info
        K = carrier_config["scs"] / msg1_scs
        k1 = (prach_config["msg1_FrequencyStart"] * 12
              + prach_parameter["nRA"] * nrarb * 12 - self.prb_size * 12 // 2)
        assert prach_parameter["nRA"] < prach_config["msg1_FDM"]
        self.freq_shift = K * k1 + kbar
        nra_slot, first, cp_l, t_start = get_prach_txinfo(
            fmt, prach_parameter["ActivePRACHslotinSubframe"],
            prach_parameter["nRA_t"], info["start_symbol"],
            info["nprachslot_insubframe"], msg1_scs, nu, cp,
            info["NRA_dur"])
        self.nra_slot, self.first_symbol = nra_slot, first
        self.cp_l, self.t_start = cp_l, t_start

    def process(self, sfn: int):
        """Returns (10ms waveform @30.72 Msps, prach_data, active)."""
        fs_k = 30720
        waveform = np.zeros(fs_k * 10, np.complex64)
        if sfn % self.info["x"] != self.info["y"]:
            return waveform, [], 0
        sub = self.par["PRACH_subframe"]
        if sub not in self.info["subframe_numbers"]:
            return waveform, [], 0
        yuv = prach_seq_gen(self.cfg["prach_RootSequenceIndex"],
                            self.info["LRA"],
                            self.cfg["zeroCorrelationZoneConfig"],
                            self.par["PreambleIndex"])
        ifft_size = int(fs_k / self.msg1_scs)
        lra, nu = self.info["LRA"], self.info["Nu"]
        if lra == 839:
            reps = nu // 24576
        elif self.msg1_scs == 15:
            reps = nu // 2048
        else:
            reps = nu // 1024
        buf = np.concatenate([yuv, np.zeros(ifft_size - lra)])
        td = np.fft.ifft(buf) * math.sqrt(ifft_size)
        ramp = np.exp(1j * 2 * np.pi * self.freq_shift * self.msg1_scs
                      * np.arange(ifft_size) / fs_k)
        td = td * ramp
        td = np.tile(td, reps)
        with_cp = np.concatenate([td[-self.cp_l:], td])
        start = sub * fs_k + self.t_start
        waveform[start: start + with_cp.size] = with_cp
        sel = math.ceil((self.t_start + with_cp.size) / fs_k) * fs_k
        prach_data = waveform[sub * fs_k: sub * fs_k + sel]
        return waveform, prach_data, 1


def prach_upsample(x: np.ndarray, reps: int) -> np.ndarray:
    """x2^reps halfband upsampling with the PRACH offset convention
    (upfirdn slice [n//2 : n//2 + 2len], no sqrt(2) gain)."""
    taps = halfband_coeff()
    n = len(taps)
    y = to_device(np.atleast_2d(x).astype(np.complex64))
    for _ in range(reps):
        # upfirdn(h, x, up=2) slice [n//2 : n//2 + 2T]
        off = n // 2
        pl = (n - 1) - off
        pr = (n - 1) - ((2 * y.shape[-1] + n - 2) - (off + 2 * y.shape[-1]))
        y = _conv1d(y, taps, (pl, pr), lhs_dilation=2)
    out = to_host(y)
    return out[0] if np.ndim(x) == 1 else out


def gen_prach_waveform(waveform_config, carrier_config, prach_config,
                       prach_parameters):
    """10ms-per-SFN PRACH waveform at waveform_config sample rate."""
    fs_mhz = waveform_config["samplerate_in_mhz"]
    n_slots = waveform_config["numofslots"]
    start_sfn = waveform_config["startSFN"]
    fs = int(fs_mhz * 1e6)
    per_sfn = fs // 100
    n_sfn = math.ceil(n_slots * carrier_config["scs"] / 15 / 10)
    prach = Prach(carrier_config, prach_config, prach_parameters)
    td = np.zeros((1, n_sfn * per_sfn), np.complex64)
    datas = []
    reps = int(np.log2(int(fs_mhz / 30.72)))
    for m in range(n_sfn):
        wav, data, active = prach.process(m + start_sfn)
        if active:
            datas.append(data)
        td[0, m * per_sfn:(m + 1) * per_sfn] = prach_upsample(wav, reps) \
            if reps else wav
    prach_data_list = np.vstack(datas) if datas else []
    return td, prach_data_list
