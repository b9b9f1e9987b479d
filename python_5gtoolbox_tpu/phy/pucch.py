"""PUCCH formats 0-4, TS 38.211 6.3.2 / 6.4.1.3.

Behavior parity targets: py5gphy/nr_pucch/* —
  format 0: sequence-selection ZC with mcs from HARQ/SR tables
  format 1: ZC + time-domain OCC spreading + alternating DMRS
  format 2: UCI->QPSK with DMRS on every 3rd RE
  format 3: DFT-s-OFDM pi/2-BPSK or QPSK
  format 4: like 3 plus block-wise OCC spreading
plus the shared group/sequence/cyclic-shift hopping (nr_pucch_common.py)
and UCI coding (nr_pucch_uci.py -> shared with PUSCH UCI).

Host plan-time module; sequences come from the shared jump-ahead PRBS
and ZC generators.
"""
from __future__ import annotations

import math

import numpy as np

from python_5gtoolbox_tpu.ops.lowpapr import lowpapr_seq
from python_5gtoolbox_tpu.ops.modulation import modulate_np
from python_5gtoolbox_tpu.ops.prbs import gen_prbs_np
from python_5gtoolbox_tpu.phy.pusch_uci import encode_uci_on_ulsch
from python_5gtoolbox_tpu.utils.numerology import RE_USAGE, carrier_prb_size

_DATA = RE_USAGE["PUCCH-DATA"]
_DMRS = RE_USAGE["PUCCH-DMRS"]


def encode_uci(uci_bits, n_bits: int, e_tot: int) -> np.ndarray:
    """PUCCH UCI coding (38.212 6.3.1), small-block path uses Qm=2."""
    return encode_uci_on_ulsch(uci_bits, n_bits, e_tot, qm=2)


def group_and_sequence_hopping(mode: str, hopping_id: int, slot: int,
                               nhop: int):
    """(u, v), 38.211 6.3.2.2.1."""
    fss = hopping_id % 30
    if mode == "neither":
        return fss, 0
    if mode == "enable":
        seq = gen_prbs_np(hopping_id // 30, 8, offset=8 * (slot * 2 + nhop))
        fgh = int(np.sum(seq * (2 ** np.arange(8)))) % 30
        return (fgh + fss) % 30, 0
    if mode == "disable":
        cinit = 32 * (hopping_id // 30) + fss
        v = int(gen_prbs_np(cinit, 1, offset=2 * slot + nhop)[0])
        return fss, v
    raise ValueError(mode)


def cyclic_shift_hopping(m0: int, mcs: int, slot: int, sym: int,
                         hopping_id: int) -> float:
    """alpha, 38.211 6.3.2.2.2."""
    seq = gen_prbs_np(hopping_id, 8, offset=8 * 14 * slot + 8 * sym)
    ncs = int(np.sum(seq * (2 ** np.arange(8))))
    return 2 * np.pi * ((m0 + mcs + ncs) % 12) / 12


# 38.211 Table 6.4.1.3.3.2-1 DMRS positions for formats 3/4, nsym 5..14.
_F34_DMRS = [
    ([0, 3], [0, 3]), ([1, 4], [1, 4]), ([1, 4], [1, 4]),
    ([1, 5], [1, 5]), ([1, 6], [1, 6]), ([2, 7], [1, 3, 6, 8]),
    ([2, 7], [1, 3, 6, 9]), ([2, 8], [1, 4, 7, 10]),
    ([2, 9], [1, 4, 7, 11]), ([3, 10], [1, 5, 8, 12]),
]


def format34_sym_info(nsym: int, start: int, additional_dmrs: str,
                      hopping: str):
    if nsym == 4:
        dmrs = [1] if hopping == "disabled" else [0, 2]
    else:
        pair = _F34_DMRS[nsym - 5]
        dmrs = pair[1] if additional_dmrs == "true" else pair[0]
    dmrs_syms = [x + start for x in dmrs]
    data_syms = [x + start for x in range(nsym) if x not in dmrs]
    return dmrs_syms, data_syms


# 38.211 Table 6.3.2.4.1-2 orthogonal phase sequences.
_OCC_PH = [
    [[0]],
    [[0, 0], [0, 1]],
    [[0, 0, 0], [0, 1, 2], [0, 2, 1]],
    [[0, 0, 0, 0], [0, 2, 0, 2], [0, 0, 2, 2], [0, 2, 2, 0]],
    [[0, 0, 0, 0, 0], [0, 1, 2, 3, 4], [0, 2, 4, 1, 3], [0, 3, 1, 4, 2],
     [0, 4, 3, 2, 1]],
    [[0, 0, 0, 0, 0, 0], [0, 1, 2, 3, 4, 5], [0, 2, 4, 0, 2, 4],
     [0, 3, 0, 3, 0, 3], [0, 4, 2, 0, 4, 2], [0, 5, 4, 3, 2, 1]],
    [[0, 0, 0, 0, 0, 0, 0], [0, 1, 2, 3, 4, 5, 6], [0, 2, 4, 6, 1, 3, 5],
     [0, 3, 6, 2, 5, 1, 4], [0, 4, 1, 5, 2, 6, 3], [0, 5, 3, 1, 6, 4, 2],
     [0, 6, 5, 4, 3, 2, 1]],
]


def format1_wm_list(hopping: str, nsym: int, occ: int):
    """Per-symbol OCC weights for format 1 (data odd / DMRS even syms)."""
    n_data = nsym // 2
    if hopping == "enabled":
        sf0 = n_data // 2
        sf1 = n_data - sf0
        dmrs_m0 = [1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4]
        dsf0 = dmrs_m0[nsym - 4]
        dsf1 = (nsym - n_data) - dsf0
    else:
        sf0, sf1 = n_data, 0
        dsf0, dsf1 = nsym - n_data, 0
    wm = np.zeros(nsym, np.complex64)

    def w(n):
        ph = np.asarray(_OCC_PH[n - 1][occ])
        return np.exp(1j * 2 * np.pi * ph / n)

    wm[1: sf0 * 2: 2] = w(sf0)
    if sf1 > 0:
        wm[sf0 * 2 + 1: nsym: 2] = w(sf1)
    wm[0: dsf0 * 2: 2] = w(dsf0)
    if dsf1 > 0:
        wm[dsf0 * 2: nsym: 2] = w(dsf1)
    return wm, sf0, dsf0


class _PucchBase:
    FMT = None  # set per subclass; drives construction-time validation

    def __init__(self, carrier_config, cfg):
        if self.FMT is not None:
            from python_5gtoolbox_tpu.phy.validate import (
                validate_pucch_config)
            validate_pucch_config(self.FMT, carrier_config, cfg)
        self.carrier = carrier_config
        self.cfg = cfg
        self.prb_size = carrier_prb_size(carrier_config["scs"],
                                         carrier_config["BW"])

    def _active(self, sfn, slot):
        n_slot_frame = 10 * self.carrier["scs"] // 15
        return not ((n_slot_frame * sfn + slot - self.cfg["slotoffset"])
                    % self.cfg["Periodicity_in_slot"])


class NrPUCCHFormat0(_PucchBase):
    """38.211 6.3.2.3 — sequence selection."""

    FMT = 0

    def __init__(self, carrier_config, cfg):
        super().__init__(carrier_config, cfg)
        harq = cfg["HARQbits"]
        n = cfg["numHARQbits"]
        if cfg["SR"] == "negative":
            if n == 0:
                mcs = 0
            elif n == 1:
                mcs = harq[0] * 6
            else:
                mcs = [0, 3, 9, 6][harq[0] * 2 + harq[1]]
        else:
            if n == 0:
                mcs = 0
            elif n == 1:
                mcs = 3 + harq[0] * 6
            else:
                mcs = [1, 4, 10, 7][harq[0] * 2 + harq[1]]
        self.mcs = mcs
        self.m0 = cfg["initialCyclicShift"]

    def process(self, fd_slot, usage, sfn, slot):
        cfg = self.cfg
        if not self._active(sfn, slot):
            return fd_slot, usage
        if cfg["numHARQbits"] == 0 and cfg["SR"] == "negative":
            return fd_slot, usage
        n_sc = 12 * self.prb_size
        for m in range(cfg["nrofSymbols"]):
            hop2 = m == 1 and cfg["intraSlotFrequencyHopping"] == "enabled"
            nhop = 1 if hop2 else 0
            sym = m + cfg["startingSymbolIndex"]
            u, v = group_and_sequence_hopping(cfg["pucch_GroupHopping"],
                                              cfg["hoppingId"], slot, nhop)
            alpha = cyclic_shift_hopping(self.m0, self.mcs, slot, sym,
                                         cfg["hoppingId"])
            ruv = lowpapr_seq(u, v, alpha, 12)
            prb = cfg["secondHopPRB"] if hop2 else cfg["startingPRB"]
            off = n_sc * sym + prb * 12
            fd_slot[0, off: off + 12] = ruv
            usage[0, off: off + 12] = _DATA
        return fd_slot, usage


class NrPUCCHFormat1(_PucchBase):
    """38.211 6.3.2.4 — ZC + OCC spreading + DMRS."""

    FMT = 1

    def __init__(self, carrier_config, cfg):
        super().__init__(carrier_config, cfg)
        n = cfg["numHARQbits"]
        harq = np.asarray(cfg["HARQbits"], np.int8)
        d0 = modulate_np(harq[:1], "bpsk") if n == 1 else \
            modulate_np(harq[:2], "qpsk")
        nsym = cfg["nrofSymbols"]
        d_list = np.zeros(nsym, np.complex64)
        d_list[0::2] = 1
        d_list[1::2] = d0
        self.d_list = d_list
        self.wm_list, self.sf0, self.dsf0 = format1_wm_list(
            cfg["intraSlotFrequencyHopping"], nsym, cfg["timeDomainOCC"])
        self.m0 = cfg["initialCyclicShift"]

    def process(self, fd_slot, usage, sfn, slot):
        cfg = self.cfg
        if not self._active(sfn, slot):
            return fd_slot, usage
        n_sc = 12 * self.prb_size
        for m in range(cfg["nrofSymbols"]):
            hop2 = (m >= self.sf0 + self.dsf0
                    and cfg["intraSlotFrequencyHopping"] == "enabled")
            sym = m + cfg["startingSymbolIndex"]
            u, v = group_and_sequence_hopping(cfg["pucch_GroupHopping"],
                                              cfg["hoppingId"], slot,
                                              1 if hop2 else 0)
            alpha = cyclic_shift_hopping(self.m0, 0, slot, sym,
                                         cfg["hoppingId"])
            ruv = lowpapr_seq(u, v, alpha, 12)
            zn = self.wm_list[m] * self.d_list[m] * ruv
            prb = cfg["secondHopPRB"] if hop2 else cfg["startingPRB"]
            off = n_sc * sym + prb * 12
            fd_slot[0, off: off + 12] = zn
            usage[0, off: off + 12] = _DATA
        return fd_slot, usage


class NrPUCCHFormat2(_PucchBase):
    """38.211 6.3.2.5 — UCI QPSK + DMRS every 3rd RE."""

    FMT = 2

    def process(self, fd_slot, usage, sfn, slot):
        cfg = self.cfg
        if not self._active(sfn, slot):
            return fd_slot, usage
        nprb, nsym = cfg["nrofPRBs"], cfg["nrofSymbols"]
        e_tot = nprb * 8 * 2 * nsym
        g_seq = encode_uci(cfg["UCIbits"], cfg["NumUCIBits"], e_tot)
        cinit = cfg["RNTI"] * (2 ** 15) + cfg["NID"]
        scr = gen_prbs_np(cinit, e_tot)
        d_seq = modulate_np((g_seq + scr) % 2, "qpsk")
        n_sc = 12 * self.prb_size
        nid0 = cfg["NID0"]
        for m in range(nsym):
            sym = m + cfg["startingSymbolIndex"]
            hop2 = m == 1 and cfg["intraSlotFrequencyHopping"] == "enabled"
            prb = cfg["secondHopPRB"] if hop2 else cfg["startingPRB"]
            dcinit = ((2 ** 17) * (14 * slot + sym + 1) * (2 * nid0 + 1)
                      + 2 * nid0) % (2 ** 31)
            rm = modulate_np(
                gen_prbs_np(dcinit, nprb * 4 * 2, offset=prb * 4 * 2),
                "qpsk")
            off = n_sc * sym + prb * 12
            fd_slot[0, off + 1: off + nprb * 12: 3] = rm
            usage[0, off + 1: off + nprb * 12: 3] = _DMRS
            d0 = m * nprb * 8
            fd_slot[0, off: off + nprb * 12: 3] = d_seq[d0: d0 + nprb * 8: 2]
            fd_slot[0, off + 2: off + nprb * 12: 3] = \
                d_seq[d0 + 1: d0 + nprb * 8: 2]
            usage[0, off: off + nprb * 12: 3] = _DATA
            usage[0, off + 2: off + nprb * 12: 3] = _DATA
        return fd_slot, usage


class _Format34Base(_PucchBase):
    def _mod(self, g_seq):
        cfg = self.cfg
        cinit = cfg["RNTI"] * (2 ** 15) + cfg["NID"]
        scr = gen_prbs_np(cinit, g_seq.size)
        b = (g_seq + scr) % 2
        mod = "qpsk" if cfg["pi2BPSK"] == "disabled" else "pi/2-bpsk"
        return modulate_np(b, mod)

    def _dmrs_map(self, fd_slot, usage, slot, dmrs_syms, msc, nprb, m0):
        cfg = self.cfg
        n_sc = 12 * self.prb_size
        nsym = cfg["nrofSymbols"]
        start = cfg["startingSymbolIndex"]
        for sym in dmrs_syms:
            hop2 = (cfg["intraSlotFrequencyHopping"] == "enabled"
                    and sym - start >= nsym // 2)
            prb = cfg["secondHopPRB"] if hop2 else cfg["startingPRB"]
            u, v = group_and_sequence_hopping(cfg["pucch_GroupHopping"],
                                              cfg["hoppingId"], slot,
                                              1 if hop2 else 0)
            alpha = cyclic_shift_hopping(m0, 0, slot, sym, cfg["hoppingId"])
            ruv = lowpapr_seq(u, v, alpha, msc)
            off = n_sc * sym + prb * 12
            fd_slot[0, off: off + nprb * 12] = ruv
            usage[0, off: off + nprb * 12] = _DMRS
        return fd_slot, usage


class NrPUCCHFormat3(_Format34Base):
    """38.211 6.3.2.6 — DFT-s-OFDM."""

    FMT = 3

    def process(self, fd_slot, usage, sfn, slot):
        cfg = self.cfg
        if not self._active(sfn, slot):
            return fd_slot, usage
        nprb, nsym = cfg["nrofPRBs"], cfg["nrofSymbols"]
        dmrs_syms, data_syms = format34_sym_info(
            nsym, cfg["startingSymbolIndex"], cfg["additionalDMRS"],
            cfg["intraSlotFrequencyHopping"])
        per_sym = 24 if cfg["pi2BPSK"] == "disabled" else 12
        e_tot = per_sym * len(data_syms) * nprb
        g_seq = encode_uci(cfg["UCIbits"], cfg["NumUCIBits"], e_tot)
        d_seq = self._mod(g_seq)
        msc = nprb * 12
        n_sc = 12 * self.prb_size
        start = cfg["startingSymbolIndex"]
        off_d = 0
        for sym in data_syms:
            hop2 = (cfg["intraSlotFrequencyHopping"] == "enabled"
                    and sym - start >= nsym // 2)
            prb = cfg["secondHopPRB"] if hop2 else cfg["startingPRB"]
            ym = d_seq[off_d: off_d + msc]
            off_d += msc
            zk = np.fft.fft(ym) / math.sqrt(msc)
            off = n_sc * sym + prb * 12
            fd_slot[0, off: off + msc] = zk
            usage[0, off: off + msc] = _DATA
        return self._dmrs_map(fd_slot, usage, slot, dmrs_syms, msc, nprb, 0)


class NrPUCCHFormat4(_Format34Base):
    """38.211 6.3.2.6 with block-wise OCC — single PRB."""

    FMT = 4

    _OCC2 = [[1, 1], [1, -1]]
    _OCC4 = [[1, 1, 1, 1], [1, -1j, -1, 1j], [1, -1, 1, -1], [1, 1j, -1, -1j]]

    def process(self, fd_slot, usage, sfn, slot):
        cfg = self.cfg
        if not self._active(sfn, slot):
            return fd_slot, usage
        nsym = cfg["nrofSymbols"]
        occ_len, occ_idx = cfg["occ_Length"], cfg["occ_index"]
        dmrs_syms, data_syms = format34_sym_info(
            nsym, cfg["startingSymbolIndex"], cfg["additionalDMRS"],
            cfg["intraSlotFrequencyHopping"])
        per_sym = 24 if cfg["pi2BPSK"] == "disabled" else 12
        e_tot = per_sym * len(data_syms) // occ_len
        g_seq = encode_uci(cfg["UCIbits"], cfg["NumUCIBits"], e_tot)
        d_seq = self._mod(g_seq)
        msc = 12
        n_sc = 12 * self.prb_size
        start = cfg["startingSymbolIndex"]
        wnk = (self._OCC2 if occ_len == 2 else self._OCC4)[occ_idx]
        off_d = 0
        chunk = msc // occ_len
        for sym in data_syms:
            hop2 = (cfg["intraSlotFrequencyHopping"] == "enabled"
                    and sym - start >= nsym // 2)
            prb = cfg["secondHopPRB"] if hop2 else cfg["startingPRB"]
            sel = d_seq[off_d: off_d + chunk]
            off_d += chunk
            ym = np.concatenate([w * sel for w in wnk])
            zk = np.fft.fft(ym) / math.sqrt(msc)
            off = n_sc * sym + prb * 12
            fd_slot[0, off: off + msc] = zk
            usage[0, off: off + msc] = _DATA
        m0 = [0, 6, 3, 9][occ_idx]
        return self._dmrs_map(fd_slot, usage, slot, dmrs_syms, msc, 1, m0)
