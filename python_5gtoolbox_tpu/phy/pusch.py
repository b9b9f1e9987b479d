"""PUSCH transmit chain: ULSCH + UCI coding, DMRS, DFT-s-OFDM, precoding.

Behavior parity targets:
  py5gphy/nr_pusch/nr_ulsch.py            (CRC/segment + LDPC + RM,
                                           I_LBRM=0: Ncb = N)
  py5gphy/nr_pusch/nr_pusch_process.py:9  (scrambling with x/y UCI
                                           placeholder bits, pi/2-BPSK..
                                           256QAM, layer map, DFT
                                           transform precoding, precode)
  py5gphy/nr_pusch/nr_pusch_dmrs.py       (type-1 DMRS with/without
                                           transform precoding, ZC group/
                                           sequence hopping)
  py5gphy/nr_pusch/nr_pusch_precoding.py:6 (codebook tables 38.211
                                           6.3.1.5 for 1/2 ports)
  py5gphy/nr_pusch/nrpusch_resource_mapping.py (prepare/commit)
  py5gphy/nr_pusch/nr_pusch.py:19-115     (NrPUSCH object)

TPU design: ULSCH LDPC encode+rate-match is the jitted batched path
(same kernel family as DLSCH); UCI coding and the 6.2.7 multiplex are
plan-time host index walks; scrambling/modulation/DFT/precoding are a
single jitted function. The x/y placeholder scrambling special case is
vectorized (no bit-serial loop): x -> 1, y -> previous scrambled bit.
"""
from __future__ import annotations

import functools
import math

import numpy as np
from python_5gtoolbox_tpu.utils.host import to_device, to_host
import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import crc as crc_ops
from python_5gtoolbox_tpu.ops import ldpc as ldpc_ops
from python_5gtoolbox_tpu.ops.modulation import modulate, modulate_np
from python_5gtoolbox_tpu.ops.lowpapr import lowpapr_seq
from python_5gtoolbox_tpu.ops.prbs import gen_prbs_np
from python_5gtoolbox_tpu.phy import tbsize as tbs_mod
from python_5gtoolbox_tpu.phy.pusch_uci import (
    data_control_multiplex, encode_uci_on_ulsch, get_ulsch_rm_info)
from python_5gtoolbox_tpu.utils.numerology import RE_USAGE, carrier_prb_size

_QM_NAME = {1: "pi/2-bpsk", 2: "qpsk", 4: "16qam", 6: "64qam", 8: "256qam"}


def ulsch_crc_segment(trblk: np.ndarray, tbsize: int, rate1024: float):
    """TB CRC + BG selection + CB segmentation (38.212 6.2.1-6.2.3)."""
    poly = "24A" if tbsize > 3824 else "16"
    blkandcrc = crc_ops.crc_encode_np(np.asarray(trblk, np.int8), poly)
    bgn = 1
    if (tbsize <= 292 or (tbsize <= 3824 and rate1024 <= 0.67 * 1024)
            or rate1024 <= 0.25 * 1024):
        bgn = 2
    info = ldpc_ops.get_cbs_info(blkandcrc.size, bgn)
    return blkandcrc, info, bgn


@functools.partial(jax.jit, static_argnames=(
    "cbz", "L", "K", "C", "zc", "bgn", "qm", "n_layers", "rv", "G"))
def _ulsch_encode_jit(blkandcrc, cbz, L, K, C, zc, bgn, qm, n_layers, rv, G):
    info = ldpc_ops.CBInfo(C=C, cbz=cbz, L=L, F=K - cbz - L, K=K, Zc=zc,
                           bgn=bgn)
    lead = blkandcrc.shape[:-1]
    cbs = blkandcrc.reshape(lead + (C, cbz)).astype(jnp.int8)
    if C > 1:
        cbs = crc_ops.crc_encode(cbs, "24B")
    pad = K - cbs.shape[-1]
    if pad:
        cbs = jnp.concatenate(
            [cbs, jnp.zeros(lead + (C, pad), jnp.int8)], axis=-1)
    dn = ldpc_ops.ldpc_encode(cbs.reshape((-1, K)), bgn)
    dn = dn.reshape(lead + (C, dn.shape[-1]))
    er_list = ldpc_ops.get_er_ldpc(G, C, qm, n_layers)
    outs = []
    c0 = 0
    while c0 < C:
        E = er_list[c0]
        c1 = c0
        while c1 < C and er_list[c1] == E:
            c1 += 1
        fe = ldpc_ops.ldpc_ratematch(dn[..., c0:c1, :], info, E, rv,
                                     qm)  # Ncb = N (no UL LBRM here)
        outs.append(fe.reshape(lead + ((c1 - c0) * E,)))
        c0 = c1
    return jnp.concatenate(outs, axis=-1)


def ulsch_encode(trblk, tbsize, qm, rate1024, n_layers, rv, g_ulsch):
    """Full ULSCH bit chain -> (G_ULSCH,) int8 (host in, host out)."""
    blkandcrc, info, bgn = ulsch_crc_segment(trblk, tbsize, rate1024)
    return np.asarray(_ulsch_encode_jit(
        jnp.asarray(blkandcrc), info.cbz, info.L, info.K, info.C, info.Zc,
        bgn, qm, n_layers, rv, g_ulsch))


def ulsch_encode_batch(trb, tbsize, qm, rate1024, n_layers, rv, g_ulsch):
    """(..., TBSize) -> (..., G_ULSCH) coded bits, everything on device.

    Slot-batched analogue of ulsch_encode (same 38.212 6.2 chain,
    reference py5gphy/nr_pusch/nr_ulsch.py:13-60) for tx_grid_batch."""
    poly = "24A" if tbsize > 3824 else "16"
    blkandcrc = crc_ops.crc_encode(jnp.asarray(trb, jnp.int8), poly)
    bgn = 1
    if (tbsize <= 292 or (tbsize <= 3824 and rate1024 <= 0.67 * 1024)
            or rate1024 <= 0.25 * 1024):
        bgn = 2
    info = ldpc_ops.get_cbs_info(blkandcrc.shape[-1], bgn)
    return _ulsch_encode_jit(
        blkandcrc, info.cbz, info.L, info.K, info.C, info.Zc, bgn, qm,
        n_layers, rv, g_ulsch)


def get_precoding_matrix(n_layers: int, n_ports: int, npmi: int) -> np.ndarray:
    """Codebook W, 38.211 Tables 6.3.1.5-1/-4 (1-2 ports as reference)."""
    if n_layers == 1 and n_ports == 1:
        return np.array([[1]], np.complex64)
    if n_layers == 1 and n_ports == 2:
        assert npmi <= 5
        t = np.array([[1, 0], [0, 1], [1, 1], [1, -1], [1, 1j], [1, -1j]],
                     np.complex64) / math.sqrt(2)
        return t[npmi].reshape(2, 1)
    if n_layers == 2 and n_ports == 2:
        assert npmi <= 2
        mats = [np.array([[1, 0], [0, 1]]) / math.sqrt(2),
                np.array([[1, 1], [1, -1]]) / 2,
                np.array([[1, 1], [1j, -1j]]) / 2]
        return np.asarray(mats[npmi], np.complex64)
    raise ValueError(f"unsupported codebook: {n_layers} layers, "
                     f"{n_ports} ports")


@functools.partial(jax.jit, static_argnames=(
    "qm", "n_layers", "n_transprecode", "msc"))
def pusch_symbol_encode(g_seq, scramble_seq, precoding, qm: int,
                        n_layers: int, n_transprecode: int, msc: int):
    """Scramble (w/ placeholders) + modulate + layer map + DFT + precode."""
    g = g_seq.astype(jnp.int32)
    base = jnp.bitwise_xor(jnp.maximum(g, 0).astype(jnp.int8), scramble_seq)
    # x placeholder (-1) -> 1 ; y placeholder (-2) -> previous output bit
    scrambled = jnp.where(g == -1, jnp.int8(1), base)
    prev = jnp.roll(scrambled, 1, axis=-1)
    scrambled = jnp.where(g == -2, prev, scrambled)
    syms = modulate(scrambled, _QM_NAME[qm])
    n = syms.shape[-1]
    xi = jnp.swapaxes(
        syms.reshape(syms.shape[:-1] + (n // n_layers, n_layers)), -1, -2)
    if n_transprecode:
        per = xi.shape[-1]
        y = xi.reshape(xi.shape[:-1] + (per // msc, msc))
        y = jnp.fft.fft(y, axis=-1) / np.sqrt(msc)
        xi = y.reshape(xi.shape)
    return jnp.einsum("al,...lr->...ar",
                      precoding.astype(jnp.complex64), xi)


def pusch_dmrs_symlist(ld: int, add_pos: int):
    """38.211 Table 6.4.1.1.3-3 (type A, pos2, single symbol)."""
    from python_5gtoolbox_tpu.phy.pdsch import get_dmrs_symlist
    return get_dmrs_symlist(ld, add_pos)


def _dmrs_seq_no_tp(n_scid, nid, start6, size6, slot, sym):
    cinit = ((((14 * slot + sym + 1) * (2 * nid + 1)) << 17)
             + 2 * nid + n_scid) % (2 ** 31)
    seq = gen_prbs_np(cinit, 2 * size6, offset=2 * start6)
    return modulate_np(seq, "qpsk")


def _dmrs_seq_tp(n_pusch_id, hopping, size, slot, sym):
    fgh, v = 0, 0
    if hopping == "groupHopping":
        seq = gen_prbs_np(n_pusch_id // 30, 8, offset=8 * (slot * 14 + sym))
        fgh = int(np.sum(seq * (2 ** np.arange(8)))) % 30
    elif hopping == "sequenceHopping":
        if size >= 72:
            v = int(gen_prbs_np(n_pusch_id, 1, offset=slot * 14 + sym)[0])
    u = (fgh + n_pusch_id) % 30
    return lowpapr_seq(u, v, 0.0, size)


class NrPUSCH:
    """PUSCH channel object (TX + RX), reference process() protocol.
    RX methods are attached from phy/pusch_rx.py at import time."""

    def __init__(self, carrier_config: dict, pusch_config: dict):
        from python_5gtoolbox_tpu.phy.validate import validate_pusch_config
        validate_pusch_config(carrier_config, pusch_config)
        self.carrier = carrier_config
        self.cfg = pusch_config
        self.prb_size = carrier_prb_size(carrier_config["scs"],
                                         carrier_config["BW"])
        tbsize, qm, rate = tbs_mod.ulsch_tbsize(self.cfg)
        self.tbsize, self.qm, self.rate1024 = tbsize, qm, rate
        self.rvidx = -1
        self.trblk = None

    def getnextrv(self):
        rvlist = self.cfg["rv"]
        self.rvidx = (self.rvidx + 1) % len(rvlist)
        return rvlist[self.rvidx]

    def get_trblk(self, tbsize):
        src = list(self.cfg.get("data_source", []))
        if not src:
            return np.random.randint(2, size=tbsize).astype(np.int8)
        reps = tbsize // len(src) + 1
        return np.asarray((src * reps)[:tbsize], np.int8)

    def tx_batch_supported(self) -> bool:
        """True when tx_grid_batch can reproduce process() with static
        slices only: ULSCH-only payload (no UCI — the no-UCI 6.2.7
        multiplex walk is the identity on g_ulsch), type-1 single-symbol
        DMRS inside the allocation, unambiguous data comb."""
        cfg, dmrs = self.cfg, self.cfg["DMRS"]
        if cfg["EnableULSCH"] != 1:
            return False
        if (cfg["EnableACK"] * cfg["NumACKBits"]
                or cfg["EnableCSI1"] * cfg["NumCSI1Bits"]
                or cfg["EnableCSI2"] * cfg["NumCSI2Bits"]):
            return False
        if dmrs["DMRSConfigType"] != 1 or dmrs["NrOfDMRSSymbols"] != 1:
            return False
        start = cfg["StartSymbolIndex"]
        ld = start + cfg["NrOfSymbols"]
        syms = pusch_dmrs_symlist(ld, dmrs["DMRSAddPos"])
        if any(s < start or s >= ld for s in syms):
            return False
        combs = {((p - 1000) // 2) % 2
                 for p in cfg["PortIndexList"][:cfg["num_of_layers"]]}
        if dmrs["NumCDMGroupsWithoutData"] == 1 and len(combs) != 1:
            return False
        return True

    def _tx_layout(self):
        cfg, dmrs = self.cfg, self.cfg["DMRS"]
        start = cfg["StartSymbolIndex"]
        n_sym = cfg["NrOfSymbols"]
        dmrs_syms = tuple(pusch_dmrs_symlist(start + n_sym,
                                             dmrs["DMRSAddPos"]))
        cdm = dmrs["NumCDMGroupsWithoutData"]
        comb = ((cfg["PortIndexList"][0] - 1000) // 2) % 2
        rb_start = cfg["ResAlloType1"]["RBStart"]
        rb_size = cfg["ResAlloType1"]["RBSize"]
        n_data_re = (n_sym - len(dmrs_syms)) * rb_size * 12
        if cdm == 1:
            n_data_re += len(dmrs_syms) * rb_size * 6
        layout = (12 * self.prb_size, rb_start, rb_size, start, n_sym,
                  dmrs_syms, cdm, 1 - comb)
        return layout, n_data_re

    def _dmrs_values(self, slot: int, precoding=None) -> np.ndarray:
        """Precoded DMRS vectors for one slot: (nd, ant, rb12) complex64
        (host; same math as _dmrs_process without the grid writes)."""
        cfg, dmrs = self.cfg, self.cfg["DMRS"]
        if precoding is None:
            precoding = get_precoding_matrix(
                cfg["num_of_layers"], cfg["nNrOfAntennaPorts"], cfg["nPMI"])
        rb_start = cfg["ResAlloType1"]["RBStart"]
        rb_size = cfg["ResAlloType1"]["RBSize"]
        symlist = pusch_dmrs_symlist(
            cfg["StartSymbolIndex"] + cfg["NrOfSymbols"],
            dmrs["DMRSAddPos"])
        n_layers = cfg["num_of_layers"]
        ports = cfg["PortIndexList"]
        scaling = (1.0 if dmrs["NumCDMGroupsWithoutData"] == 1
                   else 10 ** (-3 / 20))
        n_scid = dmrs["nSCID"]
        tpd = dmrs["transformPrecodingDisabled"]
        nid = int(tpd["NID0"] if n_scid == 0 else tpd["NID1"])
        tpe = dmrs["transformPrecodingEnabled"]
        out = np.zeros((len(symlist), precoding.shape[0],
                        rb_size * 12), np.complex64)
        for k, sym in enumerate(symlist):
            if cfg["nTransPrecode"] == 0:
                seq = _dmrs_seq_no_tp(n_scid, nid, rb_start * 6,
                                      rb_size * 6, slot, sym)
            else:
                seq = _dmrs_seq_tp(tpe["nPuschID"],
                                   tpe["groupOrSequenceHopping"],
                                   rb_size * 6, slot, sym)
            data = np.zeros((n_layers, rb_size * 12), np.complex64)
            for m in range(n_layers):
                d0 = ports[m] - 1000
                delta = (d0 // 2) % 2
                wf1 = 1 - (d0 % 2) * 2
                data[m, 0 + delta::4] = scaling * seq[0::2]
                data[m, 2 + delta::4] = scaling * wf1 * seq[1::2]
            out[k] = precoding @ data
        return out

    def tx_grid_batch(self, slot_list, roll_ant: int = 0):
        """Slot-batched device TX: one traced ULSCH encode + symbol
        encode + grid compose for every allocated slot in slot_list ->
        (S, ant, 14, n_sc) device complex64 grids (gated slots all-zero).

        UL analogue of Pdsch.tx_grid_batch: replaces the reference's
        per-slot process() loop (py5gphy/nr_waveform/nr_ul_waveform.py:
        52-103 + nr_pusch/nr_pusch_process.py:9-70) with ULSCH encode
        batched over slots x CBs and a static-slice grid composition
        (phy/pdsch._pdsch_compose_grid — the UL layout is structurally
        identical). rv cycling / trblk regeneration match process().
        Gated by tx_batch_supported() (no UCI: the 6.2.7 multiplex is
        then the identity, so g_seq == the batched ULSCH bits).
        """
        from python_5gtoolbox_tpu.phy.pdsch import _pdsch_compose_grid
        cfg = self.cfg
        n_layers = cfg["num_of_layers"]
        n_ant = self.carrier["num_of_ant"]
        pm = get_precoding_matrix(n_layers, cfg["nNrOfAntennaPorts"],
                                  cfg["nPMI"])
        prec = np.roll(pm, -roll_ant, axis=0) if roll_ant else pm
        layout, n_data_re = self._tx_layout()
        n_sc = layout[0]
        s_dim = len(slot_list)

        active_idx, rvs, trblks = [], [], []
        for i, slot in enumerate(slot_list):
            if (slot % cfg["period_in_slot"]) not in cfg["allocated_slots"]:
                continue
            rv = self.getnextrv()
            if self.rvidx == 0 or self.trblk is None:
                self.trblk = self.get_trblk(self.tbsize)
            active_idx.append(i)
            rvs.append(rv)
            trblks.append(self.trblk)
        if not active_idx:
            return jnp.zeros((s_dim, n_ant, 14, n_sc), jnp.complex64)

        g_total = self.qm * n_layers * n_data_re
        trb = jnp.asarray(np.stack(trblks))              # (Sa, A)
        cache = getattr(self, "_tx_dev_cache", None)
        if cache is None:
            cache = self._tx_dev_cache = {}
        uniq = sorted(set(rvs))
        if len(uniq) == 1:
            g_seq = ulsch_encode_batch(trb, self.tbsize, self.qm,
                                       self.rate1024, n_layers, uniq[0],
                                       g_total)
        else:
            g_seq = jnp.zeros((len(rvs), g_total), jnp.int8)
            for rv in uniq:
                idx = [k for k, v in enumerate(rvs) if v == rv]
                gk = ulsch_encode_batch(trb[np.asarray(idx)], self.tbsize,
                                        self.qm, self.rate1024, n_layers,
                                        rv, g_total)
                g_seq = g_seq.at[np.asarray(idx)].set(gk.astype(jnp.int8))
        cinit = cfg["rnti"] * (2 ** 15) + cfg["nNid"]
        scr_key = ("scr", cinit, g_total)
        if scr_key not in cache:
            cache[scr_key] = jnp.asarray(gen_prbs_np(cinit, g_total))
        precoded = pusch_symbol_encode(
            g_seq, cache[scr_key], to_device(prec), self.qm, n_layers,
            cfg["nTransPrecode"],
            cfg["ResAlloType1"]["RBSize"] * 12)          # (Sa, ant, n_re)
        dmrs_key = ("dmrs", roll_ant) + tuple(
            int(slot_list[i]) for i in active_idx)
        if dmrs_key not in cache:
            cache[dmrs_key] = to_device(np.stack(
                [self._dmrs_values(int(slot_list[i]), precoding=prec)
                 for i in active_idx]))
        grid = _pdsch_compose_grid(precoded, cache[dmrs_key], layout)
        if len(active_idx) != s_dim:
            grid = jnp.zeros((s_dim, n_ant, 14, n_sc), jnp.complex64) \
                .at[np.asarray(active_idx)].set(grid)
        return grid

    def process(self, fd_slot: np.ndarray, usage: np.ndarray, slot: int):
        if (slot % self.cfg["period_in_slot"]) not in self.cfg["allocated_slots"]:
            return fd_slot, usage
        cfg = self.cfg
        rv = self.getnextrv()
        if self.rvidx == 0 or self.trblk is None:
            self.trblk = self.get_trblk(self.tbsize)
        n_layers = cfg["num_of_layers"]

        fd_slot, usage, dmrs_symlist = self._dmrs_process(fd_slot, usage, slot)
        usage, n_data_re = self._data_mapping_prepare(usage)
        g_total = self.qm * n_layers * n_data_re

        g_seq = self._ulsch_uci_process(self.trblk, g_total, rv, dmrs_symlist)

        cinit = cfg["rnti"] * (2 ** 15) + cfg["nNid"]
        scr = jnp.asarray(gen_prbs_np(cinit, g_total))
        pm = get_precoding_matrix(n_layers, cfg["nNrOfAntennaPorts"],
                                  cfg["nPMI"])
        precoded = to_host(pusch_symbol_encode(
            jnp.asarray(g_seq), scr, to_device(pm), self.qm, n_layers,
            cfg["nTransPrecode"], cfg["ResAlloType1"]["RBSize"] * 12))
        fd_slot = self._data_mapping_commit(precoded, fd_slot, usage)
        return fd_slot, usage

    def _ulsch_uci_process(self, trblk, g_total, rv, dmrs_symlist):
        cfg = self.cfg
        qm, rate = self.qm, self.rate1024
        n_layers = cfg["num_of_layers"]
        if cfg["EnableULSCH"] == 1:
            blkandcrc, info, bgn = ulsch_crc_segment(trblk, self.tbsize, rate)
            ulsch_size = info.C * info.K
        else:
            ulsch_size = 0
        rm = get_ulsch_rm_info(cfg, dmrs_symlist, ulsch_size, qm, rate,
                               g_total)
        if cfg["EnableULSCH"] == 1:
            g_ulsch = ulsch_encode(trblk, self.tbsize, qm, rate, n_layers,
                                   rv, rm["G_ULSCH"])
        else:
            g_ulsch = np.array([], np.int8)
        g_ack = g_csi1 = g_csi2 = np.array([], np.int8)
        if cfg["EnableACK"] * cfg["NumACKBits"] > 0:
            g_ack = encode_uci_on_ulsch(cfg["ACKbits"], cfg["NumACKBits"],
                                        rm["Euci_ack"], qm)
        if cfg["EnableCSI1"] * cfg["NumCSI1Bits"] > 0:
            g_csi1 = encode_uci_on_ulsch(cfg["CSI1bits"], cfg["NumCSI1Bits"],
                                         rm["Euci_CSI1"], qm)
        if cfg["EnableCSI2"] * cfg["NumCSI2Bits"] > 0:
            g_csi2 = encode_uci_on_ulsch(cfg["CSI2bits"], cfg["NumCSI2Bits"],
                                         rm["Euci_CSI2"], qm)
        return data_control_multiplex(g_ulsch, g_ack, g_csi1, g_csi2, cfg,
                                      g_total, dmrs_symlist, rm, qm)

    def _dmrs_process(self, fd_slot, usage, slot):
        cfg, dmrs = self.cfg, self.cfg["DMRS"]
        assert dmrs["DMRSConfigType"] == 1 and dmrs["NrOfDMRSSymbols"] == 1
        assert dmrs["PUSCHMappintType"] == "A"
        assert dmrs["dmrs_TypeA_Position"] == "pos2"
        rb_start = cfg["ResAlloType1"]["RBStart"]
        rb_size = cfg["ResAlloType1"]["RBSize"]
        ld = cfg["StartSymbolIndex"] + cfg["NrOfSymbols"]
        symlist = pusch_dmrs_symlist(ld, dmrs["DMRSAddPos"])
        n_layers = cfg["num_of_layers"]
        ports = cfg["PortIndexList"]
        n_sc = 12 * self.prb_size
        ncdm = dmrs["NumCDMGroupsWithoutData"]
        scaling = 1.0 if ncdm == 1 else 10 ** (-3 / 20)
        n_scid = dmrs["nSCID"]
        tpd = dmrs["transformPrecodingDisabled"]
        nid = int(tpd["NID0"] if n_scid == 0 else tpd["NID1"])
        tpe = dmrs["transformPrecodingEnabled"]

        pm = get_precoding_matrix(n_layers, cfg["nNrOfAntennaPorts"],
                                  cfg["nPMI"])
        for sym in symlist:
            if cfg["nTransPrecode"] == 0:
                seq = _dmrs_seq_no_tp(n_scid, nid, rb_start * 6, rb_size * 6,
                                      slot, sym)
            else:
                seq = _dmrs_seq_tp(tpe["nPuschID"],
                                   tpe["groupOrSequenceHopping"],
                                   rb_size * 6, slot, sym)
            data = np.zeros((n_layers, rb_size * 12), np.complex64)
            for m in range(n_layers):
                d0 = ports[m] - 1000
                delta = (d0 // 2) % 2
                wf1 = 1 - (d0 % 2) * 2
                data[m, 0 + delta::4] = scaling * seq[0::2]
                data[m, 2 + delta::4] = scaling * wf1 * seq[1::2]
                base = sym * n_sc + rb_start * 12
                usage[m:, base + delta: base + rb_size * 12: 2] = \
                    RE_USAGE["PUSCH-DMRS"]
                if ncdm == 2:
                    usage[m:, base + (1 - delta): base + rb_size * 12: 2] = \
                        RE_USAGE["PUSCH-DMRS-RSV"]
            precoded = pm @ data
            base = sym * n_sc + rb_start * 12
            fd_slot[:, base: base + rb_size * 12] = precoded
        return fd_slot, usage, symlist

    def _data_mapping_prepare(self, usage):
        cfg = self.cfg
        rb_start = cfg["ResAlloType1"]["RBStart"]
        rb_size = cfg["ResAlloType1"]["RBSize"]
        n_sc = 12 * self.prb_size
        count = 0
        for m in range(cfg["NrOfSymbols"]):
            sym = m + cfg["StartSymbolIndex"]
            start = sym * n_sc + rb_start * 12
            seg = usage[:, start: start + rb_size * 12]
            empty = seg[0] == RE_USAGE["empty"]
            count += int(empty.sum())
            seg[seg == RE_USAGE["empty"]] = RE_USAGE["PUSCH-DATA"]
        return usage, count

    def _data_mapping_commit(self, precoded, fd_slot, usage):
        cfg = self.cfg
        rb_start = cfg["ResAlloType1"]["RBStart"]
        rb_size = cfg["ResAlloType1"]["RBSize"]
        n_sc = 12 * self.prb_size
        off = 0
        for sym in range(cfg["StartSymbolIndex"],
                         cfg["StartSymbolIndex"] + cfg["NrOfSymbols"]):
            start = sym * n_sc + rb_start * 12
            mask = usage[0, start: start + rb_size * 12] == RE_USAGE["PUSCH-DATA"]
            n = int(mask.sum())
            if n:
                seg = fd_slot[:, start: start + rb_size * 12]
                seg[:, mask] = precoded[:, off: off + n]
                off += n
        return fd_slot


def _attach_rx_methods():
    """Attach the receive path (phy/pusch_rx.py) to NrPUSCH."""
    from python_5gtoolbox_tpu.phy import pusch_rx

    NrPUSCH.H_LS_est = pusch_rx.PuschRxMixin.H_LS_est
    NrPUSCH.RX_process = pusch_rx.PuschRxMixin.RX_process
    NrPUSCH.rx_process_batch = pusch_rx.PuschRxMixin.rx_process_batch
    NrPUSCH._batch_ul_uci_fn = pusch_rx.PuschRxMixin._batch_ul_uci_fn


_attach_rx_methods()
