"""PDSCH transmit chain: DLSCH coding, modulation, DMRS, RE mapping.

Behavior parity targets:
  py5gphy/nr_pdsch/nr_dlsch.py:12-74      (TB-CRC 24A/16, BG select, CB
                                           segment, LDPC, LBRM rate match,
                                           concatenation)
  py5gphy/nr_pdsch/nr_pdsch_process.py:8  (scramble, modulate, layer map,
                                           precode)
  py5gphy/nr_pdsch/nr_pdsch_dmrs.py:10    (type-1 single-symbol DMRS with
                                           CDM weights, EPRE scaling,
                                           SSB-PRB skipping)
  py5gphy/nr_pdsch/nrpdsch_resource_mapping.py (prepare/commit mapping
                                           around reserved REs)
  py5gphy/nr_pdsch/nr_pdsch.py:17-128     (Pdsch object, rv cycling,
                                           data_source, slot gating)

TPU design: the whole bit-to-precoded-symbols path (CRC -> segmentation
-> LDPC -> rate match -> scramble -> QAM -> layer map -> precode) is ONE
jitted device function per (config, rv) with static shapes; Er-group
raggedness is handled by splitting code blocks into (at most two)
uniform-Er groups. The host side only does RE index bookkeeping on the
usage map.
"""
from __future__ import annotations

import functools

import numpy as np
from python_5gtoolbox_tpu.utils.host import to_device, to_host
import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import crc as crc_ops
from python_5gtoolbox_tpu.ops import ldpc as ldpc_ops
from python_5gtoolbox_tpu.ops.modulation import modulate
from python_5gtoolbox_tpu.ops.prbs import gen_prbs_np
from python_5gtoolbox_tpu.ops.modulation import modulate_np
from python_5gtoolbox_tpu.phy import tbsize as tbs_mod
from python_5gtoolbox_tpu.utils.numerology import RE_USAGE, carrier_prb_size

_QM_NAME = {2: "qpsk", 4: "16qam", 6: "64qam", 8: "256qam"}


# ---------------------------------------------------------------------------
# DLSCH encode (jitted, batched over code blocks)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "tbsize", "qm", "rate1024", "n_layers", "rv", "tbs_lbrm", "G"))
def dlsch_encode(trblk, tbsize: int, qm: int, rate1024: float,
                 n_layers: int, rv: int, tbs_lbrm: int, G: int):
    """(..., TBSize) bits -> (..., G) rate-matched coded bits (38.212 7.2)."""
    A = tbsize
    poly = "24A" if A > 3824 else "16"
    blkandcrc = crc_ops.crc_encode(trblk, poly)
    bgn = 1
    if (A <= 292 or (A <= 3824 and rate1024 <= 0.67 * 1024)
            or rate1024 <= 0.25 * 1024):
        bgn = 2
    info = ldpc_ops.get_cbs_info(blkandcrc.shape[-1], bgn)
    cbs = _cb_segment_batched(blkandcrc, info)          # (..., C, K)
    lead = cbs.shape[:-2]
    dn = ldpc_ops.ldpc_encode(cbs.reshape((-1, info.K)), bgn)
    dn = dn.reshape(lead + (info.C, dn.shape[-1]))      # (..., C, N)

    ncb = min(info.N, int(np.floor(tbs_lbrm / (info.C * 2 / 3))))
    er_list = ldpc_ops.get_er_ldpc(G, info.C, qm, n_layers)
    # at most two distinct Er values, contiguous groups
    outs = []
    c0 = 0
    while c0 < info.C:
        E = er_list[c0]
        c1 = c0
        while c1 < info.C and er_list[c1] == E:
            c1 += 1
        grp = dn[..., c0:c1, :]
        fe = ldpc_ops.ldpc_ratematch(grp, info, E, rv, qm, Ncb=ncb)
        outs.append(fe.reshape(lead + ((c1 - c0) * E,)))
        c0 = c1
    return jnp.concatenate(outs, axis=-1)


def _cb_segment_batched(blkandcrc, info):
    """(..., B) -> (..., C, K) with CB-CRC24B and zero fillers."""
    lead = blkandcrc.shape[:-1]
    cbs = blkandcrc.reshape(lead + (info.C, info.cbz))
    if info.C > 1:
        cbs = crc_ops.crc_encode(cbs, "24B")
    pad = info.K - (info.cbz + info.L)
    if pad:
        cbs = jnp.concatenate(
            [cbs, jnp.zeros(lead + (info.C, pad), jnp.int8)], axis=-1)
    return cbs


@functools.partial(jax.jit, static_argnames=(
    "qm", "n_layers", "n_ant", "cinit", "G"))
def pdsch_symbol_encode(g_seq, scramble_seq, precoding, qm: int,
                        n_layers: int, n_ant: int, cinit: int, G: int):
    """Scramble + modulate + layer map + precode -> (..., ant, n_re)."""
    scrambled = jnp.bitwise_xor(g_seq.astype(jnp.int8), scramble_seq)
    syms = modulate(scrambled, _QM_NAME[qm])            # (..., G/Qm)
    n = syms.shape[-1]
    xi = jnp.swapaxes(
        syms.reshape(syms.shape[:-1] + (n // n_layers, n_layers)), -1, -2)
    # HIGHEST: the layer->antenna map is a tiny-K selection matmul; TPU
    # default precision would round the QAM symbol values to bf16 and
    # break IQ parity with the reference (atol 1e-5 waveform tests)
    return jnp.einsum("al,...lr->...ar", precoding.astype(jnp.complex64),
                      xi, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("layout",))
def _pdsch_compose_grid(data_syms, dmrs_vals, layout):
    """Compose slot grids from the batched data/DMRS streams.

    data_syms: (S, ant, n_data_re) complex64 precoded data REs in the
    reference's mapping order (symbol-major, RE-ascending,
    nrpdsch_resource_mapping.py:58); dmrs_vals: (S, nd, ant, rb12)
    precoded DMRS symbol vectors (zeros on the data comb).
    -> (S, ant, 14, n_sc) grids. Grid composition is all static slices,
    reshapes and concats — no gather/scatter (TPU gathers serialize to
    ~1 element/cycle).
    """
    (n_sc, rb_start, rb_size, start_sym, n_sym, dmrs_syms, cdm,
     data_comb) = layout
    s_dim, nant = data_syms.shape[0], data_syms.shape[1]
    rb12, rb6 = rb_size * 12, rb_size * 6
    regions = {}
    off = 0
    for sym in range(start_sym, start_sym + n_sym):
        if sym in dmrs_syms:
            dv = dmrs_vals[:, dmrs_syms.index(sym)]      # (S, ant, rb12)
            if cdm == 1:
                d = jax.lax.slice_in_dim(data_syms, off, off + rb6,
                                         axis=-1)
                off += rb6
                region = dv.reshape(s_dim, nant, rb6, 2) \
                    .at[..., data_comb].set(d).reshape(s_dim, nant, rb12)
            else:
                region = dv
        else:
            region = jax.lax.slice_in_dim(data_syms, off, off + rb12,
                                          axis=-1)
            off += rb12
        regions[sym] = region
    left = rb_start * 12
    right = n_sc - left - rb12
    zsym = jnp.zeros((s_dim, nant, n_sc), jnp.complex64)
    cols = []
    for sym in range(14):
        if sym not in regions:
            cols.append(zsym)
            continue
        parts = []
        if left:
            parts.append(jnp.zeros((s_dim, nant, left), jnp.complex64))
        parts.append(regions[sym].astype(jnp.complex64))
        if right:
            parts.append(jnp.zeros((s_dim, nant, right), jnp.complex64))
        cols.append(jnp.concatenate(parts, axis=-1)
                    if len(parts) > 1 else parts[0])
    return jnp.stack(cols, axis=2)


# ---------------------------------------------------------------------------
# DMRS (host-side: sequences + index math per slot)
# ---------------------------------------------------------------------------

def pdsch_dmrs_seq(dmrs_cfg: dict, rb_start: int, rb_size: int, slot: int,
                   sym: int, ref_point_prb: int = 0) -> np.ndarray:
    """r(n) for one DMRS symbol (38.211 7.4.1.1.1), type 1: 6 RE/PRB."""
    n_scid = dmrs_cfg["nSCID"]
    nid = dmrs_cfg["nNIDnSCID"]
    cinit = ((((14 * slot + sym + 1) * (2 * nid + 1)) << 17)
             + 2 * nid + n_scid) % (2 ** 31)
    start = (ref_point_prb + rb_start) * 6
    seq = gen_prbs_np(cinit, 2 * rb_size * 6, offset=2 * start)
    return modulate_np(seq, "qpsk")


class Pdsch:
    """PDSCH channel object (TX + planning).

    Same process() protocol as the reference Pdsch (nr_pdsch.py:72-128).
    """

    def __init__(self, pdsch_config: dict, carrier_config: dict):
        self.cfg = dict(pdsch_config)
        self.carrier = carrier_config
        self.prb_size = carrier_prb_size(carrier_config["scs"],
                                         carrier_config["BW"])
        tbsize, qm, rate = tbs_mod.gen_tbsize(self.cfg)
        self.tbsize, self.qm, self.rate1024 = tbsize, qm, rate
        self.tbs_lbrm = tbs_mod.gen_tbs_lbrm(
            self.cfg, self.prb_size, carrier_config["maxMIMO_layers"])
        self.rvidx = -1
        self.trblk = None
        pm = np.asarray(self.cfg.get("precoding_matrix", []), dtype=np.complex64)
        if pm.size == 0:
            pm = np.eye(carrier_config["num_of_ant"],
                        self.cfg["num_of_layers"], dtype=np.complex64)
        self.precoding = pm[:carrier_config["num_of_ant"],
                            :self.cfg["num_of_layers"]]

    # -- reference-compatible helpers --------------------------------------
    def getnextrv(self) -> int:
        rvlist = self.cfg["rv"]
        self.rvidx = (self.rvidx + 1) % len(rvlist)
        return rvlist[self.rvidx]

    def get_trblk(self, tbsize: int) -> np.ndarray:
        src = list(self.cfg.get("data_source", []))
        if not src:
            return np.random.randint(2, size=tbsize).astype(np.int8)
        reps = tbsize // len(src) + 1
        return np.asarray((src * reps)[:tbsize], np.int8)

    # -- grid processing ----------------------------------------------------
    def process(self, fd_slot: np.ndarray, usage: np.ndarray, slot: int):
        if (slot % self.cfg["period_in_slot"]) not in self.cfg["allocated_slots"]:
            return fd_slot, usage
        rv = self.getnextrv()
        if self.rvidx == 0 or self.trblk is None:
            self.trblk = self.get_trblk(self.tbsize)

        n_layers = self.cfg["num_of_layers"]
        n_ant = self.carrier["num_of_ant"]

        fd_slot, usage = self._dmrs_process(fd_slot, usage, slot)
        usage, n_data_re = self._data_mapping_prepare(usage)
        G = self.qm * n_layers * n_data_re

        g_seq = dlsch_encode(
            jnp.asarray(self.trblk), self.tbsize, self.qm, self.rate1024,
            n_layers, rv, self.tbs_lbrm, G)
        cinit = self.cfg["rnti"] * (2 ** 15) + self.cfg["nID"]
        scr = jnp.asarray(gen_prbs_np(cinit, G))
        precoded = to_host(pdsch_symbol_encode(
            g_seq, scr, to_device(self.precoding), self.qm, n_layers,
            n_ant, cinit, G))
        fd_slot = self._data_mapping_commit(precoded, fd_slot, usage)
        return fd_slot, usage

    # -- slot-batched device TX (VERDICT r4 item 1) -------------------------
    def tx_batch_supported(self) -> bool:
        """True when this config's RE layout is slot-invariant and
        structured (type-1 single-symbol DMRS, all-data allocation) so
        tx_grid_batch can compose grids with static slices only."""
        cfg, dmrs = self.cfg, self.cfg["DMRS"]
        if dmrs["DMRSConfigType"] != 1 or dmrs["NrOfDMRSSymbols"] != 1:
            return False
        start = cfg["StartSymbolIndex"]
        ld = start + cfg["NrOfSymbols"]
        syms = get_dmrs_symlist(ld, dmrs["DMRSAddPos"])
        if any(s < start or s >= ld for s in syms):
            return False
        combs = {((p - 1000) // 2) % 2
                 for p in cfg["PortIndexList"][:cfg["num_of_layers"]]}
        if dmrs["NumCDMGroupsWithoutData"] == 1 and len(combs) != 1:
            return False   # data comb would be ambiguous
        return True

    def _tx_layout(self):
        cfg, dmrs = self.cfg, self.cfg["DMRS"]
        start = cfg["StartSymbolIndex"]
        n_sym = cfg["NrOfSymbols"]
        dmrs_syms = tuple(get_dmrs_symlist(start + n_sym,
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
        if precoding is None:
            precoding = self.precoding
        cfg, dmrs = self.cfg, self.cfg["DMRS"]
        rb_start = cfg["ResAlloType1"]["RBStart"]
        rb_size = cfg["ResAlloType1"]["RBSize"]
        symlist = get_dmrs_symlist(
            cfg["StartSymbolIndex"] + cfg["NrOfSymbols"],
            dmrs["DMRSAddPos"])
        n_layers = cfg["num_of_layers"]
        ports = cfg["PortIndexList"]
        scaling = (1.0 if dmrs["NumCDMGroupsWithoutData"] == 1
                   else 10 ** (-3 / 20))
        out = np.zeros((len(symlist), precoding.shape[0],
                        rb_size * 12), np.complex64)
        for k, sym in enumerate(symlist):
            seq = pdsch_dmrs_seq(dmrs, rb_start, rb_size, slot, sym)
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
        """Slot-batched device TX: one traced encode + grid compose for
        every allocated slot in slot_list -> (S, ant, 14, n_sc) device
        complex64 grids (gated slots all-zero).

        Replaces the reference's per-slot process() loop
        (py5gphy/nr_waveform/nr_dl_waveform.py:60-102 +
        nr_pdsch/nr_pdsch_process.py:8-44) with DLSCH encode batched
        over slots x CBs and a static-slice grid composition. rv
        cycling / trblk regeneration semantics match process() exactly
        (rvidx advances per allocated slot; fresh trblk at rvidx 0).

        roll_ant=k emits the grid with the antenna axis pre-rolled by
        -k — the reference's tx_low_phy ifftshift antenna roll folded
        into the precoder/DMRS rows at plan time for free, so the fused
        DUC path (ops/filters.tx_lowphy_duc, roll-free) can consume the
        grid directly.
        """
        cfg = self.cfg
        n_layers = cfg["num_of_layers"]
        n_ant = self.carrier["num_of_ant"]
        prec = (np.roll(self.precoding, -roll_ant, axis=0) if roll_ant
                else self.precoding)
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

        G = self.qm * n_layers * n_data_re
        trb = jnp.asarray(np.stack(trblks))              # (Sa, A)
        cache = getattr(self, "_tx_dev_cache", None)
        if cache is None:
            cache = self._tx_dev_cache = {}
        uniq = sorted(set(rvs))
        if len(uniq) == 1:
            g_seq = dlsch_encode(trb, self.tbsize, self.qm, self.rate1024,
                                 n_layers, uniq[0], self.tbs_lbrm, G)
        else:
            # HARQ-style rv cycling: encode per rv group, reassemble in
            # slot order (leading-axis set of contiguous rows)
            g_seq = jnp.zeros((len(rvs), G), jnp.int8)
            for rv in uniq:
                idx = [k for k, v in enumerate(rvs) if v == rv]
                gk = dlsch_encode(trb[np.asarray(idx)], self.tbsize,
                                  self.qm, self.rate1024, n_layers, rv,
                                  self.tbs_lbrm, G)
                g_seq = g_seq.at[np.asarray(idx)].set(gk.astype(jnp.int8))
        cinit = cfg["rnti"] * (2 ** 15) + cfg["nID"]
        # device-input caches: the scramble sequence depends only on
        # (cinit, G) and the DMRS stack only on the slot numbers — in a
        # sweep both repeat every SNR point, and each avoided to_device
        # is a tunnel transfer on the axon backend
        scr_key = ("scr", cinit, G)
        if scr_key not in cache:
            cache[scr_key] = jnp.asarray(gen_prbs_np(cinit, G))
        precoded = pdsch_symbol_encode(
            g_seq, cache[scr_key], to_device(prec), self.qm,
            n_layers, n_ant, cinit, G)                   # (Sa, ant, n_re)
        dmrs_key = ("dmrs", roll_ant) + tuple(
            int(slot_list[i]) for i in active_idx)
        if dmrs_key not in cache:
            cache[dmrs_key] = to_device(np.stack(
                [self._dmrs_values(int(slot_list[i]), precoding=prec)
                 for i in active_idx]))
        dmrs_dev = cache[dmrs_key]                       # (Sa, nd, ant, rb12)
        grid = _pdsch_compose_grid(precoded, dmrs_dev, layout)
        if len(active_idx) != s_dim:
            grid = jnp.zeros((s_dim, n_ant, 14, n_sc), jnp.complex64) \
                .at[np.asarray(active_idx)].set(grid)
        return grid

    def _dmrs_process(self, fd_slot, usage, slot):
        cfg, dmrs = self.cfg, self.cfg["DMRS"]
        assert dmrs["DMRSConfigType"] == 1 and dmrs["NrOfDMRSSymbols"] == 1
        rb_start = cfg["ResAlloType1"]["RBStart"]
        rb_size = cfg["ResAlloType1"]["RBSize"]
        ld = cfg["StartSymbolIndex"] + cfg["NrOfSymbols"]
        symlist = get_dmrs_symlist(ld, dmrs["DMRSAddPos"])
        n_layers = cfg["num_of_layers"]
        ports = cfg["PortIndexList"]
        n_sc = 12 * self.prb_size
        scaling = 1.0 if dmrs["NumCDMGroupsWithoutData"] == 1 else 10 ** (-3 / 20)

        # per-PRB usage template
        re_map_prb = np.zeros((n_layers, 12), np.int8)
        if dmrs["NumCDMGroupsWithoutData"] == 2:
            re_map_prb[:, :] = RE_USAGE["PDSCH-DMRS-RSV"]
        for m in range(n_layers):
            d0 = ports[m] - 1000
            re_map_prb[d0, (d0 // 2) % 2::2] = RE_USAGE["PDSCH-DMRS"]

        for sym in symlist:
            seq = pdsch_dmrs_seq(dmrs, rb_start, rb_size, slot, sym)
            data = np.zeros((n_layers, rb_size * 12), np.complex64)
            for m in range(n_layers):
                d0 = ports[m] - 1000
                delta = (d0 // 2) % 2
                wf1 = 1 - (d0 % 2) * 2
                data[m, 0 + delta::4] = scaling * seq[0::2]
                data[m, 2 + delta::4] = scaling * wf1 * seq[1::2]
                start = sym * n_sc + rb_start * 12
                if np.any(usage[:, start + delta: start + rb_size * 12: 2]
                          == RE_USAGE["CSI-RS"]):
                    raise AssertionError("DMRS collides with CSI-RS")
            precoded = self.precoding @ data
            for prb in range(rb_start, rb_start + rb_size):
                start = sym * n_sc + prb * 12
                if np.any(usage[0, start: start + 12] == RE_USAGE["SSB"]):
                    continue  # skip SSB PRBs
                fd_slot[:, start: start + 12] = \
                    precoded[:, (prb - rb_start) * 12:(prb - rb_start) * 12 + 12]
                usage[:self.cfg["num_of_layers"], start: start + 12] = re_map_prb
        return fd_slot, usage

    def _data_mapping_prepare(self, usage):
        cfg = self.cfg
        rb_start = cfg["ResAlloType1"]["RBStart"]
        rb_size = cfg["ResAlloType1"]["RBSize"]
        n_sc = 12 * self.prb_size
        count = 0
        for sym in range(cfg["StartSymbolIndex"],
                         cfg["StartSymbolIndex"] + cfg["NrOfSymbols"]):
            start = sym * n_sc + rb_start * 12
            seg = usage[:, start: start + rb_size * 12]
            if np.any(np.isin(seg[0], [RE_USAGE["PDCCH-DATA"],
                                       RE_USAGE["PDCCH-DMRS"]])):
                raise AssertionError("PDSCH overlaps PDCCH resources")
            empty = seg[0] == RE_USAGE["empty"]
            count += int(empty.sum())
            seg[:, empty] = RE_USAGE["PDSCH-DATA"]
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
            mask = usage[0, start: start + rb_size * 12] == RE_USAGE["PDSCH-DATA"]
            n = int(mask.sum())
            if n:
                seg = fd_slot[:, start: start + rb_size * 12]
                seg[:, mask] = precoded[:, off: off + n]
                off += n
        return fd_slot


def _attach_rx_methods():
    """Attach the receive path (phy/pdsch_rx.py) to Pdsch."""
    from python_5gtoolbox_tpu.phy import pdsch_rx

    Pdsch.H_LS_est = pdsch_rx.PdschRxMixin.H_LS_est
    Pdsch.RX_process = pdsch_rx.PdschRxMixin.RX_process
    Pdsch.rx_process_batch = pdsch_rx.PdschRxMixin.rx_process_batch
    Pdsch.rx_batch_prepare = pdsch_rx.PdschRxMixin.rx_batch_prepare


def get_dmrs_symlist(ld: int, add_pos: int) -> list[int]:
    """DM-RS symbol positions, 38.211 Table 7.4.1.1.2-3 (type A, l0=2)."""
    if ld <= 7:
        return [2]
    if ld <= 9:
        return [2] if add_pos == 0 else [2, 7]
    if ld <= 11:
        return {0: [2], 1: [2, 9]}.get(add_pos, [2, 6, 9])
    if ld == 12:
        return {0: [2], 1: [2, 9], 2: [2, 6, 9]}.get(add_pos, [2, 5, 8, 11])
    return {0: [2], 1: [2, 11], 2: [2, 7, 11], 3: [2, 5, 8, 11]}[add_pos]


_attach_rx_methods()
