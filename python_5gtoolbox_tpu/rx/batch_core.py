"""Shared slot-batched RX core for PDSCH (DL-SCH) and PUSCH (UL-SCH).

One traced program per static config: LS estimation on DMRS REs ->
jitted DFT/DCT CE (rx/ce_jax.py) -> TO/FO data compensation ->
equalize+demod -> descramble -> Er-grouped LDPC rate recovery ->
LDPC decode -> TB CRC. The DL/UL callers (phy/pdsch_rx.py
_batch_rx_fn, phy/pusch_rx.py _batch_ul_rx_fn) differ only in their
DMRS symbol schedule, circular-buffer size (LBRM Ncb vs Ncb=N) and
sequence/scrambling inputs — everything else lives here once.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import crc as crc_ops
from python_5gtoolbox_tpu.ops import ldpc as ldpc_ops
from python_5gtoolbox_tpu.rx import ce_jax
from python_5gtoolbox_tpu.rx.equalize import equalize_and_demod_traced

_MODTYPE = {1: "pi/2-bpsk", 2: "qpsk", 4: "16qam", 6: "64qam",
            8: "256qam", 10: "1024qam"}


def data_re_layout(ports, nl: int, ncdm: int, rb_size: int, ssi: int,
                   nsym: int, symlist, qm: int):
    """(dmrs_data_idx, G) — per-DMRS-symbol data-RE indices and the
    total rate-match capacity (reference usage-map rules)."""
    if ncdm == 2:
        dmrs_map = np.ones(12, np.int8)
    else:
        dmrs_map = np.zeros(12, np.int8)
        if 1000 in ports[:nl] or 1001 in ports[:nl]:
            dmrs_map[0::2] = 1
        if 1002 in ports[:nl] or 1003 in ports[:nl]:
            dmrs_map[1::2] = 1
    dmrs_data_idx = np.nonzero(np.tile(dmrs_map, rb_size) == 0)[0]
    n_data_re = sum(
        (len(dmrs_data_idx) if (ssi + k) in symlist else rb_size * 12)
        for k in range(nsym))
    return dmrs_data_idx, qm * nl * n_data_re


def sch_decode_plan(tbsize: int, rate1024: float, G: int, qm: int,
                    nl: int, tbs_lbrm: int | None):
    """(tb_poly, B, bgn, info, ncb, er_list) — 38.212 7.2/6.2 sizing.
    tbs_lbrm None => UL (Ncb = N, no LBRM)."""
    A = tbsize
    tb_poly = "24A" if A > 3824 else "16"
    B = A + (24 if A > 3824 else 16)
    bgn = 1
    if (A <= 292 or (A <= 3824 and rate1024 <= 0.67 * 1024)
            or rate1024 <= 0.25 * 1024):
        bgn = 2
    info = ldpc_ops.get_cbs_info(B, bgn)
    ncb = info.N if tbs_lbrm is None else \
        min(info.N, math.floor(tbs_lbrm / (info.C * 2 / 3)))
    er_list = ldpc_ops.get_er_ldpc(G, info.C, qm, nl)
    return tb_poly, B, bgn, info, ncb, er_list


def build_batch_rx_core(*, rb_start, rb_size, ssi, nsym, ports, nl,
                        ncdm, scs, n_sc, nr, qm, tbsize, rate1024,
                        tbs_lbrm, rv, algo, ldpc_cfg, ce_config,
                        symlist, scaling):
    """-> (jitted core(rx_planes, dmrs_planes, scr_sign) ->
    (err (S,) int8, tbblk (S, A) bits), G)."""
    modtype = _MODTYPE[qm]
    dmrs_data_idx, G = data_re_layout(ports, nl, ncdm, rb_size, ssi,
                                      nsym, symlist, qm)
    tb_poly, B, bgn, info, ncb, er_list = sch_decode_plan(
        tbsize, rate1024, G, qm, nl, tbs_lbrm)
    rs_info = dict(RSSymMap=list(symlist), RE_distance=4,
                   NumCDMGroupsWithoutData=ncdm, scs=scs)
    A = tbsize

    def core(rx_planes, dmrs_planes, scr_sign):
        fd = jax.lax.complex(rx_planes[0], rx_planes[1])  # (S, Nr, 14*nsc)
        dm = jax.lax.complex(dmrs_planes[0], dmrs_planes[1])
        s = fd.shape[0]
        # ---- LS estimation on DMRS REs (strided static slices)
        h_cols = []
        for idx, sym in enumerate(symlist):
            start = sym * n_sc + rb_start * 12
            cseq = jnp.conj(dm[:, idx])                   # (S, rb*6)
            per_tx = []
            for tx in range(nl):
                p0 = ports[tx] - 1000
                delta = (p0 // 2) % 2
                d0 = fd[:, :, start + delta: start + rb_size * 12: 4] \
                    * cseq[:, None, 0::2]
                d1 = fd[:, :, start + delta + 2:
                        start + rb_size * 12: 4] * cseq[:, None, 1::2]
                sgn = 1.0 if p0 in (0, 2) else -1.0
                per_tx.append((d0 + sgn * d1) / (2 * scaling))
            h_cols.append(jnp.stack(per_tx, axis=-1))     # (S, Nr, RE, NL)
        h_ls = jnp.swapaxes(jnp.stack(h_cols, axis=1), 2, 3)

        # ---- channel estimation (jitted batched CE)
        est = ce_jax.channel_est_batch(h_ls, rs_info, ce_config)
        H, cov = est["H"], est["cov"]

        # ---- data resource copy + TO/FO compensation
        res_syms = []
        for k in range(nsym):
            start = (ssi + k) * n_sc + rb_start * 12
            res_syms.append(jnp.swapaxes(
                fd[:, :, start: start + rb_size * 12], 1, 2))
        res = jnp.stack(res_syms, axis=1)                 # (S, nsym, RE, Nr)
        res = ce_jax.comp_data_batch(
            res, ssi, scs, est["to_avg"],
            est["fo"] if est["fo_applied"] else None, ce_config)

        # ---- per-symbol data-RE selection (reference G order)
        ys, hs, cvs = [], [], []
        for k in range(nsym):
            sym = ssi + k
            if sym in symlist:
                if ncdm == 2:
                    continue
                didx = dmrs_data_idx
            else:
                didx = np.arange(rb_size * 12)
            ys.append(res[:, k, didx, :])
            hs.append(H[:, sym, didx, :, :nl])
            cvs.append(cov[:, sym, didx // 12, :, :])
        y = jnp.concatenate(ys, axis=1)                   # (S, NRE, Nr)
        h = jnp.concatenate(hs, axis=1)
        cv = jnp.concatenate(cvs, axis=1)
        n_re = y.shape[1]

        llr = equalize_and_demod_traced(
            y.reshape(s * n_re, nr), h.reshape(s * n_re, nr, nl),
            cv.reshape(s * n_re, nr, nr), modtype, algo)
        llr = llr.reshape(s, G) * scr_sign[None, :]

        # ---- de-rate-match (Er groups) -> (S, C, N)
        grps = []
        g_off = 0
        c0 = 0
        while c0 < info.C:
            E = er_list[c0]
            c1 = c0
            while c1 < info.C and er_list[c1] == E:
                c1 += 1
            grp = llr[:, g_off: g_off + (c1 - c0) * E] \
                .reshape(s * (c1 - c0), E)
            mx = 10.0 * jnp.max(jnp.abs(grp), axis=-1, keepdims=True)
            rec = ldpc_ops.ldpc_raterecover(grp, info, rv, qm, Ncb=ncb,
                                            max_llr=mx)
            grps.append(rec.reshape(s, c1 - c0, info.N))
            g_off += (c1 - c0) * E
            c0 = c1
        llr_dns = jnp.concatenate(grps, axis=1)           # (S, C, N)

        bits, _, _ = ldpc_ops.ldpc_decode(
            llr_dns.reshape(s * info.C, info.N), info.Zc, bgn,
            ldpc_cfg["L"], algo=ldpc_cfg["algo"], alpha=ldpc_cfg["alpha"],
            beta=ldpc_cfg["beta"])
        bits = bits.reshape(s, info.C, -1)
        k_apo = info.cbz + info.L
        cb_bits = bits[:, :, : info.cbz] if info.C > 1 \
            else bits[:, :, : k_apo]
        tbblkandcrc = cb_bits.reshape(s, -1)[:, :B]
        err = crc_ops.crc_check(tbblkandcrc, tb_poly)
        return err, tbblkandcrc[:, :A]

    return jax.jit(core), G
