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
                        symlist, scaling, harq=False,
                        transform_precode=False):
    """-> (jitted core(rx_planes, dmrs_planes, scr_sign[, llr_prev]) ->
    (err (S,) int8, tbblk (S, A) bits[, llr_dns (S, C, N)]), G).

    harq=True adds the retransmission-chain surface (VERDICT r4 item
    3): an optional llr_prev (S, C, N) buffer is soft-combined with
    this transmission's rate-recovered LLRs before decode (same
    where-both-nonzero averaging as the per-slot dlsch_decode,
    phy/pdsch_rx.py:137-140; reference chain
    py5gphy/nr_pdsch/nr_dlsch_decode.py:72-88), and the combined
    buffer is returned so the caller can chain rv-cycled sweeps with
    the LLR state device-resident."""
    modtype = _MODTYPE[qm]
    if transform_precode:
        # DFT-s-OFDM de-precode (reference branch
        # py5gphy/nr_pusch/nr_pusch.py:116-216 /
        # nr_pusch_process.py:39-54): whole-symbol DFT blocks require
        # single-layer, no data on DMRS symbols, and a linear equalizer
        # that yields per-RE symbol estimates
        assert nl == 1 and ncdm == 2, \
            "transform precoding needs 1 layer and NumCDM=2"
        assert algo in ("ZF", "ZF-IRC", "MMSE", "MMSE-IRC"), \
            f"transform precoding needs a linear equalizer, got {algo}"
    dmrs_data_idx, G = data_re_layout(ports, nl, ncdm, rb_size, ssi,
                                      nsym, symlist, qm)
    tb_poly, B, bgn, info, ncb, er_list = sch_decode_plan(
        tbsize, rate1024, G, qm, nl, tbs_lbrm)
    rs_info = dict(RSSymMap=list(symlist), RE_distance=4,
                   NumCDMGroupsWithoutData=ncdm, scs=scs)
    A = tbsize

    def core(rx_planes, dmrs_planes, scr_sign, llr_prev=None):
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

        if transform_precode:
            from python_5gtoolbox_tpu.rx.demod import demodulate
            from python_5gtoolbox_tpu.rx.equalize import mmse, zf

            fn_eq = zf if algo.startswith("ZF") else mmse
            s_est, nv = fn_eq(y.reshape(s * n_re, nr),
                              h.reshape(s * n_re, nr, nl),
                              cv.reshape(s * n_re, nr, nr),
                              irc=algo.endswith("IRC"))
            m_sc = rb_size * 12
            s_mat = s_est.reshape(s, n_re // m_sc, m_sc)
            yi = jnp.fft.ifft(s_mat, axis=-1) * np.sqrt(m_sc)
            _, llr = demodulate(yi.reshape(-1), modtype,
                                nv.reshape(-1))
        else:
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

        if llr_prev is not None:
            both = (llr_dns != 0) & (llr_prev != 0)
            comb = llr_dns + llr_prev
            llr_dns = jnp.where(both, comb / 2, comb).astype(jnp.float32)

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
        if harq:
            return err, tbblkandcrc[:, :A], llr_dns
        return err, tbblkandcrc[:, :A]

    return jax.jit(core), G
