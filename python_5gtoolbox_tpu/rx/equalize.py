"""Per-RE channel equalization: ZF / MMSE (+IRC) / ML (+IRC).

Behavior parity targets: py5gphy/channel_equalization/{ZF,MMSE,ML,ML2}.py and
nr_channel_eq.py:12-70 (dispatcher + IRC whitening via eigendecomposition
of the inverse covariance).

TPU design: the reference loops REs and solves one tiny system at a time;
here every algorithm is batched over REs — (N, Nr, NL) channel tensors,
batched 2x2/4x4 inverses and einsum contractions, and ML as one
(N, ncand) distance matmul with top-1 reduction. The reference's
conditional rank-deficiency regularization becomes an unconditional tiny
diagonal load (identical in the generic case, numerically safer).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.utils.host import to_device
from python_5gtoolbox_tpu.utils.cplx import make_complex
import numpy as np

from python_5gtoolbox_tpu.ops.modulation import constellation
from python_5gtoolbox_tpu.rx.demod import demodulate

# The reference adds 0.0012*max|m| ONLY when the matrix is rank-deficient
# (a data-dependent branch that cannot be jitted). We always add a much
# smaller load: invisible for well-conditioned inputs (parity within
# ~1e-4), still stabilizing the exactly-singular corner.
_EPS = 1e-6


def _reg(m):
    """Tiny diagonal load ~ reference's singularity fix (always applied)."""
    n = m.shape[-1]
    scale = jnp.max(jnp.abs(m), axis=(-2, -1), keepdims=True)
    return m + (_EPS * scale + 1e-30) * jnp.eye(n, dtype=m.dtype)


def _inv22(m):
    """Closed-form inverse of (..., 2, 2) (elementwise VPU math)."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) / det[..., None, None]


def _mm(a, b):
    # tiny-matrix products inside the closed-form inverse: HIGHEST so
    # TPU default bf16 rounding doesn't amplify through the Schur step
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def inv_small(m):
    """Batched inverse of (..., n, n) for n <= 4 without linalg.inv.

    XLA lowers batched LU (jnp.linalg.inv) to a serialized
    dynamic-slice loop on TPU — for the equalizer's millions of tiny
    per-RE matrices it dominated the whole batched RX dispatch
    (measured 125 ms of a 20-slot MMSE-IRC sweep step). n=2 is the
    adjugate; n=4 is blockwise 2x2 Schur (inputs are regularized by
    _reg so the pivots are bounded); n=3 pads to the 4x4 path.
    """
    n = m.shape[-1]
    if n == 1:
        return 1.0 / m
    if n == 2:
        return _inv22(m)
    if n == 3:
        # pad to 4x4 with an identity corner, invert, slice back
        pad = jnp.zeros(m.shape[:-2] + (4, 4), m.dtype)
        pad = pad.at[..., :3, :3].set(m)
        pad = pad.at[..., 3, 3].set(1.0)
        return inv_small(pad)[..., :3, :3]
    if n == 4:
        a = m[..., :2, :2]
        b = m[..., :2, 2:]
        c = m[..., 2:, :2]
        d = m[..., 2:, 2:]
        ai = _inv22(a)
        s = d - _mm(_mm(c, ai), b)
        si = _inv22(s)
        ai_b = _mm(ai, b)
        c_ai = _mm(c, ai)
        tl = ai + _mm(_mm(ai_b, si), c_ai)
        tr = -_mm(ai_b, si)
        bl = -_mm(si, c_ai)
        top = jnp.concatenate([tl, tr], axis=-1)
        bot = jnp.concatenate([bl, si], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    return jnp.linalg.inv(m)


def zf(y, h, cov, irc: bool):
    """y (N, Nr), h (N, Nr, NL), cov (N, Nr, Nr) -> (s_est, noise_var)."""
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))
    w1 = _reg(hh @ h)
    w2 = inv_small(w1)
    w = w2 @ hh
    s = jnp.einsum("nlr,nr->nl", w, y)
    if irc:
        n1 = w @ cov @ jnp.conj(jnp.swapaxes(w, -1, -2))
        nv = jnp.real(jnp.diagonal(n1, axis1=-2, axis2=-1))
    else:
        sigma2 = jnp.mean(jnp.real(jnp.diagonal(cov, axis1=-2, axis2=-1)),
                          axis=-1, keepdims=True)
        nv = sigma2 * jnp.real(jnp.diagonal(w2, axis1=-2, axis2=-1))
    return s, nv


def mmse(y, h, cov, irc: bool):
    """MMSE(-IRC) with the reference's bias compensation."""
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))
    nl = h.shape[-1]
    eye = jnp.eye(nl, dtype=h.dtype)
    if irc:
        inv_cov = inv_small(_reg(cov))
        w1 = _reg(hh @ inv_cov @ h + eye)
        inv_w1 = inv_small(w1)
        w = inv_w1 @ hh @ inv_cov
    else:
        sigma2 = jnp.mean(jnp.real(jnp.diagonal(cov, axis1=-2, axis2=-1)),
                          axis=-1)[..., None, None]
        w1 = _reg(hh @ h / sigma2.astype(h.dtype) + eye)
        inv_w1 = inv_small(w1)
        w = inv_w1 @ hh / sigma2.astype(h.dtype)
    s_hat = jnp.einsum("nlr,nr->nl", w, y)
    comp = 1.0 - jnp.diagonal(inv_w1, axis1=-2, axis2=-1)
    s = s_hat / comp
    nv = jnp.real(1.0 / comp - 1.0)
    return s, nv


def _whiten(y, h, cov):
    """IRC whitening: U with U^H U = inv(cov) (eigh-based, as reference)."""
    inv_cov = jnp.linalg.inv(_reg(cov))
    evals, evecs = jnp.linalg.eigh(inv_cov)
    u = jnp.conj(jnp.swapaxes(
        evecs * jnp.sqrt(jnp.maximum(evals, 0.0))[..., None, :], -1, -2))
    return jnp.einsum("nij,nj->ni", u, y), u @ h


def ml(y, h, cov, modtype: str, irc: bool = False, soft: bool = True):
    """Exact ML over the full layer-product constellation, batched.

    Returns (s_est (N, NL), noise_var (N, NL), hardbits (N, NL*Qm),
    llr (N, NL*Qm)). LLR via the reference's opposite-symbol max-log
    estimate (ML.py:101-141).
    """
    if irc:
        y, h = _whiten(y, h, cov)
        cov = jnp.broadcast_to(jnp.eye(h.shape[-2], dtype=h.dtype),
                               cov.shape)
    n, nr, nl = h.shape
    syms, bits = constellation(modtype)
    q = len(syms)
    qm = bits.shape[1]
    # candidate tensor (q^nl, nl)
    grids = np.meshgrid(*([np.arange(q)] * nl), indexing="ij")
    cand_idx = np.stack([g.reshape(-1) for g in grids], axis=-1)
    cand = jnp.asarray(np.asarray(syms)[cand_idx])          # (C, nl)
    cand_bits = np.concatenate([np.asarray(bits)[cand_idx[:, l]]
                                for l in range(nl)], axis=1)  # (C, nl*qm)
    hs = jnp.einsum("nrl,cl->ncr", h, cand)                 # (N, C, Nr)
    dist = jnp.sum(jnp.abs(y[:, None, :] - hs) ** 2, axis=-1)  # (N, C)
    sigma2 = jnp.mean(jnp.real(jnp.diagonal(cov, axis1=-2, axis2=-1)),
                      axis=-1)
    best = jnp.argmin(dist, axis=-1)
    s_est = cand[best]                                      # (N, nl)
    hard = jnp.asarray(cand_bits, jnp.int8)[best]           # (N, nl*qm)
    min_dist = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
    nv = jnp.broadcast_to((min_dist / sigma2)[:, None], (n, nl))

    if not soft:
        return s_est, nv, hard, (1 - 2 * hard).astype(jnp.float32)

    # soft LLR: flip each bit to its nearest opposite symbol (per layer)
    from python_5gtoolbox_tpu.ops.modulation import modulate
    llrs = []
    opp_idx = _opposite_symbol_table(modtype)               # (q, qm)
    for l in range(nl):
        lay_idx = jnp.asarray(cand_idx[:, l])[best]         # (N,)
        for m in range(qm):
            opp = jnp.asarray(opp_idx[:, m])[lay_idx]       # (N,)
            s_new = s_est.at[:, l].set(jnp.asarray(np.asarray(syms))[opp])
            resid = y - jnp.einsum("nrl,nl->nr", h, s_new)
            d = jnp.sum(jnp.abs(resid) ** 2, axis=-1) / sigma2
            bit = hard[:, l * qm + m]
            llr = jnp.where(bit == 0, -nv[:, l] + d, nv[:, l] - d)
            llrs.append(llr)
    llr = jnp.stack(llrs, axis=-1)
    return s_est, nv, hard, llr


def ml2(y, h, cov, modtype: str, irc: bool = False, soft: bool = True):
    """Exact max-log ML (reference ML2.py:47-163), batched over REs.

    Same minimum search as ml(), but the per-bit soft LLR is exact:
    LLR = min over ALL candidate vectors with that bit = 1 minus the
    min with that bit = 0 (the reference's ML uses the cheaper
    single-opposite-symbol approximation instead). The reference
    initializes both per-bit minima to max|Lv|; Lv >= 0 and every bit
    value occurs in the full product set, so that cap never binds and
    a plain masked min is identical.
    """
    if irc:
        y, h = _whiten(y, h, cov)
        cov = jnp.broadcast_to(jnp.eye(h.shape[-2], dtype=h.dtype),
                               cov.shape)
    n, nr, nl = h.shape
    syms, bits = constellation(modtype)
    q = len(syms)
    qm = np.asarray(bits).shape[1]
    grids = np.meshgrid(*([np.arange(q)] * nl), indexing="ij")
    cand_idx = np.stack([g.reshape(-1) for g in grids], axis=-1)
    cand = jnp.asarray(np.asarray(syms)[cand_idx])          # (C, nl)
    cand_bits = np.concatenate([np.asarray(bits)[cand_idx[:, l]]
                                for l in range(nl)], axis=1)  # (C, nl*qm)
    sigma2 = jnp.mean(jnp.real(jnp.diagonal(cov, axis1=-2, axis2=-1)),
                      axis=-1)

    # the (N, C, Nr) candidate tensor is the memory hot spot (256QAM
    # 2-layer: C=65536); chunk the RE axis to a fixed ~0.5 GB budget so
    # large-q configs degrade to more passes instead of OOM
    n_chunk = max(1, min(n, int(2 ** 29 // max(len(cand_idx) * nr * 8, 1))))

    def _body(y_c, h_c, s2_c):
        hs = jnp.einsum("nrl,cl->ncr", h_c, cand)           # (Nc, C, Nr)
        dist = jnp.sum(jnp.abs(y_c[:, None, :] - hs) ** 2, axis=-1)
        lv = dist / s2_c[:, None]
        best = jnp.argmin(lv, axis=-1)
        s_est = cand[best]                                  # (Nc, nl)
        hard = jnp.asarray(cand_bits, jnp.int8)[best]       # (Nc, nl*qm)
        min_lv = jnp.take_along_axis(lv, best[:, None], axis=1)[:, 0]
        nv = jnp.broadcast_to(min_lv[:, None], (len(best), nl))
        if not soft:
            return s_est, nv, hard, (1 - 2 * hard).astype(jnp.float32)
        inf = jnp.asarray(np.inf, lv.dtype)
        llrs = []
        for i in range(nl * qm):
            is1 = jnp.asarray(cand_bits[:, i] == 1)[None, :]
            v1 = jnp.min(jnp.where(is1, lv, inf), axis=1)
            v0 = jnp.min(jnp.where(is1, inf, lv), axis=1)
            llrs.append(v1 - v0)
        return s_est, nv, hard, jnp.stack(llrs, axis=-1)

    if n_chunk >= n:
        return _body(y, h, sigma2)
    # one traced body via lax.map (a python chunk loop would unroll
    # hundreds of copies of the candidate einsum into the batched-RX
    # jit's graph); pad the RE axis to a whole number of chunks
    n_pad = -(-n // n_chunk) * n_chunk
    yp = jnp.pad(y, ((0, n_pad - n), (0, 0)))
    hp = jnp.pad(h, ((0, n_pad - n), (0, 0), (0, 0)))
    sp = jnp.pad(sigma2, (0, n_pad - n), constant_values=1.0)
    outs = jax.lax.map(
        lambda t: _body(*t),
        (yp.reshape(-1, n_chunk, nr), hp.reshape(-1, n_chunk, nr, nl),
         sp.reshape(-1, n_chunk)))
    return tuple(o.reshape((n_pad,) + o.shape[2:])[:n] for o in outs)


def _ml_finish(y, h, cov, modtype, s_est, best_lay_idx, soft):
    """Shared tail: noise_var + opposite-symbol max-log LLRs given the
    per-layer winning constellation indices (N, NL)."""
    n, nr, nl = h.shape
    syms, bits = constellation(modtype)
    qm = np.asarray(bits).shape[1]
    sigma2 = jnp.mean(jnp.real(jnp.diagonal(cov, axis1=-2, axis2=-1)),
                      axis=-1)
    resid0 = y - jnp.einsum("nrl,nl->nr", h, s_est)
    min_dist = jnp.sum(jnp.abs(resid0) ** 2, axis=-1)
    nv = jnp.broadcast_to((min_dist / sigma2)[:, None], (n, nl))
    hard = jnp.concatenate(
        [jnp.asarray(np.asarray(bits), jnp.int8)[best_lay_idx[:, l]]
         for l in range(nl)], axis=-1)
    if not soft:
        return s_est, nv, hard, (1 - 2 * hard).astype(jnp.float32)
    opp_idx = _opposite_symbol_table(modtype)
    llrs = []
    for l in range(nl):
        for m in range(qm):
            opp = jnp.asarray(opp_idx[:, m])[best_lay_idx[:, l]]
            s_new = s_est.at[:, l].set(jnp.asarray(np.asarray(syms))[opp])
            resid = y - jnp.einsum("nrl,nl->nr", h, s_new)
            d = jnp.sum(jnp.abs(resid) ** 2, axis=-1) / sigma2
            bit = hard[:, l * qm + m]
            llr = jnp.where(bit == 0, -nv[:, l] + d, nv[:, l] - d)
            llrs.append(llr)
    return s_est, nv, hard, jnp.stack(llrs, axis=-1)


def mmse_ml(y, h, cov, modtype: str, irc: bool = False,
            max_neigh: int = 4, soft: bool = True):
    """MMSE-assisted reduced-set ML (MMSE_ML.py:12-105): MMSE picks the
    `max_neigh` nearest constellation points per layer, ML searches only
    their product set. Batched: one gather + one (N, P^NL) distance
    reduction."""
    s_mmse, _ = mmse(y, h, cov, irc=irc)
    if irc:
        y, h = _whiten(y, h, cov)
        cov = jnp.broadcast_to(jnp.eye(h.shape[-2], dtype=h.dtype),
                               cov.shape)
    n, nr, nl = h.shape
    syms, _ = constellation(modtype)
    syms_j = jnp.asarray(np.asarray(syms))
    p = min(max_neigh, len(syms))
    d_layer = jnp.abs(syms_j[None, None, :] - s_mmse[..., None])  # (N,NL,Q)
    _, sel = jax.lax.top_k(-d_layer, p)                           # (N,NL,P)
    grids = np.meshgrid(*([np.arange(p)] * nl), indexing="ij")
    combo = np.stack([g.reshape(-1) for g in grids], axis=-1)     # (C, NL)
    cand_lay_idx = jnp.stack(
        [sel[:, l, jnp.asarray(combo[:, l])] for l in range(nl)],
        axis=-1)                                                  # (N,C,NL)
    cand = syms_j[cand_lay_idx]                                   # (N,C,NL)
    hs = jnp.einsum("nrl,ncl->ncr", h, cand)
    dist = jnp.sum(jnp.abs(y[:, None, :] - hs) ** 2, axis=-1)
    best = jnp.argmin(dist, axis=-1)
    best_lay_idx = jnp.take_along_axis(
        cand_lay_idx, best[:, None, None], axis=1)[:, 0]          # (N,NL)
    s_est = syms_j[best_lay_idx]
    return _ml_finish(y, h, cov, modtype, s_est, best_lay_idx, soft)


def opt_rank2_ml(y, h, cov, modtype: str, irc: bool = False,
                 soft: bool = True):
    """Rank-2-optimized exact ML (opt_rank2_ML.py:9-137): O(Q) instead of
    O(Q^2) by solving the other layer's PAM coordinates in closed form.
    Falls back to full ML for NL != 2. Batched over REs."""
    if h.shape[-1] != 2:
        return ml(y, h, cov, modtype, irc=irc, soft=soft)
    if irc:
        y, h = _whiten(y, h, cov)
        cov = jnp.broadcast_to(jnp.eye(h.shape[-2], dtype=h.dtype),
                               cov.shape)
    syms, _ = constellation(modtype)
    syms_np = np.asarray(syms)
    pam = np.unique(syms_np.real)                     # PAM levels (sqrtQ,)
    pam_j = jnp.asarray(pam)
    syms_j = jnp.asarray(syms_np)

    yh = jnp.einsum("nr,nrl->nl", jnp.conj(y), h)     # (N, 2)
    a0i, a0q = jnp.real(yh[:, 0]), jnp.imag(yh[:, 0])
    a1i, a1q = jnp.real(yh[:, 1]), jnp.imag(yh[:, 1])
    hh = jnp.einsum("nri,nrj->nij", jnp.conj(h), h)   # (N, 2, 2)
    a2 = jnp.real(hh[:, 0, 0])
    a3 = jnp.real(hh[:, 1, 1])
    a4i, a4q = jnp.real(hh[:, 0, 1]), jnp.imag(hh[:, 0, 1])

    def quant(target, a):
        """Nearest PAM level if a>0, farthest otherwise (reference rule)."""
        d = jnp.abs(pam_j[None, None, :] - target[..., None])
        near = jnp.argmin(d, axis=-1)
        far = jnp.argmax(d, axis=-1)
        return pam_j[jnp.where((a > 0)[:, None], near, far)]

    x0 = jnp.real(syms_j)[None, :]                    # (1, Q)
    y0 = jnp.imag(syms_j)[None, :]

    def branch(b0i, b0q, b1i, b1q, c_self, c_other):
        """Search over this layer's constellation, solve the other."""
        l1 = (c_self[:, None] * (x0 ** 2 + y0 ** 2)
              - 2 * b0i[:, None] * x0 + 2 * b0q[:, None] * y0)
        gx = -b1i[:, None] + a4i[:, None] * x0 + a4q[:, None] * y0
        cx = quant(-gx / c_other[:, None], c_other)
        l2 = c_other[:, None] * cx * cx + 2 * gx * cx
        gy = b1q[:, None] + a4i[:, None] * y0 - a4q[:, None] * x0
        cy = quant(-gy / c_other[:, None], c_other)
        l3 = c_other[:, None] * cy * cy + 2 * gy * cy
        tot = l1 + l2 + l3
        best = jnp.argmin(tot, axis=-1)
        metric = jnp.take_along_axis(tot, best[:, None], axis=1)[:, 0]
        s_self = syms_j[best]
        s_other = (jnp.take_along_axis(cx, best[:, None], axis=1)[:, 0]
                   + make_complex(0.0, 1.0) * jnp.take_along_axis(cy, best[:, None],
                                              axis=1)[:, 0])
        return metric, s_self, s_other

    # L2: enumerate layer 0, solve layer 1; L3: the converse. The
    # reference's gy for the converse branch flips the a4q sign
    # (conjugate cross-term), matched here by passing -a4q via b-swap.
    m2, s0_a, s1_a = branch(a0i, a0q, a1i, a1q, a2, a3)
    a4q_n = -a4q

    def branch_rev():
        l1 = (a3[:, None] * (x0 ** 2 + y0 ** 2)
              - 2 * a1i[:, None] * x0 + 2 * a1q[:, None] * y0)
        gx = -a0i[:, None] + a4i[:, None] * x0 + a4q_n[:, None] * y0
        cx = quant(-gx / a2[:, None], a2)
        l2 = a2[:, None] * cx * cx + 2 * gx * cx
        gy = a0q[:, None] + a4i[:, None] * y0 - a4q_n[:, None] * x0
        cy = quant(-gy / a2[:, None], a2)
        l3 = a2[:, None] * cy * cy + 2 * gy * cy
        tot = l1 + l2 + l3
        best = jnp.argmin(tot, axis=-1)
        metric = jnp.take_along_axis(tot, best[:, None], axis=1)[:, 0]
        s1 = syms_j[best]
        s0 = (jnp.take_along_axis(cx, best[:, None], axis=1)[:, 0]
              + make_complex(0.0, 1.0) * jnp.take_along_axis(cy, best[:, None], axis=1)[:, 0])
        return metric, s0, s1

    m3, s0_b, s1_b = branch_rev()
    use2 = (m2 <= m3)
    s_est = jnp.stack([jnp.where(use2, s0_a, s0_b),
                       jnp.where(use2, s1_a, s1_b)], axis=-1)
    # recover per-layer constellation indices for the LLR tail
    lay_idx = jnp.argmin(
        jnp.abs(syms_j[None, None, :] - s_est[..., None]), axis=-1)
    return _ml_finish(y, h, cov, modtype, s_est, lay_idx, soft)


def _opposite_symbol_table(modtype: str) -> np.ndarray:
    """(q, qm) table: for symbol s and bit m, index of the closest symbol
    with bit m flipped — matches get_oppisite_syms (nrModulation.py:76)."""
    return _opp_cached(modtype)


def _build_opp(modtype):
    syms, bits = constellation(modtype)
    syms = np.asarray(syms)
    bits = np.asarray(bits)
    q, qm = bits.shape
    out = np.zeros((q, qm), np.int32)
    for i in range(q):
        for m in range(qm):
            mask = bits[:, m] != bits[i, m]
            cand = np.where(mask)[0]
            out[i, m] = cand[np.argmin(np.abs(syms[cand] - syms[i]))]
    return out


_OPP_CACHE: dict = {}


def _opp_cached(modtype):
    if modtype not in _OPP_CACHE:
        _OPP_CACHE[modtype] = _build_opp(modtype)
    return _OPP_CACHE[modtype]


def equalize_and_demod_traced(y, h, cov, modtype: str, algo: str):
    """Traced equalize+demod dispatcher (channel_equ_and_demod without
    the host->device staging — the batched RX traces this into its
    per-sweep executable): y (N, Nr), h (N, Nr, NL), cov (N, Nr, Nr)
    -> llr (N*NL*Qm,) in the reference serialization order."""
    from python_5gtoolbox_tpu.rx.demod import demodulate

    if algo in ("ZF", "ZF-IRC", "MMSE", "MMSE-IRC"):
        fn = zf if algo.startswith("ZF") else mmse
        s, nv = fn(y, h, cov, irc=algo.endswith("IRC"))
        _, llr = demodulate(s.reshape(-1), modtype, nv.reshape(-1))
        return llr
    if algo in ("ML-soft", "ML-hard", "ML-IRC-soft", "ML-IRC-hard"):
        _, _, _, llr = ml(y, h, cov, modtype, irc="IRC" in algo,
                          soft=not algo.endswith("hard"))
        return llr.reshape(-1)
    if algo in ("ML2-soft", "ML2-IRC-soft"):
        _, _, _, llr = ml2(y, h, cov, modtype, irc="IRC" in algo)
        return llr.reshape(-1)
    if algo in ("MMSE-ML", "MMSE-ML-IRC"):
        _, _, _, llr = mmse_ml(y, h, cov, modtype, irc="IRC" in algo)
        return llr.reshape(-1)
    if algo in ("opt-rank2-ML", "opt-rank2-ML-IRC"):
        _, _, _, llr = opt_rank2_ml(y, h, cov, modtype,
                                    irc="IRC" in algo)
        return llr.reshape(-1)
    raise ValueError(f"unknown CEQ algo {algo}")


def channel_equ_and_demod(y, h, cov, modtype: str, ceq_config: dict):
    """Batched dispatcher mirroring nr_channel_eq.channel_equ_and_demod.

    y (N, Nr); h (N, Nr, NL); cov (N, Nr, Nr) or (Nr, Nr).
    Returns (s_est, noise_var, hardbits (N*NL*Qm,), llr (N*NL*Qm,)) with
    the reference's serialization order (per RE: layers x Qm).
    """
    y = to_device(y)
    h = to_device(h)
    cov = to_device(cov)
    if cov.ndim == 2:
        cov = jnp.broadcast_to(cov, (y.shape[0],) + cov.shape)
    algo = ceq_config["algo"]
    if algo in ("ZF", "ZF-IRC", "MMSE", "MMSE-IRC"):
        fn = zf if algo.startswith("ZF") else mmse
        s, nv = fn(y, h, cov, irc=algo.endswith("IRC"))
        hard, llr = demodulate(s.reshape(-1), modtype, nv.reshape(-1))
        return s, nv, hard, llr
    if algo in ("ML-soft", "ML-hard", "ML-IRC-soft", "ML-IRC-hard"):
        s, nv, hard, llr = ml(y, h, cov, modtype, irc="IRC" in algo,
                              soft=not algo.endswith("hard"))
        return s, nv, hard.reshape(-1), llr.reshape(-1)
    if algo in ("ML2-soft", "ML2-IRC-soft"):
        s, nv, hard, llr = ml2(y, h, cov, modtype, irc="IRC" in algo)
        return s, nv, hard.reshape(-1), llr.reshape(-1)
    if algo in ("MMSE-ML", "MMSE-ML-IRC"):
        s, nv, hard, llr = mmse_ml(y, h, cov, modtype, irc="IRC" in algo)
        return s, nv, hard.reshape(-1), llr.reshape(-1)
    if algo in ("opt-rank2-ML", "opt-rank2-ML-IRC"):
        s, nv, hard, llr = opt_rank2_ml(y, h, cov, modtype,
                                        irc="IRC" in algo)
        return s, nv, hard.reshape(-1), llr.reshape(-1)
    raise ValueError(f"unknown CEQ algo {algo}")
