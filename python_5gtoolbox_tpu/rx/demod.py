"""Max-log LLR soft demodulation for all NR constellations.

Behavior parity target: py5gphy/demodulation/* (closed-form piecewise
max-log LLRs up to 1024QAM, per docs/algorithm/LLR_demodulation).

TPU design: the reference's per-modulation piecewise tables collapse to
one vectorized Gray-PAM recursion. With A the constellation scale and
q = Qm/2 levels per I/Q axis:

    F_q(r) = 4A (k+1) (r - sign(r) k A),  k = clip(floor(|r|/2A), 0, 2^(q-1)-1)
    LLR_0  = F_q(r);  r_{j+1} = 2^(q-1-j) A - |r_j|;  LLR_{j+1} = F_{q-1-j}(r_{j+1})

which reproduces the reference tables exactly (verified against all
branches) and runs as a handful of VPU ops batched over any shape.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_QM = {"pi/2-bpsk": 1, "bpsk": 1, "qpsk": 2, "16qam": 4, "64qam": 6,
       "256qam": 8, "1024qam": 10}
_SCALE = {1: math.sqrt(2), 2: math.sqrt(2), 4: math.sqrt(10),
          6: math.sqrt(42), 8: math.sqrt(170), 10: math.sqrt(682)}


def _f(r, a, q, xp):
    k = xp.clip(xp.floor(xp.abs(r) / (2 * a)), 0, 2 ** (q - 1) - 1)
    return 4 * a * (k + 1) * (r - xp.sign(r) * k * a)


def demodulate(symbols, modtype: str, noise_var, xp=jnp):
    """(..., n) equalized symbols -> (..., n*Qm) max-log LLRs.

    LLR > 0 => bit 0 (reference convention). noise_var broadcasts with
    symbols. Also returns hard bits.
    """
    modtype = modtype.lower()
    qm = _QM[modtype]
    a = 1.0 / _SCALE[qm]
    r_re = xp.real(symbols).astype(xp.float32)
    r_im = xp.imag(symbols).astype(xp.float32)
    nv = xp.real(xp.asarray(noise_var)).astype(xp.float32)
    nv = xp.broadcast_to(nv, r_re.shape)

    if modtype == "bpsk":
        llr = 4 * (r_re + r_im) * a / nv
        out = llr[..., None].reshape(r_re.shape[:-1] + (-1,))
    elif modtype == "pi/2-bpsk":
        idx = xp.arange(r_re.shape[-1]) % 2
        llr = xp.where(idx == 1, 4 * (-r_re + r_im) * a / nv,
                       4 * (r_re + r_im) * a / nv)
        out = llr.reshape(r_re.shape[:-1] + (-1,))
    else:
        q = qm // 2
        llrs = []
        cur_re, cur_im = r_re, r_im
        for j in range(q):
            llrs.append(_f(cur_re, a, q - j, xp) / nv)
            llrs.append(_f(cur_im, a, q - j, xp) / nv)
            if j < q - 1:
                d = (2 ** (q - 1 - j)) * a
                cur_re = d - xp.abs(cur_re)
                cur_im = d - xp.abs(cur_im)
        out = xp.stack(llrs, axis=-1).reshape(r_re.shape[:-1] + (-1,))
    hard = (out <= 0).astype(xp.int8)
    return hard, out


def demodulate_np(symbols, modtype: str, noise_var):
    hard, llr = demodulate(np.asarray(symbols), modtype,
                           np.asarray(noise_var), xp=np)
    return hard, llr
