"""QAM modulation mapper, TS 38.211 5.1.

Behavior parity target: py5gphy/common/nrModulation.py:5-45 (closed-form
Gray mapping for pi/2-BPSK, BPSK, QPSK, 16/64/256/1024-QAM).

TPU design: bits are reshaped to (..., n_sym, Qm) and mapped with a single
vectorized Horner-style evaluation of the Gray amplitude recursion
    amp = 2^(q) - s_1*(2^(q-1) - s_2*(...))
which runs entirely on the VPU, batched over any leading axes. Works in
both NumPy (plan time) and JAX (device) via the array namespace argument.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

QM_TABLE = {
    "pi/2-bpsk": 1,
    "bpsk": 1,
    "qpsk": 2,
    "16qam": 4,
    "64qam": 6,
    "256qam": 8,
    "1024qam": 10,
}

_SCALE = {
    1: 1.0 / math.sqrt(2.0),
    2: 1.0 / math.sqrt(2.0),
    4: 1.0 / math.sqrt(10.0),
    6: 1.0 / math.sqrt(42.0),
    8: 1.0 / math.sqrt(170.0),
    10: 1.0 / math.sqrt(682.0),
}


def _gray_amplitude(signs, xp):
    """signs: (..., n_levels) of +-1 -> Gray-mapped odd amplitude.

    amp = s_0 * (2^(k-1)... evaluated innermost-out:
    for levels [s0, s1, ..., s_{k-1}]:
        a = 1;  for j = k-1 .. 1:  a = 2^(k-j) - s_j * a ... see 38.211 5.1
    Implemented as the recursion a_j = 2*a_{j+1'}... done iteratively.
    """
    k = signs.shape[-1]
    acc = xp.ones(signs.shape[:-1], dtype=signs.dtype)
    for j in range(k - 1, 0, -1):
        acc = (2 ** (k - j)) - signs[..., j] * acc
    return signs[..., 0] * acc


def modulate(bits, modtype: str, xp=jnp):
    """Map 0/1 bits (..., n_sym*Qm) to complex64 symbols (..., n_sym).

    Matches the reference constellation exactly (incl. pi/2-BPSK's
    alternating rotation on odd symbol indices).
    """
    modtype = modtype.lower()
    qm = QM_TABLE[modtype]
    b = xp.asarray(bits)
    n = b.shape[-1]
    assert n % qm == 0, f"bit count {n} not a multiple of Qm={qm}"
    b = (1.0 - 2.0 * b.astype(xp.float32)).reshape(b.shape[:-1] + (n // qm, qm))
    scale = _SCALE[qm]

    if modtype == "bpsk":
        s = b[..., 0]
        return (scale * (s + 1j * s)).astype(xp.complex64)
    if modtype == "pi/2-bpsk":
        s = b[..., 0]
        d_even = scale * (s + 1j * s)
        d_odd = scale * (-s + 1j * s)
        idx = xp.arange(s.shape[-1]) % 2
        return xp.where(idx == 1, d_odd, d_even).astype(xp.complex64)

    # I channel from even bit positions, Q from odd positions.
    re = _gray_amplitude(b[..., 0::2], xp)
    im = _gray_amplitude(b[..., 1::2], xp)
    return (scale * (re + 1j * im)).astype(xp.complex64)


def modulate_np(bits, modtype: str) -> np.ndarray:
    return np.asarray(modulate(bits, modtype, xp=np))


def constellation(modtype: str, xp=np):
    """All 2^Qm symbols indexed by the MSB-first integer of their bits.

    Mirrors py5gphy get_mod_list (common/nrModulation.py:47) — used by ML
    equalization and max-log LLR tables.
    """
    qm = QM_TABLE[modtype.lower()]
    m = np.arange(2 ** qm)
    bits = ((m[:, None] >> np.arange(qm - 1, -1, -1)) & 1).astype(np.int8)
    return modulate(bits.reshape(-1), modtype, xp=xp), bits
