"""Polar BLER simulation internals.

Behavior parity target: scripts/internal/sim_polar_internal.py of the
reference and py5gphy/polar/nr_polar_decoder.py:46
(for_test_5g_polar_encoder: K random bits -> CRC(6/11/24C, optional 24-ones
pad + rnti mask) -> polar encode(E, nMax, iIL) -> BPSK -> AWGN -> LLR).

TPU design: one batched SCL decode per SNR point (list axis + batch axis
inside a single executable) instead of a per-trial Python loop.
"""
from __future__ import annotations

import pickle

import numpy as np
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import crc as crc_ops
from python_5gtoolbox_tpu.ops import polar as polar_ops


def gen_polar_llr_batch(rng: np.random.Generator, K: int, E: int,
                        n_max: int, i_il: int, snr_db: float, n_trials: int,
                        crc_len: int = 24, pad_crc: int = 0, rnti: int = 0):
    """-> (blkandcrc (B, K), llr (B, E))."""
    poly = {6: "6", 11: "11", 24: "24C"}[crc_len]
    A = K - crc_len
    inbits = rng.integers(2, size=(n_trials, A)).astype(np.int8)
    if pad_crc == 0:
        blkandcrc = np.asarray(crc_ops.crc_encode(jnp.asarray(inbits), poly))
    else:
        padded = np.concatenate(
            [np.ones((n_trials, 24), np.int8), inbits], axis=-1)
        blkandcrc = np.asarray(crc_ops.crc_encode(jnp.asarray(padded), poly,
                                                  rnti))[:, 24:]
    enc = np.asarray(polar_ops.polar_encode(jnp.asarray(blkandcrc), E,
                                            n_max, i_il))
    en = 1.0 - 2.0 * enc
    sigma = 10 ** (-snr_db / 20)
    fn = en + rng.normal(0, sigma, en.shape)
    return blkandcrc, (2.0 * fn / sigma ** 2).astype(np.float32)


def decode_batch(llr: np.ndarray, blkandcrc: np.ndarray, E: int, K: int,
                 list_size: int, n_max: int, i_il: int, crc_len: int,
                 pad_crc: int = 0, rnti: int = 0) -> int:
    """SCL decode a batch of mother-code LLRs (B, N) -> block errors.
    (The reference sims feed N-length LLRs straight from the encoder —
    nr_polar_decoder.py:17 'LLRin: N length input'.)"""
    ck, ok = polar_ops.polar_decode_scl(jnp.asarray(llr), E, K, list_size,
                                        n_max, i_il, crc_len=crc_len,
                                        pad_crc=pad_crc, rnti=rnti)
    err = np.any(np.asarray(ck) != blkandcrc, axis=-1)
    return int(np.sum(err))


def run_polar_simulation(K, E, n_max, i_il, crc_len, algo_list, L_list,
                         snr_db_list, filename, n_trials: int = 400,
                         seed: int = 0):
    """algo_list from ['SC', 'SCL'] (optionB variants of the reference are
    algorithmically identical and intentionally not duplicated)."""
    sim_config = dict(K=K, E=E, nMax=n_max, iIL=i_il, CRCLEN=crc_len,
                      snr_db_list=list(snr_db_list), n_trials=n_trials)
    cfgs = []
    for algo in algo_list:
        if algo == "SC":
            cfgs.append(dict(algo="SC", L=1))
        else:
            cfgs += [dict(algo="SCL", L=L) for L in L_list]
    results = []
    for cfg in cfgs:
        rng = np.random.default_rng(seed)
        blers = []
        for snr in snr_db_list:
            blkandcrc, llr = gen_polar_llr_batch(
                rng, K, E, n_max, i_il, snr, n_trials, crc_len)
            nerr = decode_batch(llr, blkandcrc, E, K, cfg["L"], n_max, i_il,
                                crc_len)
            blers.append(nerr / n_trials)
            print(f"{cfg['algo']} L={cfg['L']} snr={snr:+.1f}dB "
                  f"BLER={blers[-1]:.4f}")
        results.append(blers)
    if filename:
        with open(filename, "wb") as f:
            pickle.dump([sim_config, cfgs, results], f)
    return sim_config, cfgs, results


def draw_polar_decoder_result(snr_db_list, sim_config, test_config_list,
                              test_results_list, figfile):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping figure")
        return
    plt.figure(figsize=(8, 5))
    for cfg, blers in zip(test_config_list, test_results_list):
        plt.semilogy(snr_db_list, np.maximum(blers, 1e-5), "-o",
                     label=f"{cfg['algo']} L={cfg['L']}")
    plt.grid(True, which="both")
    plt.xlabel("SNR (dB)")
    plt.ylabel("BLER")
    plt.title(f"Polar K={sim_config['K']} E={sim_config['E']} "
              f"CRC{sim_config['CRCLEN']}")
    plt.legend(fontsize=8)
    plt.savefig(figfile, dpi=120, bbox_inches="tight")
    plt.close()
