"""LDPC BLER simulation internals.

Behavior parity target: scripts/internal/sim_ldpc_internal.py of the
reference (run_ldpc_simulation / draw_ldpc_decoder_result) and the
stimulus generator py5gphy/ldpc/nr_ldpc_decode.py:229
(for_test_5g_ldpc_encoder: K-crc random bits -> CRC -> LDPC encode ->
BPSK -> AWGN -> LLR = 2x/sigma^2).

TPU design: the reference decodes one codeword per Python-loop trial;
here every SNR point is ONE batched device call over `n_trials`
codewords (the decoder's batch axis), ~O(100x) fewer dispatches.
"""
from __future__ import annotations

import pickle

import numpy as np
import jax
import jax.numpy as jnp

from python_5gtoolbox_tpu.ops import crc as crc_ops
from python_5gtoolbox_tpu.ops import ldpc as ldpc_ops


def gen_ldpc_llr_batch(rng: np.random.Generator, zc: int, bgn: int,
                       snr_db: float, n_trials: int, crcpoly: str = "24A"):
    """Batched stimulus -> (blkandcrc (B, K), llr (B, N))."""
    K = zc * (22 if bgn == 1 else 10)
    crc_len = 24 if crcpoly in ("24A", "24B") else 16
    inbits = rng.integers(2, size=(n_trials, K - crc_len)).astype(np.int8)
    blkandcrc = np.asarray(crc_ops.crc_encode(jnp.asarray(inbits), crcpoly))
    dn = np.asarray(ldpc_ops.ldpc_encode(jnp.asarray(blkandcrc), bgn))
    en = 1.0 - 2.0 * dn
    sigma = 10 ** (-snr_db / 20)
    fn = en + rng.normal(0, sigma, dn.shape)
    return blkandcrc, (2.0 * fn / sigma ** 2).astype(np.float32)


def decode_batch(llr: np.ndarray, blkandcrc: np.ndarray, zc: int, bgn: int,
                 L: int, algo: str, alpha: float, beta: float) -> int:
    """-> number of block errors in the batch."""
    bits, ok, _ = ldpc_ops.ldpc_decode(jnp.asarray(llr), zc, bgn, L,
                                       algo=algo, alpha=alpha, beta=beta)
    err = np.any(np.asarray(bits) != blkandcrc, axis=-1)
    return int(np.sum(err))


def expand_test_configs(algo_list, alpha_list, beta_list, mixed_list,
                        L_list):
    """(algo, alpha, beta, L) grid, reference semantics: NMS sweeps alpha
    with beta=0, OMS sweeps beta with alpha=1, mixed sweeps pairs."""
    cfgs = []
    for L in L_list:
        for algo in algo_list:
            if algo in ("BP", "min-sum"):
                cfgs.append(dict(algo=algo, alpha=1.0, beta=0.0, L=L))
            elif algo == "NMS":
                cfgs += [dict(algo="min-sum", name="NMS", alpha=a, beta=0.0,
                              L=L) for a in alpha_list]
            elif algo == "OMS":
                cfgs += [dict(algo="min-sum", name="OMS", alpha=1.0, beta=b,
                              L=L) for b in beta_list]
            elif algo == "mixed-MS":
                cfgs += [dict(algo="min-sum", name="mixed-MS", alpha=a,
                              beta=b, L=L) for a, b in mixed_list]
            else:
                raise ValueError(algo)
    for c in cfgs:
        c.setdefault("name", c["algo"])
    return cfgs


def run_ldpc_simulation(zc, bgn, crcpoly, algo_list, alpha_list, beta_list,
                        mixed_list, L_list, snr_db_list, filename,
                        n_trials: int = 400, seed: int = 0):
    """Sweep the decoder grid over SNR; pickle
    [sim_config, test_config_list, test_results_list] like the reference."""
    sim_config = dict(Zc=zc, bgn=bgn, crcpoly=crcpoly,
                      snr_db_list=list(snr_db_list), n_trials=n_trials)
    cfgs = expand_test_configs(algo_list, alpha_list, beta_list, mixed_list,
                               L_list)
    results = []
    for cfg in cfgs:
        rng = np.random.default_rng(seed)
        blers = []
        for snr in snr_db_list:
            blkandcrc, llr = gen_ldpc_llr_batch(rng, zc, bgn, snr, n_trials,
                                                crcpoly)
            nerr = decode_batch(llr, blkandcrc, zc, bgn, cfg["L"],
                                cfg["algo"], cfg["alpha"], cfg["beta"])
            blers.append(nerr / n_trials)
            print(f"{cfg['name']} a={cfg['alpha']} b={cfg['beta']} "
                  f"L={cfg['L']} snr={snr:+.1f}dB BLER={blers[-1]:.4f}")
        results.append(blers)
    if filename:
        with open(filename, "wb") as f:
            pickle.dump([sim_config, cfgs, results], f)
    return sim_config, cfgs, results


def draw_ldpc_decoder_result(snr_db_list, sim_config, test_config_list,
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
        label = (f"{cfg['name']} a={cfg['alpha']} b={cfg['beta']} "
                 f"L={cfg['L']}")
        plt.semilogy(snr_db_list, np.maximum(blers, 1e-5), "-o", label=label)
    plt.grid(True, which="both")
    plt.xlabel("SNR (dB)")
    plt.ylabel("BLER")
    plt.title(f"LDPC Zc={sim_config['Zc']} bgn={sim_config['bgn']}")
    plt.legend(fontsize=7)
    plt.savefig(figfile, dpi=120, bbox_inches="tight")
    plt.close()
