"""Hard-decision bit-flipping LDPC decoder BLER study
(reference scripts/sim_ldpc_decoder_bf.py; stimulus parity with
py5gphy/ldpc/ldpc_decoder_bit_flipping.py:75 for_test_ldpc_encoder —
full unpunctured codeword, BPSK, AWGN).
"""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402
select_platform("sweep")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from python_5gtoolbox_tpu.ops import crc as crc_ops  # noqa: E402
from python_5gtoolbox_tpu.ops import ldpc as ldpc_ops  # noqa: E402
from scripts.internal.sim_ldpc_internal import draw_ldpc_decoder_result  # noqa: E402

Zc = 16
bgn = 2
L_list = [10, 20]
snr_db_list = np.arange(4.0, 9.0, 1.0).tolist()
n_trials = 400

filename = "out/ldpc_bf_decode_result.pickle"
figfile = "out/ldpc_bf_decode_result.png"


def run():
    rng = np.random.default_rng(0)
    K = Zc * (22 if bgn == 1 else 10)
    cfgs = [dict(name="BF", algo="BF", alpha=1.0, beta=0.0, L=L)
            for L in L_list]
    results = []
    for cfg in cfgs:
        blers = []
        for snr in snr_db_list:
            bits = rng.integers(2, size=(n_trials, K - 24)).astype(np.int8)
            bc = np.asarray(crc_ops.crc_encode(jnp.asarray(bits), "24A"))
            dn = np.asarray(ldpc_ops.ldpc_encode(jnp.asarray(bc), bgn))
            full = np.concatenate([bc[:, : 2 * Zc], dn], axis=-1)
            sigma = 10 ** (-snr / 20)
            llr = ((1 - 2 * full) + rng.normal(0, sigma, full.shape)
                   ).astype(np.float32)
            out, ok = ldpc_ops.ldpc_decode_bf(jnp.asarray(llr), Zc, bgn,
                                              cfg["L"])
            err = np.any(np.asarray(out)[:, :K] != bc, axis=-1)
            blers.append(float(np.mean(err)))
            print(f"BF L={cfg['L']} snr={snr:+.1f}dB BLER={blers[-1]:.4f}")
        results.append(blers)
    sim_config = dict(Zc=Zc, bgn=bgn, snr_db_list=snr_db_list,
                      n_trials=n_trials)
    with open(filename, "wb") as f:
        pickle.dump([sim_config, cfgs, results], f)
    return sim_config, cfgs, results


if __name__ == "__main__":
    sim_config, cfgs, results = run()
    draw_ldpc_decoder_result(snr_db_list, sim_config, cfgs, results, figfile)
