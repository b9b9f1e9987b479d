"""Offset-min-sum beta hyper-search (reference scripts/OMS_ldpc_search_best_beta.py).

For each (Zc, bgn) pair, sweep beta at a fixed SNR and record the best
(lowest BLER) offset. One batched decode per grid point.
"""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402
select_platform("sweep")

import numpy as np  # noqa: E402

from scripts.internal import sim_ldpc_internal  # noqa: E402

Zc_list = [12, 48, 112, 208]
bgn_list = [1, 2]
beta_list = np.arange(0.1, 0.8, 0.1).round(2).tolist()
L = 16
snr_db = -0.5
n_trials = 400

if __name__ == "__main__":
    for bgn in bgn_list:
        for Zc in Zc_list:
            rng = np.random.default_rng(1)
            blers = []
            for beta in beta_list:
                blk, llr = sim_ldpc_internal.gen_ldpc_llr_batch(
                    rng, Zc, bgn, snr_db, n_trials)
                nerr = sim_ldpc_internal.decode_batch(
                    llr, blk, Zc, bgn, L, "min-sum", 1.0, beta)
                blers.append(nerr / n_trials)
                print(f"Zc={Zc} bgn={bgn} beta={beta} BLER={blers[-1]:.4f}")
            best = beta_list[int(np.argmin(blers))]
            print(f"==> Zc={Zc} bgn={bgn}: best beta = {best}")
            with open(f"out/OMS_search_beta_ZC{Zc}_bgn{bgn}.pickle",
                      "wb") as f:
                pickle.dump([dict(Zc=Zc, bgn=bgn, snr_db=snr_db, L=L),
                             beta_list, blers, best], f)
