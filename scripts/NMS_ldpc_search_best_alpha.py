"""Normalized-min-sum alpha hyper-search
(reference scripts/NMS_ldpc_search_best_alpha.py)."""
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
alpha_list = np.arange(0.5, 1.0, 0.05).round(2).tolist()
L = 16
snr_db = -0.5
n_trials = 400

if __name__ == "__main__":
    for bgn in bgn_list:
        for Zc in Zc_list:
            rng = np.random.default_rng(1)
            blers = []
            for alpha in alpha_list:
                blk, llr = sim_ldpc_internal.gen_ldpc_llr_batch(
                    rng, Zc, bgn, snr_db, n_trials)
                nerr = sim_ldpc_internal.decode_batch(
                    llr, blk, Zc, bgn, L, "min-sum", alpha, 0.0)
                blers.append(nerr / n_trials)
                print(f"Zc={Zc} bgn={bgn} alpha={alpha} "
                      f"BLER={blers[-1]:.4f}")
            best = alpha_list[int(np.argmin(blers))]
            print(f"==> Zc={Zc} bgn={bgn}: best alpha = {best}")
            with open(f"out/NMS_search_alpha_ZC{Zc}_bgn{bgn}.pickle",
                      "wb") as f:
                pickle.dump([dict(Zc=Zc, bgn=bgn, snr_db=snr_db, L=L),
                             alpha_list, blers, best], f)
