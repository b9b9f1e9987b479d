"""Mixed min-sum (alpha, beta) pair hyper-search
(reference scripts/mixed_MS_ldpc_search_best_pair.py)."""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402
select_platform("sweep")

import numpy as np  # noqa: E402

from scripts.internal import sim_ldpc_internal  # noqa: E402

Zc_list = [12, 112]
bgn_list = [1, 2]
alpha_list = [0.6, 0.7, 0.8, 0.9]
beta_list = [0.1, 0.2, 0.3, 0.4]
L = 16
snr_db = -0.5
n_trials = 400

if __name__ == "__main__":
    for bgn in bgn_list:
        for Zc in Zc_list:
            rng = np.random.default_rng(1)
            pairs, blers = [], []
            for alpha in alpha_list:
                for beta in beta_list:
                    blk, llr = sim_ldpc_internal.gen_ldpc_llr_batch(
                        rng, Zc, bgn, snr_db, n_trials)
                    nerr = sim_ldpc_internal.decode_batch(
                        llr, blk, Zc, bgn, L, "min-sum", alpha, beta)
                    pairs.append((alpha, beta))
                    blers.append(nerr / n_trials)
                    print(f"Zc={Zc} bgn={bgn} pair=({alpha},{beta}) "
                          f"BLER={blers[-1]:.4f}")
            best = pairs[int(np.argmin(blers))]
            print(f"==> Zc={Zc} bgn={bgn}: best (alpha, beta) = {best}")
            with open(f"out/mixed_MS_search_pair_ZC{Zc}_bgn{bgn}.pickle",
                      "wb") as f:
                pickle.dump([dict(Zc=Zc, bgn=bgn, snr_db=snr_db, L=L),
                             pairs, blers, best], f)
