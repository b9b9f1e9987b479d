"""Soft-decision LDPC decoder BLER study (reference scripts/sim_ldpc_decoder.py).

Supported algorithms: BP (sum-product), min-sum, NMS (normalized,
alpha<1), OMS (offset, beta>0), mixed-MS (alpha & beta). Results are
pickled to out/ and plotted, same artifact pattern as the reference.
Edit the constants below (reference style); every SNR point runs as one
batched decode on the accelerator.
"""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402
select_platform("sweep")

import numpy as np  # noqa: E402

from scripts.internal import sim_ldpc_internal  # noqa: E402

# ---- test 1: algorithm comparison -----------------------------------------
Zc = 12
bgn = 1
crcpoly = "24A"
algo_list = ["BP", "min-sum", "NMS", "OMS", "mixed-MS"]
alpha_list = [0.7]
beta_list = [0.5]
mixed_list = [[0.8, 0.3], [0.7, 0.3]]
L_list = [16]
snr_db_list = np.arange(-1, 1.5, 0.5).tolist()
n_trials = 400

filename = "out/ldpc_decode_result_opt.pickle"
figfile = "out/ldpc_decode_result_opt.png"

sim_flag = 1

if __name__ == "__main__":
    if sim_flag:
        sim_ldpc_internal.run_ldpc_simulation(
            Zc, bgn, crcpoly, algo_list, alpha_list, beta_list, mixed_list,
            L_list, snr_db_list, filename, n_trials=n_trials)
    with open(filename, "rb") as f:
        sim_config, cfgs, results = pickle.load(f)
    sim_ldpc_internal.draw_ldpc_decoder_result(
        snr_db_list, sim_config, cfgs, results, figfile)

    # ---- test 2: iteration count L (reference conclusion: 32 ~ 64 >> 16)
    if sim_flag:
        sim_ldpc_internal.run_ldpc_simulation(
            10, 1, crcpoly, ["mixed-MS"], [], [], [[0.8, 0.3]],
            [16, 32, 64], snr_db_list, "out/ldpc_decode_result_for_L.pickle",
            n_trials=n_trials)
    with open("out/ldpc_decode_result_for_L.pickle", "rb") as f:
        sim_config, cfgs, results = pickle.load(f)
    sim_ldpc_internal.draw_ldpc_decoder_result(
        snr_db_list, sim_config, cfgs, results,
        "out/ldpc_decode_result_for_L.png")
