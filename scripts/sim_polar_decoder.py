"""Polar decoder BLER study (reference scripts/sim_polar_decoder.py).

SC vs CA-PC-SCL with several list sizes on the UL polar code
(nMax=10, iIL=0, CRC11). Batched trials per SNR point.
"""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402
select_platform("sweep")

import numpy as np  # noqa: E402

from scripts.internal import sim_polar_internal  # noqa: E402

K = 64          # info + CRC bits
E = 128         # rate-match size (mother code N derives from K, E)
nMax = 10
iIL = 0
CRCLEN = 11
algo_list = ["SC", "SCL"]
L_list = [8, 32]
snr_db_list = np.arange(0.5, 4.0, 0.5).tolist()
n_trials = 400

filename = "out/polar_decode_result_all.pickle"
figfile = "out/polar_decode_result_all.png"

sim_flag = 1

if __name__ == "__main__":
    if sim_flag:
        sim_polar_internal.run_polar_simulation(
            K, E, nMax, iIL, CRCLEN, algo_list, L_list, snr_db_list,
            filename, n_trials=n_trials)
    with open(filename, "rb") as f:
        sim_config, cfgs, results = pickle.load(f)
    sim_polar_internal.draw_polar_decoder_result(
        snr_db_list, sim_config, cfgs, results, figfile)
