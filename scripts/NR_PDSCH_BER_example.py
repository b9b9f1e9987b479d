"""PDSCH BER/BLER-vs-SNR example (reference scripts/NR_PDSCH_BER_example.py).

Sweeps SNR over an AWGN channel and reports TB BLER for each CEQ
algorithm (BER waterfall study companion to the throughput example).
"""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402
select_platform("sweep")

import numpy as np  # noqa: E402

from python_5gtoolbox_tpu.models.channel import gen_channel_model_config  # noqa: E402
from python_5gtoolbox_tpu.utils.config import get_default_config, merged  # noqa: E402
from scripts.internal import sim_pdsch_throughput_internal as internal  # noqa: E402

Nt = Nr = 2
snr_db_list = np.arange(2.0, 10.0, 1.0).tolist()
ceq_algo_list = ["MMSE-IRC"]
n_slots = 4
filename = "out/nr_pdsch_ber.pickle"

if __name__ == "__main__":
    carrier = merged(get_default_config("dl_carrier"),
                     dict(BW=20, scs=30, num_of_ant=Nt, Nr=Nr,
                          maxMIMO_layers=Nt))
    pdsch = get_default_config("pdsch")
    pdsch.update(mcs_table="64QAM", mcs_index=4, num_of_layers=Nt,
                 data_source=[1, 0, 0, 1])
    pdsch["ResAlloType1"]["RBSize"] = 20
    pdsch["precoding_matrix"] = np.eye(Nt).tolist()
    chan_cfg = gen_channel_model_config(model_format="AWGN", Nt=Nt, Nr=Nr)
    results = internal.run_pdsch_throughput(
        carrier, pdsch, chan_cfg, snr_db_list, ceq_algo_list,
        n_slots=n_slots)
    bler = {a: [1.0 - p for p in results[a]] for a in ceq_algo_list}
    with open(filename, "wb") as f:
        pickle.dump([dict(Nt=Nt, Nr=Nr, snr_db_list=snr_db_list), bler], f)
    for a in ceq_algo_list:
        print(f"{a}: BLER {bler[a]}")
