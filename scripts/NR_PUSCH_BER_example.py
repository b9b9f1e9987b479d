"""PUSCH BLER-vs-SNR example (reference scripts/NR_PUSCH_BER_example.py)."""
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import select_platform  # noqa: E402
select_platform("sweep")

import numpy as np  # noqa: E402

from python_5gtoolbox_tpu.models.channel import gen_channel_model_config  # noqa: E402
from python_5gtoolbox_tpu.utils.config import get_default_config, merged  # noqa: E402
from scripts.internal import sim_pusch_throughput_internal as internal  # noqa: E402

Nt = Nr = 1
snr_db_list = np.arange(-2.0, 6.0, 1.0).tolist()
ceq_algo_list = ["MMSE-IRC"]
n_slots = 4
filename = "out/nr_pusch_ber.pickle"

if __name__ == "__main__":
    carrier = merged(get_default_config("ul_carrier"),
                     dict(BW=20, scs=30, num_of_ant=Nt, Nr=Nr))
    pusch = get_default_config("pusch")
    pusch.update(mcs_table="MCStable61411", mcs_index=5, num_of_layers=1,
                 nNrOfAntennaPorts=1, data_source=[1, 0, 0, 1])
    pusch["ResAlloType1"]["RBSize"] = 20
    chan_cfg = gen_channel_model_config(model_format="AWGN", Nt=Nt, Nr=Nr)
    results = internal.run_pusch_throughput(
        carrier, pusch, chan_cfg, snr_db_list, ceq_algo_list,
        n_slots=n_slots)
    bler = {a: [1.0 - p for p in results[a]] for a in ceq_algo_list}
    with open(filename, "wb") as f:
        pickle.dump([dict(Nt=Nt, Nr=Nr, snr_db_list=snr_db_list), bler], f)
    for a in ceq_algo_list:
        print(f"{a}: BLER {bler[a]}")
