"""Generate TS 38.141-1 FR1 test-model waveforms
(reference scripts/gen_nr_testmodel.py).

Builds NR-FR1-TM{1.1,2,2a,3.1,3.1a} config sets via the test-model
generator, instantiates the DL channel objects and emits the frame
waveform at the carrier sample rate; saves IQ to out/*.npz.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import use_cpu_for_host_pipelines  # noqa: E402
use_cpu_for_host_pipelines()

import numpy as np  # noqa: E402

from python_5gtoolbox_tpu.phy.testmodel import gen_nr_tm_cfg  # noqa: E402
from python_5gtoolbox_tpu.waveform.dl import (gen_dl_channel_list,  # noqa: E402
                                              gen_dl_waveform)

scs = 30
BW = 40
duplex = "TDD"
cell_id = 1
fc_mhz = 3500.0
TM_list = ["NR-FR1-TM1.1", "NR-FR1-TM2", "NR-FR1-TM2a", "NR-FR1-TM3.1",
           "NR-FR1-TM3.1a"]

if __name__ == "__main__":
    for tm in TM_list:
        (waveform_cfg, carrier_cfg, ssb_cfg, csirs_list, coreset_list,
         ss_list, pdcch_list, pdsch_list) = gen_nr_tm_cfg(
            scs, BW, duplex, tm, cell_id, fc_mhz)
        ssb_l, pdsch_l, csirs_l, pdcch_l = gen_dl_channel_list(
            waveform_cfg, carrier_cfg, ssb_cfg, pdcch_list, ss_list,
            coreset_list, csirs_list, pdsch_list)
        fd, td, dl, fs = gen_dl_waveform(
            waveform_cfg, carrier_cfg, nrSSB_list=ssb_l,
            nrPdsch_list=pdsch_l, nrCSIRS_list=csirs_l,
            nrPDCCH_list=pdcch_l)
        name = tm.replace(".", "p").replace("-", "_")
        out = f"out/{name}_scs{scs}_bw{BW}_{duplex}.npz"
        np.savez_compressed(out, dl_waveform=dl,
                            samplerate_in_mhz=waveform_cfg[
                                "samplerate_in_mhz"])
        power = 10 * np.log10(np.mean(np.abs(dl) ** 2) + 1e-30)
        print(f"{tm}: {dl.shape[1]} samples @ "
              f"{waveform_cfg['samplerate_in_mhz']} Msps, "
              f"mean power {power:.2f} dBFS -> {out}")
