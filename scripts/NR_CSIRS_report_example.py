"""CSI report example: CQI / PMI / RI over a TDL channel
(reference scripts/NR_CSIRS_report_example.py — which ends at stub
comments for the CSI-RS channel-estimation and RI/PMI/CQI steps; this
script completes the pipeline with phy/csirs_report.py).

DL waveform with a CSI-RS resource -> TDL-A MIMO channel + AWGN ->
Rx channel filter + Rx low-PHY -> CDM despreading channel estimate ->
Type-I single-panel codebook search (RI, PMI) -> CQI per 38.214
Table 5.2.2.1-2/3/4, Wideband or Subband per the report config.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from python_5gtoolbox_tpu.utils.platform import use_cpu_for_host_pipelines  # noqa: E402
use_cpu_for_host_pipelines()

import numpy as np  # noqa: E402

from python_5gtoolbox_tpu.models.channel import (NrChannelModel,  # noqa: E402
                                                 gen_channel_model_config)
from python_5gtoolbox_tpu.phy.csirs import NrCSIRS  # noqa: E402
from python_5gtoolbox_tpu.phy.csirs_report import NrCSIRSReport  # noqa: E402
from python_5gtoolbox_tpu.utils.config import get_default_config, merged  # noqa: E402
from python_5gtoolbox_tpu.utils.numerology import (carrier_prb_size,  # noqa: E402
                                                   slots_per_frame)
from python_5gtoolbox_tpu.waveform import dl as dl_wf  # noqa: E402
from python_5gtoolbox_tpu.waveform import rx as rx_wf  # noqa: E402

# ---- configuration (edit-the-constants style, like the reference) ----------
# 38.211 Table 7.4.1.5.3-1 row -> (ports, cdm, density)
row_number = 3                      # 1..5 (at most 4 CSI-RS ports)
snr_db_list = [0.0, 10.0, 20.0]
total_tests = 2
n_rx_ants = 4
n_slots = 2

_ROW_CFG = {1: (1, "noCDM", "three"), 2: (1, "noCDM", "one"),
            3: (2, "fd-CDM2", "one"), 4: (4, "fd-CDM2", "one"),
            5: (4, "fd-CDM2", "one")}

if __name__ == "__main__":
    nports, cdm_type, density = _ROW_CFG[row_number]
    carrier = merged(get_default_config("dl_carrier"),
                     dict(BW=40, scs=30, num_of_ant=nports,
                          maxMIMO_layers=nports))
    csirs = get_default_config("csirs")
    csirs["frequencyDomainAllocation"]["row"] = row_number
    csirs["frequencyDomainAllocation"]["bitstring"] = {
        1: "000000000001", 2: "000000000001", 3: "000001",
        4: "001", 5: "000001"}[row_number]
    csirs.update(nrofPorts=nports, cdm_type=cdm_type, density=density,
                 periodicity=10, slotoffset=0, startingRB=0, nrofRBs=52)
    report_cfg = get_default_config("csirs_report")
    report_cfg["CQITable "] = "table1"     # table1|table2|table3
    report_cfg["CQIMode "] = "Subband"     # Subband|Wideband
    report_cfg["PMIMode "] = "Subband"
    report_cfg["SubbandSize "] = 8         # 38.214 Table 5.2.1.4-2

    scs, bw = carrier["scs"], carrier["BW"]
    prb = carrier_prb_size(scs, bw)
    fs_hz = 245.76e6
    waveform_config = dict(numofslots=n_slots, startSFN=0, startslot=0,
                           samplerate_in_mhz=fs_hz / 1e6)
    nrcsirs = NrCSIRS(carrier, csirs)
    reporter = NrCSIRSReport(carrier, csirs, report_cfg, n_rx=n_rx_ants)

    n_sc, slot_size = 12 * prb, 14 * 12 * prb
    for snr_db in snr_db_list:
        for test in range(total_tests):
            chan_cfg = gen_channel_model_config(
                model_format="TDL-A", Nt=nports, Nr=n_rx_ants,
                Rspat_config=("high", "uniform", "DL", (0, 0)),
                DSdesired=20, fm_inHz=0)
            model = NrChannelModel(chan_cfg, -snr_db, 0.0, fs_hz, scs,
                                   seed=test)
            _, _, dl, _ = dl_wf.gen_dl_waveform(
                waveform_config, carrier, nrCSIRS_list=[nrcsirs])
            rx = model.filter(dl)
            _, rx_fd = rx_wf.waveform_rx_processing(rx, carrier, fs_hz)

            for idx in range(n_slots):
                sfn = (0 + idx) // slots_per_frame(scs)
                slot = idx % slots_per_frame(scs)
                if not reporter.is_valid_slot(sfn, slot):
                    continue
                rx_slot = np.asarray(rx_fd[:, idx * slot_size:
                                           (idx + 1) * slot_size])
                out = reporter.report(rx_slot, sfn, slot)
                print(f"SNR {snr_db:5.1f} dB test {test} slot {slot}: "
                      f"RI={out['RI']} PMI={out['PMI']} "
                      f"CQI={out['CQI']} "
                      f"subband_CQI={out.get('subband_CQI')}")
