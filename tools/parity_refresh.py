"""Refresh the REFERENCE side of the committed BLER-parity artifacts
from the accumulated reference jsonl logs (VERDICT r4 item 4: harden
parity statistics by backgrounding reference trials across the round).

The repo-side BLER/trials in each artifact are kept as-is (they were
measured at >=640 trials); only ref_bler / ref_trials / z are updated
by summing every batch record in out/pdsch_ref_bler.jsonl /
out/pusch_fading_ref.jsonl. z is the same pooled-proportion two-sample
statistic as tools/pdsch_bler_parity.py:177-181.

Usage: python tools/parity_refresh.py
"""
from __future__ import annotations

import json
import pathlib

import numpy as np

OUT = pathlib.Path(__file__).resolve().parents[1] / "out"


def _z(repo_bler, repo_trials, ref_fails, ref_trials):
    repo_fails = int(round(repo_bler * repo_trials))
    ref_bler = ref_fails / ref_trials
    pool = (ref_fails + repo_fails) / (ref_trials + repo_trials)
    se = np.sqrt(max(pool * (1 - pool), 1e-12)
                 * (1 / ref_trials + 1 / repo_trials))
    return ref_bler, round(float((repo_bler - ref_bler) / se), 2)


def refresh_pdsch(cell: str, artifact: str) -> None:
    path = OUT / artifact
    if not path.exists():
        return
    doc = json.load(open(path))
    refs = {}
    for line in (OUT / "pdsch_ref_bler.jsonl").read_text().splitlines():
        r = json.loads(line)
        if r.get("cell", "rayleigh2x4") != cell:
            continue
        k = (float(r["snr_db"]), r["algo"])
        acc = refs.setdefault(k, dict(trials=0, fails=0))
        acc["trials"] += r["trials"]
        acc["fails"] += r["fails"]
    for d in doc["points"]:
        r = refs.get((float(d["snr_db"]), d["algo"]))
        if not r:
            continue
        ref_bler, z = _z(d["repo_bler"], d["repo_trials"],
                         r["fails"], r["trials"])
        d.update(ref_bler=ref_bler, ref_trials=r["trials"], z=z)
    discr = [d for d in doc["points"]
             if "z" in d and 0.0 < d.get("ref_bler", 0) < 1.0]
    doc["discriminating_points"] = len(discr)
    doc["discriminating_in_3sigma"] = len(
        [d for d in discr if abs(d["z"]) <= 3.0])
    json.dump(doc, open(path, "w"), indent=1)
    print(artifact, "->", [(d["snr_db"], d.get("algo"),
                            d.get("ref_trials"), d.get("z"))
                           for d in doc["points"] if "z" in d])


def refresh_pusch_fading() -> None:
    path = OUT / "pusch_fading_parity.json"
    if not path.exists():
        return
    doc = json.load(open(path))
    fm = 30.0
    timeoff = 20.0
    refs = {}
    for line in (OUT / "pusch_fading_ref.jsonl").read_text().splitlines():
        r = json.loads(line)
        if r.get("fm_hz") != fm or r.get("timeoff_ns") != timeoff:
            continue
        acc = refs.setdefault(float(r["snr_db"]),
                              dict(trials=0, fails=0))
        acc["trials"] += r["trials"]
        acc["fails"] += r["fails"]
    for d in doc["points"]:
        r = refs.get(float(d["snr_db"]))
        if not r:
            continue
        ref_bler, z = _z(d["repo_bler"], d["repo_trials"],
                         r["fails"], r["trials"])
        d.update(ref_bler=ref_bler, ref_trials=r["trials"], z=z)
    doc["in_3sigma"] = [d["snr_db"] for d in doc["points"]
                        if abs(d.get("z", 99)) <= 3.0]
    json.dump(doc, open(path, "w"), indent=1)
    print("pusch_fading_parity.json ->",
          [(d["snr_db"], d.get("ref_trials"), d.get("z"))
           for d in doc["points"]])


if __name__ == "__main__":
    refresh_pdsch("rayleigh2x4", "pdsch_bler_parity.json")
    refresh_pdsch("tdl4x4corr", "pdsch_bler_parity_tdl4x4corr.json")
    refresh_pusch_fading()
