"""Multi-host (2-process) jax.distributed smoke test.

SURVEY.md section 5.8 / VERDICT r2 item 4b: everything else in the
suite runs multi-device inside ONE process (virtual 8-CPU mesh). This
test launches two separate processes that join one jax.distributed
job (coordinator on localhost), form a 4-device global mesh (2 local
devices each), and run the overlap-save sharded channel filter whose
lax.ppermute halo exchange crosses the process boundary through the
gloo CPU collectives backend. Each process checks its addressable
shards against the unsharded filter.
"""
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = pathlib.Path(__file__).resolve().parent / "dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mode: str):
    port = str(_free_port())
    return [subprocess.Popen(
        [sys.executable, str(_WORKER), str(pid), port, mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]


def test_two_process_distributed_filter():
    # bounded by the communicate(timeout=240) below
    procs = _run_workers("filter")
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} PASS" in out, out[-3000:]


def test_two_process_sweep_granularity_split():
    """SURVEY 5.8 'DCN only at sweep granularity': two processes run
    disjoint SNR subsets of one LDPC BLER sweep with no mid-work
    communication; one all-gather merges the curve, which must equal
    the single-process full-sweep result."""
    procs = _run_workers("sweep")
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} PASS" in out, out[-3000:]
