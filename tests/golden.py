"""Golden-vector cache: run the reference implementation once, store npz.

Tests call get_golden(name, generator). On first run the generator
executes the reference py5gphy code (mounted read-only) and the outputs
are cached under tests/golden/*.npz which are committed to the repo, so
subsequent test runs (and environments without the reference) stay fast
and hermetic.
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "golden"
REFERENCE = pathlib.Path("/root/reference")


def _patch_reference_numpy2():
    """The reference passes np.int8 scalars as array sizes (e.g. its BCH
    scrambling path), which crashes under NumPy 2 promotion rules. Wrap
    gen_nrPRBS to coerce arguments to python ints — no behavior change."""
    from py5gphy.common import nrPRBS
    if getattr(nrPRBS, "_py5gtpu_int_patch", False):
        return
    orig = nrPRBS.gen_nrPRBS

    def wrapped(c_init, N):
        return orig(int(c_init), int(N))

    nrPRBS.gen_nrPRBS = wrapped
    nrPRBS._py5gtpu_int_patch = True


def get_golden(name: str, generator):
    """Load cached golden arrays, or generate them from the reference.

    generator() must return a dict of numpy arrays.
    """
    path = GOLDEN_DIR / f"{name}.npz"
    if path.exists():
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k].copy() for k in z.files}
    if not REFERENCE.exists():
        raise RuntimeError(
            f"golden vectors {name} missing and reference not mounted")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    _patch_reference_numpy2()
    # the reference loads its data tables via CWD-relative paths
    import os
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        data = generator()
    finally:
        os.chdir(cwd)
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **data)
    return data
