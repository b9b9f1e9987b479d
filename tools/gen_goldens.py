"""Pre-generate all golden-vector caches by invoking the test generators.

Run: python tools/gen_goldens.py   (slow: executes the reference on CPU)
"""
import importlib
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import os
os.environ["JAX_PLATFORMS"] = "cpu"

from tests.golden import get_golden, GOLDEN_DIR  # noqa: E402


def main():
    specs = []
    modnames = sorted(
        "tests." + p.stem for p in (REPO / "tests").glob("test_*.py"))
    for modname in modnames:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        for name in dir(mod):
            if name.startswith("_gen_") and "_golden" in name:
                gname = getattr(mod, name).__name__
                specs.append((modname, name, getattr(mod, name)))
    # golden cache name is embedded in the fixture call; re-derive by
    # scanning the module source for get_golden("<name>", _gen_x)
    import re
    for modname, fname, fn in specs:
        src = pathlib.Path(
            REPO / (modname.replace(".", "/") + ".py")).read_text()
        m = re.search(r'get_golden\("([^"]+)",\s*' + fname, src)
        if not m:
            print(f"skip {modname}.{fname}: no get_golden call found")
            continue
        cache = m.group(1)
        if (GOLDEN_DIR / f"{cache}.npz").exists():
            print(f"cached  {cache}")
            continue
        t0 = time.time()
        get_golden(cache, fn)
        print(f"generated {cache} in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
