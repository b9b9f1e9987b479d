"""utils/platform.select_platform routing (subprocess per case — the
platform choice must land before first device use)."""
import os
import subprocess
import sys

import pytest

_PROBE = """
import sys
from python_5gtoolbox_tpu.utils.platform import select_platform
select_platform(sys.argv[1])
import jax
print("PLATFORM=" + jax.devices()[0].platform)
"""


def _run(profile: str, env_extra: dict) -> str:
    env = dict(os.environ, **env_extra)
    env.pop("PY5G_FORCE_TPU", None)
    env.pop("PY5G_FORCE_CPU", None)
    env.update(env_extra)
    out = subprocess.run([sys.executable, "-c", _PROBE, profile],
                         capture_output=True, text=True, env=env,
                         timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    for line in out.stdout.splitlines():
        if line.startswith("PLATFORM="):
            return line.split("=", 1)[1]
    raise AssertionError(out.stdout)


def test_latency_profile_defaults_to_cpu():
    assert _run("latency", {}) == "cpu"


def test_latency_force_tpu_env():
    # on a CPU-only host this still resolves to cpu; the assertion is
    # that the env var does not break platform init
    plat = _run("latency", {"PY5G_FORCE_TPU": "1"})
    assert plat in ("cpu", "tpu")


def test_sweep_force_cpu_env():
    assert _run("sweep", {"PY5G_FORCE_CPU": "1"}) == "cpu"


def test_unknown_profile_rejected():
    from python_5gtoolbox_tpu.utils.platform import select_platform
    with pytest.raises(AssertionError):
        select_platform("bogus")
