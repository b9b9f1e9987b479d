"""Worker process for the 2-process jax.distributed test.

Run as: python tests/dist_worker.py <process_id> <port>
(see tests/test_distributed.py). Each of the 2 processes exposes 2
virtual CPU devices -> a 4-device global mesh spanning both processes;
the overlap-save sharded channel filter then exchanges its FIR halos
with lax.ppermute ACROSS the process boundary (gloo CPU collectives),
closing the SURVEY.md section 5.8 multi-host obligation without real
multi-host hardware.
"""
import os
import pathlib
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from python_5gtoolbox_tpu.ops import filters  # noqa: E402
from python_5gtoolbox_tpu.parallel import timeshard  # noqa: E402

MODE = sys.argv[3] if len(sys.argv) > 3 else "filter"

if MODE == "sweep":
    # SURVEY section 5.8 "DCN only at sweep granularity": each process
    # runs a DISJOINT SNR subset of a tiny LDPC BLER sweep with NO
    # communication during the work (the embarrassingly-parallel
    # per-host split the multi-host scaling story rests on), then the
    # per-point fail counts are merged with one cross-process
    # all-gather and checked against a single-process run of the full
    # sweep.
    from jax.experimental import multihost_utils  # noqa: E402

    from python_5gtoolbox_tpu.ops import ldpc as ldpc_ops  # noqa: E402

    ZC, BGN, L = 36, 2, 8
    K = (22 if BGN == 1 else 10) * ZC
    N = (66 if BGN == 1 else 50) * ZC
    SNRS = [-2.0, -1.0, 0.0, 1.0]
    N_CW = 24

    def fails_at(snr_db: float) -> int:
        # deterministic ACROSS processes (python hash() is per-process
        # randomized): seed from the SNR value itself
        r = np.random.default_rng(90001 + int(round(snr_db * 10)))
        bits = r.integers(2, size=(N_CW, K)).astype(np.int8)
        cw = np.asarray(ldpc_ops.ldpc_encode(jnp.asarray(bits), BGN))
        tx = 1.0 - 2.0 * cw[:, : N].astype(np.float32)
        sigma = 10 ** (-snr_db / 20)
        noisy = tx + sigma * r.normal(size=tx.shape).astype(np.float32)
        llr = 2.0 * noisy / sigma ** 2
        dec, _, _ = ldpc_ops.ldpc_decode(jnp.asarray(llr), ZC, BGN, L,
                                         "min-sum", 0.8, 0.3)
        return int(np.sum(np.any(np.asarray(dec)[:, :K] != bits, axis=1)))

    mine = [i for i in range(len(SNRS)) if i % 2 == pid]
    local = np.zeros(len(SNRS), np.int32)
    for i in mine:
        local[i] = fails_at(SNRS[i])
    gathered = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(local)))            # (2, n_snr)
    merged = gathered.sum(axis=0)
    full = np.array([fails_at(s) for s in SNRS], np.int32)
    np.testing.assert_array_equal(merged, full)
    print(f"proc{pid} PASS merged={merged.tolist()}", flush=True)
    sys.exit(0)

scs, bw = 30, 20
T = 1 << 14
rng = np.random.default_rng(42)  # same on both processes
x_full = (rng.normal(size=(1, T)) + 1j * rng.normal(size=(1, T))
          ).astype(np.complex64)

mesh = Mesh(np.array(jax.devices()), ("sp",))
sharding = NamedSharding(mesh, P(None, "sp"))
x = jax.make_array_from_callback(
    (1, T), sharding, lambda idx: x_full[idx])

y = jax.jit(lambda v: timeshard.sharded_tx_channel_filter(
    v, scs, bw, mesh=mesh, axis="sp"))(x)

# reference: plain unsharded filter on this process's local device
y_ref = np.asarray(filters.tx_channel_filter(jnp.asarray(x_full), scs, bw,
                                             245.76e6))
for shard in y.addressable_shards:
    sl = shard.index
    np.testing.assert_allclose(np.asarray(shard.data), y_ref[sl],
                               rtol=2e-5, atol=2e-5)
print(f"proc{pid} PASS", flush=True)
