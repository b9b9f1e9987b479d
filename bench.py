"""Benchmark: OFDM modulation + channel filter throughput on real TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}. The north-star target is >= 1 Gsample/s aggregate
OFDM modulation (BASELINE.json), so vs_baseline = Msamples_per_s / 1000.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from python_5gtoolbox_tpu.ops import ofdm, filters
    from python_5gtoolbox_tpu.utils import numerology as num

    scs, bw = 30, 100
    n_slots, nant = 16, 2
    prb = num.carrier_prb_size(scs, bw)
    rng = np.random.default_rng(0)
    fd = (rng.normal(size=(n_slots, nant, 14, 12 * prb))
          + 1j * rng.normal(size=(n_slots, nant, 14, 12 * prb))
          ).astype(np.complex64)

    @jax.jit
    def step(fd_slots):
        td = ofdm.tx_low_phy(fd_slots, scs, bw, int(3500e6))
        flat = jnp.swapaxes(td, 0, 1).reshape(td.shape[1], -1)
        return filters.tx_channel_filter(flat, scs, bw, 245.76e6)

    x = jnp.asarray(fd)
    out = step(x)
    out.block_until_ready()  # compile

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter

    out_samples = out.shape[-1] * out.shape[0]  # per step, all antennas
    msps = out_samples / dt / 1e6
    print(json.dumps({
        "metric": "ofdm_duc_throughput",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
