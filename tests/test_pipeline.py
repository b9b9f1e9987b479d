"""Pipeline-parallel TX (parallel/pipeline.py): exactness vs the serial
chain on a multi-device CPU mesh."""
import numpy as np
import jax
import pytest

from python_5gtoolbox_tpu.parallel import pipeline


@pytest.mark.skipif(len(jax.devices()) < 2,
                    reason="needs >=2 devices (virtual CPU mesh)")
def test_pipelined_matches_serial():
    scs, bw = 30, 20
    rng = np.random.default_rng(4)
    n_slots, nant, n_sc = 6, 2, 12 * 51
    fd = (rng.normal(size=(nant, n_slots, 14, n_sc))
          + 1j * rng.normal(size=(nant, n_slots, 14, n_sc))
          ).astype(np.complex64)
    y_pp = np.asarray(pipeline.pipelined_tx_waveform(
        fd, scs, bw, int(3500e6), 61.44e6, chunk_slots=2))
    y_ser = np.asarray(pipeline.serial_tx_waveform(
        fd, scs, bw, int(3500e6), 61.44e6))
    assert y_pp.shape == y_ser.shape
    np.testing.assert_allclose(y_pp, y_ser, atol=2e-5, rtol=2e-5)
