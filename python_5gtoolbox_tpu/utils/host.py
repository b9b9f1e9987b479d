"""Device->host transfer helpers.

The axon TPU backend (experimental) implements complex64 compute and
host->device transfer but NOT device->host transfer of complex arrays
(UNIMPLEMENTED as of this build). `to_host` works around it by moving
the real and imaginary parts as separate float32 transfers and
recombining on the host. Real arrays pass through np.asarray.
"""
from __future__ import annotations

import numpy as np

_COMPLEX_D2H_OK: bool | None = None


def _complex_d2h_supported() -> bool:
    """Probe once whether complex device->host transfer works."""
    global _COMPLEX_D2H_OK
    if _COMPLEX_D2H_OK is None:
        import jax

        if jax.default_backend() in ("cpu", "gpu"):
            _COMPLEX_D2H_OK = True
        else:
            # the axon PJRT plugin reports platform "tpu"; identify it by
            # platform_version and split complex transfers there. (A live
            # probe would poison the device channel on failure.)
            from jax.extend import backend as jex_backend
            version = getattr(jex_backend.get_backend(),
                              "platform_version", "")
            _COMPLEX_D2H_OK = "axon" not in version
    return _COMPLEX_D2H_OK


def to_host(x) -> np.ndarray:
    """np.asarray for device arrays, safe for complex dtypes on axon."""
    if isinstance(x, np.ndarray):
        return x
    dtype = getattr(x, "dtype", None)
    if dtype is not None and np.issubdtype(dtype, np.complexfloating) \
            and not _complex_d2h_supported():
        re = np.asarray(x.real)
        im = np.asarray(x.imag)
        out = np.empty(re.shape, np.result_type(re.dtype, np.complex64))
        out.real = re
        out.imag = im
        return out
    return np.asarray(x)
