"""Host<->device transfer helpers for complex data.

The axon TPU backend (experimental) runs complex64 COMPUTE fine, but
any complex-typed buffer crossing the host<->device boundary is
UNIMPLEMENTED — and worse, a complex host->device transfer poisons the
process's device channel so every later dispatch fails (measured on
this build; see docs/PROGRESS notes r2). Device-resident complex
buffers pass between executables without issue.

Safe pattern (the "planar boundary"):
  * to_device(x): move real/imag as two float32 transfers, then fuse
    with a tiny jitted lax.complex — the complex array is born on
    device and never crosses the boundary.
  * to_host(x): jitted (real, imag) split, two float32 transfers,
    recombine on host.
Real arrays pass straight through.
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


def _split_jit():
    import jax
    import jax.numpy as jnp
    global _SPLIT
    if _SPLIT is None:
        _SPLIT = jax.jit(lambda v: (jnp.real(v), jnp.imag(v)))
    return _SPLIT


def _fuse_jit():
    import jax
    global _FUSE
    if _FUSE is None:
        _FUSE = jax.jit(jax.lax.complex)
    return _FUSE


_SPLIT = None
_FUSE = None


def to_host(x) -> np.ndarray:
    """np.asarray for device arrays, safe for complex dtypes on axon."""
    if isinstance(x, np.ndarray):
        return x
    dtype = getattr(x, "dtype", None)
    if dtype is not None and np.issubdtype(dtype, np.complexfloating) \
            and not _complex_d2h_supported():
        re_d, im_d = _split_jit()(x)
        re = np.asarray(re_d)
        im = np.asarray(im_d)
        out = np.empty(re.shape, np.result_type(re.dtype, np.complex64))
        out.real = re
        out.imag = im
        return out
    return np.asarray(x)


def to_device(x):
    """jnp.asarray that never sends a complex buffer over the boundary.

    On axon a complex host->device transfer poisons the device channel
    for the whole process; this moves float32 planes and fuses them on
    device. Returns a device array (complex64 for complex inputs).
    """
    import jax
    import jax.numpy as jnp

    if isinstance(x, jax.Array):
        # already device-resident: np.asarray here would round-trip it
        # through the host (and poison the axon channel for complex)
        return x
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.complexfloating) \
            and not _complex_d2h_supported():
        re = jnp.asarray(np.ascontiguousarray(x.real).astype(np.float32))
        im = jnp.asarray(np.ascontiguousarray(x.imag).astype(np.float32))
        return _fuse_jit()(re, im)
    return jnp.asarray(x)
