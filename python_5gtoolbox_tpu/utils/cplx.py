"""Eager-safe complex constructors for the axon TPU backend.

A Python complex scalar (e.g. `1j`) used in an EAGER jnp expression is
materialized via a complex host->device transfer, which the axon
backend does not implement — and which poisons the process's device
channel (see utils/host.py). Inside jit the same literal is embedded
in the program and is fine. These helpers build complex values from
real parts on-device so eager call sites stay safe on every backend.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_complex(re, im):
    """complex64 from real/imag parts (eager-safe, any backend)."""
    re = jnp.asarray(re, jnp.float32)
    im = jnp.asarray(im, jnp.float32)
    return jax.lax.complex(re, jnp.broadcast_to(im, re.shape))


def cexp(theta):
    """exp(1j * theta) for real theta (eager-safe)."""
    theta = jnp.asarray(theta, jnp.float32)
    return jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
