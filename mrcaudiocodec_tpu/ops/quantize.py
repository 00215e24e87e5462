"""JAX nonlinear quantizer (mirror of spec/quantize.py, R8)."""
from __future__ import annotations

import jax.numpy as jnp

from .. import config as C

F32 = jnp.float32


def band_steps(e):
    return jnp.power(F32(2.0), (e.astype(F32) - F32(C.GAIN_BIAS)) / F32(4.0))


def quantize(x, e_bin):
    """x [...,1024] float32, e_bin [...,1024] int -> int32 quantized."""
    x = x.astype(F32)
    a = jnp.abs(x) / band_steps(e_bin)
    mag = jnp.floor(jnp.power(a, F32(0.75)) + F32(C.QUANT_MAGIC))
    mag = jnp.minimum(mag, F32(C.QMAX)).astype(jnp.int32)
    return jnp.where(x < 0, -mag, mag)


def dequantize(q, e_bin):
    mag = jnp.abs(q).astype(F32)
    val = jnp.power(mag, F32(4.0 / 3.0)) * band_steps(e_bin)
    return jnp.where(q < 0, -val, val).astype(F32)
