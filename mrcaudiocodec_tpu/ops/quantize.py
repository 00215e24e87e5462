"""JAX nonlinear quantizer (mirror of spec/quantize.py, R8).

Uses the spec's NORMATIVE evaluation order (exact dyadic step, |x|/step,
sqrt(a*sqrt(a))) so q is bit-identical to the NumPy spec on any IEEE f32
backend regardless of XLA fusion choices — `pow`/`exp2` formulations
drifted by 1 ulp between graph shapes and flipped floor boundaries
(see spec/quantize.py docstring).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config as C

F32 = jnp.float32

# exact f32 roundings of 2^(r/4), r = 0..3 (same values as the spec table)
_FRACS = (1.0, 2.0 ** 0.25, 2.0 ** 0.5, 2.0 ** 0.75)


def band_steps(e):
    """Exponent -> step size: frac[(e-B) & 3] * 2^((e-B) >> 2), both
    factors exact in f32, one exact multiply. The 2^k factor is built by
    bit pattern (k in [-32, 31] here, well inside normal range), which is
    exact on every backend — jnp.exp2 is a transcendental whose rounding
    at integers is not guaranteed."""
    d = e.astype(jnp.int32) - jnp.int32(C.GAIN_BIAS)
    r = d & 3
    frac = jnp.where(r == 0, F32(_FRACS[0]),
                     jnp.where(r == 1, F32(_FRACS[1]),
                               jnp.where(r == 2, F32(_FRACS[2]),
                                         F32(_FRACS[3]))))
    two_k = jax.lax.bitcast_convert_type(
        ((d >> 2) + 127) << 23, jnp.float32)
    return frac * two_k


def quantize(x, e_bin):
    """x [...,1024] float32, e_bin [...,1024] int -> int32 quantized.

    The optimization barriers pin the normative op order: without them
    XLA's algebraic simplifier rewrites the sqrt chain (to a pow form
    whose rounding depends on the surrounding graph) and a 2-ulp drift
    flips floor boundaries between otherwise-identical pipelines."""
    x = x.astype(F32)
    a = jnp.abs(x) / band_steps(e_bin)
    a = jax.lax.optimization_barrier(a)
    t = a * jnp.sqrt(a)
    t = jax.lax.optimization_barrier(t)
    p = jnp.sqrt(t)                             # a^0.75, fixed op order
    mag = jnp.floor(p + F32(C.QUANT_MAGIC))
    mag = jnp.minimum(mag, F32(C.QMAX)).astype(jnp.int32)
    return jnp.where(x < 0, -mag, mag)


def dequantize(q, e_bin):
    mag = jnp.abs(q).astype(F32)
    val = jnp.power(mag, F32(4.0 / 3.0)) * band_steps(e_bin)
    return jnp.where(q < 0, -val, val).astype(F32)
