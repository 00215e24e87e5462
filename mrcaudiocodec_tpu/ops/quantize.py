"""JAX nonlinear quantizer (mirror of spec/quantize.py, R8).

Normative rev 4: the quantizer is a fixed sequence of multiplies, adds,
compares and integer bit ops ONLY — hardware f32 divide/sqrt are not
correctly rounded on TPU (scripts/tpu_div_probe.py), so the sequence uses
a once-rounded reciprocal step factor and the pinned Newton sqrt / log2 /
exp2 kernels from xpsy. Backend dispatch as everywhere: jnp on TPU
(plain single-rounded ops, scripts/tpu_fma_probe.py), native FFI on
XLA:CPU (modes 4/5 in native/xpsy_ffi.cpp — LLVM would FMA-contract the
Horner chains), normative-NumPy callback elsewhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import xpsy

F32 = jnp.float32

# exact f32 roundings of 2^(r/4); inverse fractions rounded from float64
_FRACS = (1.0, 2.0 ** 0.25, 2.0 ** 0.5, 2.0 ** 0.75)
_INV_FRACS = (1.0, 2.0 ** -0.25, 2.0 ** -0.5, 2.0 ** -0.75)
C43 = F32(4.0 / 3.0)


def _frac_sel(r, vals):
    return jnp.where(r == 0, F32(vals[0]),
                     jnp.where(r == 1, F32(vals[1]),
                               jnp.where(r == 2, F32(vals[2]),
                                         F32(vals[3]))))


def band_steps(e):
    """Exponent -> step size: frac[(e-B) & 3] * 2^((e-B) >> 2), both
    factors exact in f32, one exact multiply. The 2^k factor is built by
    bit pattern (k in [-32, 31] here, well inside normal range), which is
    exact on every backend — jnp.exp2 is a transcendental whose rounding
    at integers is not guaranteed."""
    d = e.astype(jnp.int32) - jnp.int32(C.GAIN_BIAS)
    frac = _frac_sel(d & 3, _FRACS)
    two_k = jax.lax.bitcast_convert_type(
        ((d >> 2) + 127) << 23, jnp.float32)
    return frac * two_k


def inv_band_steps(e):
    """Exponent -> 1/step = inv_frac[(e-B) & 3] * 2^(-((e-B) >> 2)); the
    power-of-two multiply is exact, so inv_step carries exactly one
    rounding — the same value spec.quantize.inv_band_steps produces."""
    d = e.astype(jnp.int32) - jnp.int32(C.GAIN_BIAS)
    inv_frac = _frac_sel(d & 3, _INV_FRACS)
    two_nk = jax.lax.bitcast_convert_type(
        (127 - (d >> 2)) << 23, jnp.float32)
    return inv_frac * two_nk


def _quantize_seq(x, e_bin, xp):
    """The shared normative sequence (works for xp in {np-like via jnp})."""
    a = xp.abs(x) * inv_band_steps(e_bin)
    p = xpsy.xsqrt(a * xpsy.xsqrt(a, xp), xp)
    mag = xp.floor(p + F32(C.QUANT_MAGIC))
    mag = xp.minimum(mag, F32(C.QMAX)).astype(jnp.int32)
    return xp.where(x < 0, -mag, mag)


def _dequantize_seq(q, e_bin, xp):
    mag = xp.abs(q).astype(F32)
    p43 = xpsy.xexp2(C43 * xpsy.xlog2(xp.maximum(mag, F32(1.0)), xp), xp)
    p43 = xp.where(mag == 0, F32(0.0), p43)
    val = p43 * band_steps(e_bin)
    return xp.where(q < 0, -val, val).astype(F32)


def _ffi_elementwise(mode: int, x, e_bin):
    call = jax.ffi.ffi_call(
        "mrc_xpsy",
        (jax.ShapeDtypeStruct(x.shape, jnp.float32),
         jax.ShapeDtypeStruct((1,), jnp.float32),
         jax.ShapeDtypeStruct((1,), jnp.float32)),
        vmap_method="broadcast_all")
    out, _, _ = call(x.astype(F32), jnp.zeros((1,), jnp.float32),
                     e_bin.astype(jnp.int32), mode=mode, full_psycho=0)
    return out


def quantize(x, e_bin):
    """x [...,1024] float32, e_bin [...,1024] int -> int32 quantized
    (inputs broadcast against each other, as jnp arithmetic would)."""
    x = x.astype(F32)
    if jax.default_backend() == "tpu":
        return _quantize_seq(x, e_bin, jnp)
    shape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(e_bin))
    x = jnp.broadcast_to(x, shape)
    e_bin = jnp.broadcast_to(e_bin, shape)
    from .. import native
    if jax.default_backend() == "cpu" and native.xpsy_ffi_registered():
        return _ffi_elementwise(4, x, e_bin).astype(jnp.int32)

    def host(xv, ev):
        from ..spec import quantize as sq
        return sq.quantize(np.asarray(xv), np.asarray(ev)).astype(np.int32)

    return jax.pure_callback(
        host, jax.ShapeDtypeStruct(x.shape, jnp.int32), x, e_bin,
        vmap_method="broadcast_all")


def dequantize(q, e_bin):
    if jax.default_backend() == "tpu":
        return _dequantize_seq(q, e_bin, jnp)
    shape = jnp.broadcast_shapes(jnp.shape(q), jnp.shape(e_bin))
    q = jnp.broadcast_to(q, shape)
    e_bin = jnp.broadcast_to(e_bin, shape)
    from .. import native
    if jax.default_backend() == "cpu" and native.xpsy_ffi_registered():
        return _ffi_elementwise(5, q.astype(F32), e_bin)

    def host(qv, ev):
        from ..spec import quantize as sq
        return sq.dequantize(np.asarray(qv, np.int32),
                             np.asarray(ev)).astype(np.float32)

    return jax.pure_callback(
        host, jax.ShapeDtypeStruct(q.shape, jnp.float32), q, e_bin,
        vmap_method="broadcast_all")
