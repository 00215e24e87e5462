"""Pallas kernel correctness vs the XLA reference path (interpret mode on
CPU; the same kernels compile for real on TPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu.ops import dsp


def _frames(nf=64, seed=0):
    rng = np.random.default_rng(seed)
    fr = (0.3 * rng.standard_normal((nf, C.LONG_SIZE))).astype(np.float32)
    bt = rng.integers(0, 5, nf).astype(np.int32)
    return fr, bt


def test_xmath_fft_kernel_matches_spec():
    """The fused DIF-stage kernel (interpret mode) against the normative
    NumPy chain, both production layouts. In interpret mode the kernel
    body is ordinary traced jnp, which XLA:CPU may FMA-contract, so this
    asserts a tight tolerance; BITWISE equality of the real Mosaic
    lowering is asserted on hardware (scripts/tpu_kernel_probe.py) and
    is exact by construction (same op graph as xmath.fft_dif)."""
    from mrcaudiocodec_tpu import xmath
    from mrcaudiocodec_tpu.ops.pallas import xmath_kernel

    rng = np.random.default_rng(11)
    for shape, fft_size in [((130, 512), 512), ((130, 8, 64), 64)]:
        zr = rng.standard_normal(shape).astype(np.float32)
        zi = rng.standard_normal(shape).astype(np.float32)
        ar, ai = xmath.fft_dif(zr, zi, np)
        kr, ki = xmath_kernel.fft_natural(jnp.asarray(zr), jnp.asarray(zi),
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(kr), ar, atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ki), ai, atol=1e-4, rtol=1e-5)


def test_quant_kernel_matches_xla():
    from mrcaudiocodec_tpu.ops.pallas import quant_kernel
    from mrcaudiocodec_tpu.ops import rd
    from mrcaudiocodec_tpu import tables as T
    fr, bt = _frames(nf=32, seed=1)
    coeffs = dsp.analyze(jnp.asarray(fr), jnp.asarray(bt))
    amp = jnp.zeros((32, T.unified_layout(44100)["nb"]), jnp.int32)
    gains = jnp.broadcast_to(jnp.asarray(rd.COARSE)[None, :], (32, 32))
    bits_ref = rd._bits_for_gains(coeffs, amp, gains, jnp.asarray(bt),
                                  44100)
    bits_ker = quant_kernel.bits_for_gains(coeffs, amp, gains,
                                           jnp.asarray(bt), 44100,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(bits_ker), np.asarray(bits_ref))


def test_quant_kernel_matches_xla_nonzero_amp():
    """Outer-iteration shape: amplified scale factors + refine-window
    gains. Exercises amp_to_bins interplay and the sf-delta term."""
    from mrcaudiocodec_tpu.ops.pallas import quant_kernel
    from mrcaudiocodec_tpu.ops import rd
    from mrcaudiocodec_tpu import tables as T
    fr, bt = _frames(nf=32, seed=3)
    rng = np.random.default_rng(7)
    coeffs = dsp.analyze(jnp.asarray(fr), jnp.asarray(bt))
    nb = T.unified_layout(44100)["nb"]
    amp = jnp.asarray(rng.integers(0, 12, (32, nb)).astype(np.int32))
    gains = jnp.clip(jnp.asarray(
        rng.integers(30, 70, (32, 4)).astype(np.int32)), C.GAIN_MIN,
        C.GAIN_MAX)
    bits_ref = rd._bits_for_gains(coeffs, amp, gains, jnp.asarray(bt),
                                  44100)
    bits_ker = quant_kernel.bits_for_gains(coeffs, amp, gains,
                                           jnp.asarray(bt), 44100,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(bits_ker), np.asarray(bits_ref))
