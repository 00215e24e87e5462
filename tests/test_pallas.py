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


def test_mdct_kernel_matches_xla():
    from mrcaudiocodec_tpu.ops.pallas import mdct_kernel
    fr, bt = _frames()
    ref = np.asarray(dsp.analyze(jnp.asarray(fr), jnp.asarray(bt)))
    out = np.asarray(mdct_kernel.analyze(jnp.asarray(fr), jnp.asarray(bt),
                                         interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


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
