"""Shape-invariant decision stages (ops/blocking.py).

Float reduction kernels are chosen by batch shape, so without fixed-block
execution the SAME frame drifted by 1-2 ulp between a per-clip chunk and
a corpus mega-batch and a quantizer floor flipped (one q-bin per ~500
frames). These tests pin the invariant directly: every decision stage
must produce bit-identical per-frame outputs no matter what batch its
frame arrives in.
"""
import numpy as np

import jax.numpy as jnp

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu import tables as T
from mrcaudiocodec_tpu.ops import dsp, psycho, rd


def _frames(nf, seed=0):
    rng = np.random.default_rng(seed)
    fr = (0.3 * rng.standard_normal((nf, C.LONG_SIZE))).astype(np.float32)
    bt = rng.integers(0, 5, nf).astype(np.int32)
    return fr, bt


def test_analyze_batch_shape_invariant():
    fr, bt = _frames(200, seed=2)
    big = np.asarray(dsp.analyze(jnp.asarray(fr), jnp.asarray(bt)))
    small = np.asarray(dsp.analyze(jnp.asarray(fr[:48]), jnp.asarray(bt[:48])))
    np.testing.assert_array_equal(big[:48], small)


def test_psycho_batch_shape_invariant():
    fr, bt = _frames(200, seed=3)
    co = dsp.analyze(jnp.asarray(fr), jnp.asarray(bt))
    a_big, pe_big, e_big = psycho.analyze(jnp.asarray(fr), co,
                                          jnp.asarray(bt), 44100, True)
    a_s, pe_s, e_s = psycho.analyze(jnp.asarray(fr[:48]), co[:48],
                                    jnp.asarray(bt[:48]), 44100, True)
    np.testing.assert_array_equal(np.asarray(a_big)[:48], np.asarray(a_s))
    np.testing.assert_array_equal(np.asarray(pe_big)[:48], np.asarray(pe_s))


def test_rd_batch_shape_invariant():
    fs = 44100
    fr, bt = _frames(160, seed=4)
    btj = jnp.asarray(bt)
    co = dsp.analyze(jnp.asarray(fr), btj)
    allowed, _, _ = psycho.analyze(jnp.asarray(fr), co, btj, fs, True)
    budgets = jnp.full((160,), 1486, jnp.int32)
    big = rd.rd_batch(co, allowed, budgets, btj, fs)
    small = rd.rd_batch(co[:48], allowed[:48], budgets[:48], btj[:48], fs)
    for a, b in zip(big, small):
        np.testing.assert_array_equal(np.asarray(a)[:48], np.asarray(b))


def test_detect_transients_shape_invariant():
    fr, _ = _frames(200, seed=5)
    # a quiet frame with a hard attack in its tail must fire
    rng = np.random.default_rng(9)
    fr[10] *= 0.003
    fr[10, 1500:1600] = (0.8 * rng.standard_normal(100)).astype(np.float32)
    big = np.asarray(dsp.detect_transients(jnp.asarray(fr)))
    small = np.asarray(dsp.detect_transients(jnp.asarray(fr[:48])))
    np.testing.assert_array_equal(big[:48], small)
    assert big[10]
