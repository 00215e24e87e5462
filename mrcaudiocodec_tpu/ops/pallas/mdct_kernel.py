"""Pallas TPU kernel: fused window + MDCT analysis (N3).

The TDAC fold is linear, so it is pre-composed into the DCT-IV basis:
X = C4 . fold(w * frame) = (w * frame) @ B with B = fold^T C4^T. The
fused `analyze` kernel computes BOTH filterbank paths for a frame block
in one VMEM residency — branchless per-frame window select + one long
[2048,1024] MXU matmul, plus the eight short sub-block [256,128] matmuls
(window pre-folded into the short basis) — and selects per frame by block
type. The frame tensor is read from HBM exactly once and no [F,1024]
intermediate round-trips (the XLA path writes xl and xs to HBM before the
select).

Mosaic notes (measured on the axon v5e, scripts/tpu_mdct_probe.py):
BLOCK_F up to 128 compiles, 256 crashes; the short sub-blocks start at
SHORT_OFFSET=448 which is NOT lane-aligned, so the kernel pre-rolls the
frame by 2048-448 lanes and slices at multiples of 128.

Verified identical to ops/dsp.analyze in tests/test_pallas.py (interpret
mode on CPU; compiled + timed on TPU by scripts/tpu_mdct_probe.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config as C
from ... import tables as T

BLOCK_F = 64        # frames per kernel instance


@functools.lru_cache(maxsize=None)
def folded_basis() -> np.ndarray:
    """[LONG_SIZE, LONG_COEFFS] float32: (C4 . fold) transposed.

    fold matrix F [1024, 2048] from the TDAC fold (spec/dsp._fold); the
    composite maps a windowed 2048-frame directly to 1024 coefficients.
    """
    from ...spec.dsp import _fold
    m = C.LONG_COEFFS
    fmat = _fold(np.eye(C.LONG_SIZE)).T          # [1024, 2048]
    c4 = T.dct_iv_matrix(m)
    return np.ascontiguousarray((c4 @ fmat).T.astype(np.float32))


@functools.lru_cache(maxsize=None)
def folded_short_basis(window: str) -> np.ndarray:
    """[SHORT_SIZE, SHORT_COEFFS] f32: diag(w_short) . fold^T . C4^T.

    The short window is block-type-independent, so it folds into the
    basis; a raw sub-block matmul gives the windowed short MDCT."""
    from ...spec.dsp import _fold
    a = _fold(np.eye(C.SHORT_SIZE))              # [256, 128]
    c4 = T.dct_iv_matrix(C.SHORT_COEFFS)
    w = np.asarray(T.short_window(window), np.float64)
    return np.ascontiguousarray(
        (w[:, None] * (a @ c4.T)).astype(np.float32))


def _mdct_kernel(frames_ref, bt_ref, win_ref, basis_ref, out_ref):
    """frames [BF, 2048], bt [BF, 1], win [5, 2048], basis [2048, 1024]."""
    fr = frames_ref[:]
    bt = bt_ref[:, 0]
    # branchless per-frame window select: sum_t (bt == t) * win[t]
    w = jnp.zeros_like(fr)
    for t in range(C.N_BLOCK_TYPES):
        sel = (bt == t).astype(fr.dtype)[:, None]
        w = w + sel * win_ref[t, :][None, :]
    out_ref[:] = jax.lax.dot_general(
        fr * w, basis_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _analyze_kernel(frames_ref, bt_ref, win_ref, basis_ref, sbasis_ref,
                    out_ref):
    """Fused long+short analysis with per-frame block-type select.

    frames [BF, 2048], bt [BF, 1], win [5, 2048] (long-family windows),
    basis [2048, 1024] (long), sbasis [256, 128] (short, window folded);
    out [BF, 1024]."""
    fr = frames_ref[:]
    bt = bt_ref[:, 0]
    w = jnp.zeros_like(fr)
    for t in range(C.N_BLOCK_TYPES):
        sel = (bt == t).astype(fr.dtype)[:, None]
        w = w + sel * win_ref[t, :][None, :]
    xl = jax.lax.dot_general(
        fr * w, basis_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    # short path: roll so sub-block g starts at lane g*128 (SHORT_OFFSET
    # = 448 is not lane-aligned; rolled lanes >= 1152 are unused wrap)
    rolled = pltpu.roll(fr, shift=C.LONG_SIZE - C.SHORT_OFFSET, axis=1)
    sb = sbasis_ref[:]
    is_short = (bt == C.SHORT).astype(jnp.float32)[:, None]
    for g in range(C.N_SHORT):
        sub = rolled[:, g * C.SHORT_COEFFS:
                     g * C.SHORT_COEFFS + C.SHORT_SIZE]
        xs_g = jax.lax.dot_general(
            sub, sb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        lo = g * C.SHORT_COEFFS
        out_ref[:, lo:lo + C.SHORT_COEFFS] = (
            is_short * xs_g + (1.0 - is_short) * xl[:, lo:lo + C.SHORT_COEFFS])


@functools.lru_cache(maxsize=None)
def _consts(window: str):
    return (np.asarray(T.long_windows(window), np.float32), folded_basis())


def mdct_long(frames: jnp.ndarray, bt: jnp.ndarray, window: str = "sine",
              interpret: bool = False) -> jnp.ndarray:
    """Fused long-family MDCT: [F, 2048] + [F] -> [F, 1024].

    F must be a multiple of BLOCK_F (the encoder's chunking guarantees it).
    """
    nf = frames.shape[0]
    assert nf % BLOCK_F == 0, f"frame count {nf} not a multiple of {BLOCK_F}"
    win, basis = _consts(window)
    return pl.pallas_call(
        _mdct_kernel,
        out_shape=jax.ShapeDtypeStruct((nf, C.LONG_COEFFS), jnp.float32),
        grid=(nf // BLOCK_F,),
        in_specs=[
            pl.BlockSpec((BLOCK_F, C.LONG_SIZE), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, 1), lambda i: (i, 0)),
            pl.BlockSpec((C.N_BLOCK_TYPES, C.LONG_SIZE), lambda i: (0, 0)),
            pl.BlockSpec((C.LONG_SIZE, C.LONG_COEFFS), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
        interpret=interpret,
    )(frames.astype(jnp.float32), bt.astype(jnp.int32).reshape(nf, 1),
      win, basis)


def analyze(frames: jnp.ndarray, bt: jnp.ndarray, window: str = "sine",
            interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.dsp.analyze: ONE fused kernel computes
    window select + long MDCT + 8 short sub-MDCTs + block-type select."""
    nf = frames.shape[0]
    assert nf % BLOCK_F == 0, f"frame count {nf} not a multiple of {BLOCK_F}"
    win, basis = _consts(window)
    sbasis = folded_short_basis(window)
    return pl.pallas_call(
        _analyze_kernel,
        out_shape=jax.ShapeDtypeStruct((nf, C.LONG_COEFFS), jnp.float32),
        grid=(nf // BLOCK_F,),
        in_specs=[
            pl.BlockSpec((BLOCK_F, C.LONG_SIZE), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, 1), lambda i: (i, 0)),
            pl.BlockSpec((C.N_BLOCK_TYPES, C.LONG_SIZE), lambda i: (0, 0)),
            pl.BlockSpec((C.LONG_SIZE, C.LONG_COEFFS), lambda i: (0, 0)),
            pl.BlockSpec((C.SHORT_SIZE, C.SHORT_COEFFS), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
        interpret=interpret,
    )(frames.astype(jnp.float32), bt.astype(jnp.int32).reshape(nf, 1),
      win, basis, sbasis)
