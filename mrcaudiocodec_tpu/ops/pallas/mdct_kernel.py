"""Pallas TPU kernel: fused window + MDCT (N3).

The TDAC fold is linear, so it is pre-composed into the DCT-IV basis:
X = C4 . fold(w * frame) = (w * frame) @ B with B = (C4 F)^T in [2048,
1024]. The kernel then only does a branchless per-frame window select (5
masked adds) and one MXU matmul per frame block — no reversals, no
gathers, nothing Mosaic can't lower; the windowed signal never
round-trips through HBM.

Verified identical to ops/dsp.analyze in tests/test_pallas.py (interpret
mode on CPU; compiled on TPU by bench/pallas smoke runs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

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
    """Drop-in replacement for ops.dsp.analyze with the fused long kernel."""
    from .. import dsp
    cst = dsp._consts(window)
    xl = mdct_long(frames, bt, window, interpret=interpret)
    fr = frames.astype(jnp.float32)
    subs = dsp._short_subblocks(fr) * jnp.asarray(
        cst["short_window"])[None, None, :]
    xs = (dsp._fold(subs) @ jnp.asarray(cst["dct4_short"]).T
          ).reshape(fr.shape[0], -1)
    return jnp.where((bt == C.SHORT)[:, None], xs, xl)
