"""Pallas TPU kernel: fused window + TDAC fold + DCT-IV MDCT (N3).

One kernel invocation per block of frames: selects the per-frame composed
window (branchless masked sum over the 5 block types), applies it, folds
2048 -> 1024, and hits the MXU with the 1024x1024 DCT-IV matrix — the
windowed spectrum never round-trips through HBM between stages.

Short-block analysis keeps the XLA path (8 x 128-point matmuls are tiny);
`analyze` composes both and selects per frame, mirroring ops/dsp.analyze.

HBM traffic per frame: 8 KB in + 4 KB out (+ amortized 4 MB basis), vs the
unfused path's extra intermediate reads/writes. Verified bit-comparable to
ops/dsp.analyze in tests/test_pallas.py (interpret mode on CPU, compiled on
TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ... import config as C
from ... import tables as T

try:                                     # TPU-only namespace
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:                      # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

BLOCK_F = 64        # frames per kernel instance


def _mdct_kernel(frames_ref, bt_ref, win_ref, basis_ref, out_ref):
    """frames [BF, 2048], bt [BF], win [5, 2048], basis [1024, 1024]."""
    fr = frames_ref[:]                                   # [BF, 2048]
    bt = bt_ref[:]                                       # [BF]
    # branchless per-frame window select: sum_t (bt == t) * win[t]
    w = jnp.zeros_like(fr)
    for t in range(C.N_BLOCK_TYPES):
        sel = (bt == t).astype(fr.dtype)[:, None]
        w = w + sel * win_ref[t, :][None, :]
    v = fr * w
    # TDAC fold (mirror of ops.dsp._fold), m = 1024, h = 512
    m = C.LONG_COEFFS
    h = m // 2
    a = -v[:, 3 * h - 1:2 * h - 1:-1] - v[:, 3 * h:]
    b = v[:, :h] - v[:, 2 * h - 1:h - 1:-1]
    u = jnp.concatenate([a, b], axis=-1)                 # [BF, 1024]
    out_ref[:] = jax.lax.dot_general(
        u, basis_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),      # u @ basis.T
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=None)
def _consts(window: str):
    return (np.asarray(T.long_windows(window), np.float32),
            np.asarray(T.dct_iv_matrix(C.LONG_COEFFS), np.float32))


def mdct_long(frames: jnp.ndarray, bt: jnp.ndarray, window: str = "sine",
              interpret: bool = False) -> jnp.ndarray:
    """Fused long-family MDCT: [F, 2048] + [F] -> [F, 1024].

    F must be a multiple of BLOCK_F (the encoder's chunking guarantees it).
    """
    nf = frames.shape[0]
    assert nf % BLOCK_F == 0, f"frame count {nf} not a multiple of {BLOCK_F}"
    win, basis = _consts(window)
    grid = (nf // BLOCK_F,)
    kw = {}
    if _HAS_PLTPU and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    return pl.pallas_call(
        _mdct_kernel,
        out_shape=jax.ShapeDtypeStruct((nf, C.LONG_COEFFS), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_F, C.LONG_SIZE), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F,), lambda i: (i,)),
            pl.BlockSpec((C.N_BLOCK_TYPES, C.LONG_SIZE), lambda i: (0, 0)),
            pl.BlockSpec((C.LONG_COEFFS, C.LONG_COEFFS), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
        interpret=interpret,
    )(frames.astype(jnp.float32), bt.astype(jnp.int32), win, basis)


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
