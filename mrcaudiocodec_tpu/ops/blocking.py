"""Shape-invariant execution of per-frame decision stages.

Float reductions (MDCT matmuls, psycho thresholds, RD noise sums) are
computed by different GEMM/reduction kernels depending on the batch
shape — XLA picks its tiling by matrix size — so the SAME frame encoded
in a per-clip chunk vs a fused mega-batch drifted by 1-2 ulp and floor
boundaries in the quantizer flipped (tests/test_corpus_parallel caught a
q-bin flip between a [32,2048] and a [456,2048] MDCT matmul).

`map_frame_blocks` pins every decision-relevant float stage to ONE block
shape: the frame axis is zero-padded to a multiple of DECISION_BLOCK and
the stage runs under `lax.map` over [block, ...] slabs. Every pipeline —
per-clip, corpus mega-batch, any device mesh — then contains the
identical per-block computation, so per-frame outputs are bit-identical
across batch shapes on a given backend. Padding frames are all-zero
(silent): transients False, psycho thresholds floor at ATH, RD converges
immediately, and the rows are dropped on exit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DECISION_BLOCK = 128


def map_frame_blocks(fn, arrays, block: int = DECISION_BLOCK):
    """Run fn(*arrays) in fixed [block, ...] slabs along axis 0.

    arrays share a leading frame axis; fn must be frame-wise (row f of
    every output depends only on row f of the inputs). Returns fn's
    outputs with the original frame count restored.
    """
    f = arrays[0].shape[0]
    # NB: even f == block goes through lax.map — the body of a mapped
    # computation and inline code can be tiled differently; one path for
    # every shape is the whole point. And the map must never have trip
    # count 1: XLA's while-loop simplifier inlines single-trip loops and
    # the inlined body tiles differently (measured 1-ulp MDCT drift
    # between nb=1 and nb=2) — so pad to at least two blocks.
    pad = (-f) % block
    nb = (f + pad) // block
    if nb < 2:
        pad += (2 - nb) * block
        nb = 2

    def prep(a):
        if pad:
            a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        return a.reshape((nb, block) + a.shape[1:])

    outs = jax.lax.map(lambda t: fn(*t), tuple(prep(a) for a in arrays))
    return jax.tree.map(
        lambda o: o.reshape((nb * block,) + o.shape[2:])[:f], outs)
