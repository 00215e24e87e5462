"""JAX batched rate-distortion loop (mirror of spec/rd.py, R9/R10).

Fully vectorized over frames: the classic per-frame bisection becomes a
parallel two-stage gain sweep ([F, 32] coarse + [F, 8] fine exact bit
costs), and the outer distortion loop is OUTER_MAX unrolled iterations with
per-band convergence masks — no data-dependent control flow anywhere
(SURVEY.md §2b N5).

Every indexed access (table lookups, band expansion, candidate selection)
is expressed as masked sums or bf16 mask matmuls: integer-exact and
MXU/VPU-native. TPU gathers are avoided entirely — the gather-based
formulation measured ~500x slower on v5e.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T
from . import entropy, quantize

F32 = jnp.float32
I32 = jnp.int32

COARSE = np.arange(C.GAIN_MIN, C.GAIN_MAX + 1, C.GAIN_COARSE_STEP,
                   dtype=np.int32)


def _e_bin_for(gains, amp, bin_mask):
    """gains [F, G], amp [F, NB], bin_mask [F, 1024, NB] bf16 ->
    e_bin [F, G, 1024] int32 (exact: one mask term per bin)."""
    e_band = jnp.clip(gains[..., None] - amp[:, None, :],
                      C.GAIN_MIN, C.GAIN_MAX)                 # [F, G, NB]
    e_bin = jnp.einsum("fgn,fin->fgi", e_band.astype(jnp.bfloat16), bin_mask,
                       precision=jax.lax.Precision.DEFAULT,
                       preferred_element_type=jnp.float32)
    return e_bin.astype(I32)


def _bits_for_gains(x, amp, gains, bt, fs, masks=None, bin_mask=None):
    """-> bits [F, G] int32 (exact frame content cost per gain candidate).

    The candidate q tensors are consumed only by the cost lookups, so XLA
    fuses the quantizer power law into them and no [F, G, 1024] q is ever
    materialized in HBM.
    """
    lay = T.unified_layout(fs)
    if bin_mask is None:
        bin_mask = entropy._select_by_bt(lay["band_mask"],
                                         bt).astype(jnp.bfloat16)
    e_bin = _e_bin_for(gains, amp, bin_mask)
    q = quantize.quantize(x[:, None, :], e_bin)
    g = gains.shape[-1]
    amp_b = jnp.broadcast_to(amp[:, None, :],
                             (amp.shape[0], g, amp.shape[1]))
    return entropy.frame_content_bits(q, amp_b, bt, fs, masks=masks)


def _q_for_gain(x, amp, gain, bin_mask):
    """Re-quantize at the single selected gain ([F] -> q [F, 1024]).

    Decision-neutral: quantize is deterministic, so recomputing q for the
    chosen candidate is identical to having kept that candidate's q — at
    1/G of the HBM traffic of materializing every candidate.
    """
    e_bin = _e_bin_for(gain[:, None], amp, bin_mask)[:, 0]
    return quantize.quantize(x, e_bin)


def _pick_first_fit(cand, bits_c, budget_content):
    """Lowest-index fitting candidate (last candidate as fallback)."""
    fits = bits_c <= budget_content[:, None]
    idx = jnp.where(fits.any(axis=1), jnp.argmax(fits, axis=1),
                    cand.shape[1] - 1)
    onehot = jnp.arange(cand.shape[1])[None, :] == idx[:, None]
    gain = jnp.sum(jnp.where(onehot, cand, 0), axis=1).astype(I32)
    bits = jnp.sum(jnp.where(onehot, bits_c, 0), axis=1)
    return gain, bits


def inner_gain_search(x, amp, budget_content, bt, fs, masks=None,
                      bin_mask=None):
    """Batched two-stage sweep -> (gain [F], q [F,1024], bits [F])."""
    nf = x.shape[0]
    coarse = jnp.broadcast_to(jnp.asarray(COARSE)[None, :], (nf, len(COARSE)))
    bits_c = _bits_for_gains(x, amp, coarse, bt, fs, masks, bin_mask)
    fits = bits_c <= budget_content[:, None]
    has = fits.any(axis=1)
    g0 = jnp.where(has,
                   jnp.argmax(fits, axis=1).astype(I32) * C.GAIN_COARSE_STEP
                   + C.GAIN_MIN,
                   C.GAIN_MAX).astype(I32)
    fine = jnp.clip(g0[:, None] + jnp.arange(-C.GAIN_COARSE_STEP + 1, 1,
                                             dtype=I32)[None, :],
                    C.GAIN_MIN, C.GAIN_MAX)                   # [F, 8] asc
    bits_f = _bits_for_gains(x, amp, fine, bt, fs, masks, bin_mask)
    gain, bits = _pick_first_fit(fine, bits_f, budget_content)
    q = _q_for_gain(x, amp, gain, bin_mask)
    return gain, q, bits


def refine_gain_search(x, amp, budget_content, prev_gain, bt, fs,
                       masks=None, bin_mask=None):
    """Windowed re-search for outer iterations 2+ (mirror of
    spec.rd.refine_gain_search): candidates [prev, prev+REFINE_WINDOW]
    clipped, with GAIN_MAX as guaranteed-fit fallback."""
    from ..spec.rd import REFINE_WINDOW
    offs = np.concatenate([np.arange(REFINE_WINDOW + 1, dtype=np.int32),
                           [0]])
    cand = jnp.minimum(prev_gain[:, None] + jnp.asarray(offs)[None, :],
                       C.GAIN_MAX)
    cand = cand.at[:, -1].set(C.GAIN_MAX)
    bits_c = _bits_for_gains(x, amp, cand, bt, fs, masks, bin_mask)
    gain, bits = _pick_first_fit(cand, bits_c, budget_content)
    q = _q_for_gain(x, amp, gain, bin_mask)
    return gain, q, bits


def rd_batch(coeffs, allowed, budgets, bt, fs):
    """Batched RD search.

    coeffs [F, 1024] f32, allowed [F, NB] f32, budgets [F] int32, bt [F].
    Returns (q [F,1024] i32, amp [F,NB] i32, gain [F] i32, bits [F] i32).

    Iteration 1 runs the full two-stage sweep; iterations 2+ run the
    narrow windowed re-search inside a `lax.while_loop` that exits as soon
    as every frame's noise is under its mask (converged frames' states are
    fixed points of the body, so the early exit is decision-identical to
    the fixed-bound loop and to the spec codec).
    """
    lay = T.unified_layout(fs)
    tb = entropy._dev_tables(fs)
    width = entropy._select_by_bt(tb["width"], bt)            # [F, NB]
    bin_mask = entropy._select_by_bt(lay["band_mask"],
                                     bt).astype(jnp.bfloat16)
    mask2 = entropy._select_by_bt(lay["mask2"], bt).astype(jnp.bfloat16)
    mask4 = entropy._select_by_bt(lay["mask4"], bt).astype(jnp.bfloat16)
    masks = (mask2, mask4)
    budget_content = (budgets - C.FRAME_LEN_BITS - 7).astype(I32)
    nf, nb = coeffs.shape[0], lay["nb"]
    x = coeffs.astype(F32)

    def over_mask(gain, q, amp):
        e_bin = _e_bin_for(gain[:, None], amp, bin_mask)[:, 0]
        xhat = quantize.dequantize(q, e_bin)
        err = (x - xhat) ** 2
        noise = jnp.einsum("fi,fin->fn", err, bin_mask.astype(F32),
                           precision=jax.lax.Precision.HIGHEST)
        return (noise > allowed) & (width > 0) & (amp < C.AMP_MAX)

    amp = jnp.zeros((nf, nb), I32)
    gain, q, bits = inner_gain_search(x, amp, budget_content, bt, fs,
                                      masks, bin_mask)
    over = over_mask(gain, q, amp)

    def cond(state):
        it, amp, gain, q, bits, over = state
        return (it < C.OUTER_MAX) & over.any()

    def body(state):
        it, amp, gain, q, bits, over = state
        amp = jnp.minimum(amp + C.AMP_STEP * over.astype(I32), C.AMP_MAX)
        gain, q, bits = refine_gain_search(x, amp, budget_content, gain,
                                           bt, fs, masks, bin_mask)
        over = over_mask(gain, q, amp)
        return it + 1, amp, gain, q, bits, over

    _, amp, gain, q, bits, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), amp, gain, q, bits, over))
    return q, amp, gain, bits
