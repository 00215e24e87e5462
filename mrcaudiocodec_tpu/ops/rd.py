"""JAX batched rate-distortion loop (mirror of spec/rd.py, R9/R10).

Fully vectorized over frames: the classic per-frame bisection becomes a
parallel two-stage gain sweep ([F, 32] coarse + [F, 8] fine exact bit
costs), and the outer distortion loop is OUTER_MAX unrolled iterations with
per-band convergence masks — no data-dependent control flow anywhere
(SURVEY.md §2b N5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from . import entropy, psycho, quantize

F32 = jnp.float32
I32 = jnp.int32

COARSE = np.arange(C.GAIN_MIN, C.GAIN_MAX + 1, C.GAIN_COARSE_STEP,
                   dtype=np.int32)


def _e_bin_for(gains, amp, bin_band):
    """gains [F, G], amp [F, NB], bin_band [F, 1024] -> e_bin [F, G, 1024]."""
    e_band = jnp.clip(gains[..., None] - amp[:, None, :],
                      C.GAIN_MIN, C.GAIN_MAX)                 # [F, G, NB]
    idx = jnp.broadcast_to(bin_band[:, None, :],
                           gains.shape + (bin_band.shape[-1],))
    return jnp.take_along_axis(e_band, idx, axis=-1)


def _bits_for_gains(x, amp, gains, bt, fs):
    """-> (bits [F, G] int32, q [F, G, 1024] int32)."""
    from .. import tables as T
    bin_band = jnp.asarray(T.unified_layout(fs)["bin_band"])[bt]
    e_bin = _e_bin_for(gains, amp, bin_band)
    q = quantize.quantize(x[:, None, :], e_bin)
    g = gains.shape[-1]
    bits = entropy.frame_content_bits(
        q, jnp.broadcast_to(amp[:, None, :], (amp.shape[0], g, amp.shape[1])),
        jnp.broadcast_to(bt[:, None], (bt.shape[0], g)), fs)
    return bits, q


def inner_gain_search(x, amp, budget_content, bt, fs):
    """Batched two-stage sweep -> (gain [F], q [F,1024], bits [F])."""
    nf = x.shape[0]
    coarse = jnp.broadcast_to(jnp.asarray(COARSE)[None, :], (nf, len(COARSE)))
    bits_c, _ = _bits_for_gains(x, amp, coarse, bt, fs)
    fits = bits_c <= budget_content[:, None]
    has = fits.any(axis=1)
    g0 = jnp.where(has, jnp.asarray(COARSE)[jnp.argmax(fits, axis=1)],
                   C.GAIN_MAX).astype(I32)
    fine = jnp.clip(g0[:, None] + jnp.arange(-C.GAIN_COARSE_STEP + 1, 1,
                                             dtype=I32)[None, :],
                    C.GAIN_MIN, C.GAIN_MAX)                   # [F, 8] asc
    bits_f, q_f = _bits_for_gains(x, amp, fine, bt, fs)
    fits_f = bits_f <= budget_content[:, None]
    idx = jnp.where(fits_f.any(axis=1), jnp.argmax(fits_f, axis=1),
                    fine.shape[1] - 1)
    gain = jnp.take_along_axis(fine, idx[:, None], axis=1)[:, 0]
    q = jnp.take_along_axis(q_f, idx[:, None, None], axis=1)[:, 0]
    bits = jnp.take_along_axis(bits_f, idx[:, None], axis=1)[:, 0]
    return gain, q, bits


def rd_batch(coeffs, allowed, budgets, bt, fs):
    """Batched RD search.

    coeffs [F, 1024] f32, allowed [F, NB] f32, budgets [F] int32, bt [F].
    Returns (q [F,1024] i32, amp [F,NB] i32, gain [F] i32, bits [F] i32).
    """
    from .. import tables as T
    lay = T.unified_layout(fs)
    tb = entropy._dev_tables(fs)
    width = jnp.asarray(tb["width"])[bt]                      # [F, NB]
    bin_band = jnp.asarray(lay["bin_band"])[bt]
    band_mask = lay["band_mask"]
    budget_content = (budgets - C.FRAME_LEN_BITS - 7).astype(I32)
    nf, nb = coeffs.shape[0], lay["nb"]
    amp = jnp.zeros((nf, nb), I32)

    x = coeffs.astype(F32)
    gain = jnp.zeros((nf,), I32)
    q = jnp.zeros((nf, C.LONG_COEFFS), I32)
    bits = jnp.zeros((nf,), I32)
    for it in range(C.OUTER_MAX):
        gain, q, bits = inner_gain_search(x, amp, budget_content, bt, fs)
        if it == C.OUTER_MAX - 1:
            break
        e_band = jnp.clip(gain[:, None] - amp, C.GAIN_MIN, C.GAIN_MAX)
        e_bin = jnp.take_along_axis(e_band, bin_band, axis=-1)
        xhat = quantize.dequantize(q, e_bin)
        err = (x - xhat) ** 2
        noise = psycho.band_sum(err, band_mask, bt)
        over = (noise > allowed) & (width > 0) & (amp < C.AMP_MAX)
        amp = jnp.minimum(amp + C.AMP_STEP * over.astype(I32), C.AMP_MAX)
    return q, amp, gain, bits
