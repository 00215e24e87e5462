"""Normative rate-distortion loop (reference components R9/R10, SURVEY.md §2).

TPU-first redesign of the classic sequential two-loop search, implemented
here in NumPy as the normative definition (SURVEY.md §0/§7 step 2):

* inner (rate) loop  -> a *parallel two-stage gain sweep*: evaluate the
  exact frame bit cost at 32 coarse gains (step 8), pick the smallest
  fitting one, then refine over the 8 gains below it. Deterministic given
  the quantized values; no data-dependent iteration count.
* outer (distortion) loop -> fixed OUTER_MAX iterations; bands whose
  quantization noise exceeds the allowed (masking) threshold get their
  scale-factor exponent amplified by AMP_STEP quarter-steps, with per-band
  convergence masks instead of early exit.

The JAX mirror (mrcaudiocodec_tpu/ops/rd.py) runs the same fixed-bound
algorithm under jit/vmap, so both paths take identical decisions whenever
their float32 quantized values agree (BASELINE.json:5 "bit-exact bitstreams
for identical rate decisions").
"""
from __future__ import annotations

import numpy as np

from .. import config as C
from .. import tables as T
from . import entropy, quantize

F32 = np.float32

COARSE_GAINS = np.arange(C.GAIN_MIN, C.GAIN_MAX + 1, C.GAIN_COARSE_STEP,
                         dtype=np.int32)          # 32 candidates


def _bits_for_gains(x, amp, gains, lay, block_type):
    """Frame bit cost for each candidate gain. x:[1024], gains:[G]."""
    edges = lay["edges"][block_type]
    width = lay["width"][block_type]
    bin_band = lay["bin_band"][block_type]
    e_band = np.clip(gains[:, None] - amp[None, :], C.GAIN_MIN, C.GAIN_MAX)
    q = quantize.quantize(x[None, :], e_band[:, bin_band])      # [G, 1024]
    return entropy.frame_content_bits(q, np.broadcast_to(amp, (len(gains), len(amp))),
                                      edges, width), q


def inner_gain_search(x, amp, budget_content, lay, block_type):
    """Two-stage sweep -> (gain, q[1024], content_bits). Deterministic."""
    bits_c, _ = _bits_for_gains(x, amp, COARSE_GAINS, lay, block_type)
    fits = bits_c <= budget_content
    if fits.any():
        g0 = int(COARSE_GAINS[int(np.argmax(fits))])
    else:
        g0 = C.GAIN_MAX
    fine = np.arange(max(C.GAIN_MIN, g0 - C.GAIN_COARSE_STEP + 1), g0 + 1,
                     dtype=np.int32)
    bits_f, q_f = _bits_for_gains(x, amp, fine, lay, block_type)
    fits_f = bits_f <= budget_content
    if fits_f.any():
        i = int(np.argmax(fits_f))
    else:           # only possible in the g0 == GAIN_MAX corner
        i = len(fine) - 1
    return int(fine[i]), q_f[i], int(bits_f[i])


# Outer iterations 2+ re-search only a narrow window above the previous
# gain: amplification strictly increases bit cost at fixed gain, so the new
# best gain is >= the previous one, and one AMP_STEP outer move shifts it
# by only a few quarter-steps. GAIN_MAX is appended as a guaranteed-fit
# fallback so the budget contract is kept even in pathological frames.
REFINE_WINDOW = 15


def refine_gain_search(x, amp, budget_content, prev_gain, lay, block_type):
    """Windowed re-search -> (gain, q[1024], content_bits)."""
    cand = np.arange(prev_gain, min(prev_gain + REFINE_WINDOW, C.GAIN_MAX) + 1,
                     dtype=np.int32)
    if cand[-1] != C.GAIN_MAX:
        cand = np.concatenate([cand, [np.int32(C.GAIN_MAX)]])
    bits, q = _bits_for_gains(x, amp, cand, lay, block_type)
    fits = bits <= budget_content
    i = int(np.argmax(fits)) if fits.any() else len(cand) - 1
    return int(cand[i]), q[i], int(bits[i])


def rd_frame(x, allowed, budget_bits: int, block_type: int, fs: int):
    """Encode-side RD search for one frame.

    x: [1024] float32 MDCT coefficients, allowed: [NB] permitted noise
    energy, budget_bits: total frame bit budget (including the length
    prefix and worst-case byte padding).

    Returns (q[1024] int32, amp[NB] int32, gain int, content_bits int).
    """
    lay = T.unified_layout(fs)
    edges = lay["edges"][block_type]
    width = lay["width"][block_type]
    bin_band = lay["bin_band"][block_type]
    budget_content = budget_bits - C.FRAME_LEN_BITS - 7
    amp = np.zeros(lay["nb"], dtype=np.int32)

    gain, q, bits = 0, None, 0
    for it in range(C.OUTER_MAX):
        if it == 0:
            gain, q, bits = inner_gain_search(x, amp, budget_content, lay,
                                              block_type)
        else:
            gain, q, bits = refine_gain_search(x, amp, budget_content, gain,
                                               lay, block_type)
        e_band = np.clip(gain - amp, C.GAIN_MIN, C.GAIN_MAX)
        xhat = quantize.dequantize(q, e_band[bin_band])
        # noise band energies via the shared pinned scan tree (rev 4)
        from .psycho import mdct_band_energy
        noise = mdct_band_energy((x.astype(F32) - xhat), edges)
        over = (noise > allowed) & (width > 0) & (amp < C.AMP_MAX)
        if it == C.OUTER_MAX - 1 or not over.any():
            break
        amp = np.minimum(amp + C.AMP_STEP * over.astype(np.int32), C.AMP_MAX)
    return q, amp, gain, bits
