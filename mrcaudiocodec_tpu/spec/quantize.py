"""Normative nonlinear quantizer (reference component R8, SURVEY.md §2).

AAC-style power-law quantizer with per-band scale-factor exponents:
    step_b   = 2 ** ((e_b - GAIN_BIAS) / 4)
    q        = sign(x) * min(floor((|x|/step_b)^0.75 + QUANT_MAGIC), QMAX)
    x_hat    = sign(q) * |q|^(4/3) * step_b

All arithmetic float32. The NORMATIVE evaluation order is fixed so every
implementation produces bit-identical q on IEEE-754 hardware, immune to
compiler fusion and libm differences (a `pow`-based formulation flipped
floor boundaries between XLA graph shapes — one q-bin per ~500 frames):

    step = frac[(e-BIAS) & 3] * 2^((e-BIAS) >> 2)     # both factors exact
    a    = |x| / step                                  # one IEEE divide
    a^0.75 = sqrt(a * sqrt(a))                         # sqrt, mul, sqrt

Every op is a single correctly-rounded IEEE-754 operation (no mul+add
pair an FMA contraction could fuse). Mirrored bit-exactly by
mrcaudiocodec_tpu/ops/quantize.py and ops/pallas/quant_kernel.py.
"""
from __future__ import annotations

import numpy as np

from .. import config as C

F32 = np.float32

# exact f32 roundings of 2^(r/4), r = 0..3
STEP_FRAC = np.array([2.0 ** 0.0, 2.0 ** 0.25, 2.0 ** 0.5, 2.0 ** 0.75],
                     dtype=F32)


def band_steps(e: np.ndarray) -> np.ndarray:
    """Per-band exponent -> per-band step size (float32, exact dyadic)."""
    d = np.asarray(e, dtype=np.int32) - np.int32(C.GAIN_BIAS)
    return np.ldexp(STEP_FRAC[d & 3], d >> 2)   # frac * 2^k, both exact


def quantize(x: np.ndarray, e_bin: np.ndarray) -> np.ndarray:
    """Coefficients [..., 1024] + per-bin exponent -> int32 q values."""
    x = np.asarray(x, dtype=F32)
    a = np.abs(x) / band_steps(e_bin)
    p = np.sqrt(a * np.sqrt(a))                 # a^0.75, fixed op order
    mag = np.floor(p + F32(C.QUANT_MAGIC))
    mag = np.minimum(mag, F32(C.QMAX)).astype(np.int32)
    return np.where(x < 0, -mag, mag).astype(np.int32)


def dequantize(q: np.ndarray, e_bin: np.ndarray) -> np.ndarray:
    """int32 q values + per-bin exponent -> float32 reconstruction."""
    q = np.asarray(q)
    mag = np.abs(q).astype(F32)
    val = np.power(mag, F32(4.0 / 3.0)) * band_steps(e_bin)
    return np.where(q < 0, -val, val).astype(F32)
