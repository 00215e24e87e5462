"""Normative nonlinear quantizer (reference component R8, SURVEY.md §2).

AAC-style power-law quantizer with per-band scale-factor exponents:
    step_b   = 2 ** ((e_b - GAIN_BIAS) / 4)
    q        = sign(x) * min(floor((|x|/step_b)^0.75 + QUANT_MAGIC), QMAX)
    x_hat    = sign(q) * |q|^(4/3) * step_b

All arithmetic float32; mirrored by mrcaudiocodec_tpu/ops/quantize.py.
"""
from __future__ import annotations

import numpy as np

from .. import config as C

F32 = np.float32


def band_steps(e: np.ndarray) -> np.ndarray:
    """Per-band exponent -> per-band step size (float32)."""
    return np.power(F32(2.0), (np.asarray(e, dtype=F32) - F32(C.GAIN_BIAS)) / F32(4.0))


def quantize(x: np.ndarray, e_bin: np.ndarray) -> np.ndarray:
    """Coefficients [..., 1024] + per-bin exponent -> int32 q values."""
    x = np.asarray(x, dtype=F32)
    a = np.abs(x) / band_steps(e_bin)
    mag = np.floor(np.power(a, F32(0.75)) + F32(C.QUANT_MAGIC))
    mag = np.minimum(mag, F32(C.QMAX)).astype(np.int32)
    return np.where(x < 0, -mag, mag).astype(np.int32)


def dequantize(q: np.ndarray, e_bin: np.ndarray) -> np.ndarray:
    """int32 q values + per-bin exponent -> float32 reconstruction."""
    q = np.asarray(q)
    mag = np.abs(q).astype(F32)
    val = np.power(mag, F32(4.0 / 3.0)) * band_steps(e_bin)
    return np.where(q < 0, -val, val).astype(F32)
