"""The NumPy in-place fast paths of the pinned transcendentals must be
BITWISE identical to the generic normative sequences for every input class
the codec produces (rev 5 spec-codec speed work — the sequences are the
format, so the fast path must not move a single ulp).
"""
import numpy as np

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu import tables as T
from mrcaudiocodec_tpu import xpsy


def _adversarial_f32(rng, n=200000):
    """Positive finite f32s spanning subnormals to huge, plus exact
    powers of two, odd/even exponents, and boundary mantissas."""
    exp = rng.uniform(-40, 38, n).astype(np.float32)
    x = (10.0 ** exp.astype(np.float64)).astype(np.float32)
    x *= (1.0 + rng.uniform(-0.5, 0.5, n)).astype(np.float32)
    specials = np.array(
        [0.0, 1e-45, 2.0 ** -126, np.nextafter(np.float32(2.0 ** -126), 1,
                                               dtype=np.float32),
         1.0, 2.0, 4.0, 0.5, np.nextafter(np.float32(1.0), 0,
                                          dtype=np.float32),
         xpsy.SQRT2, np.nextafter(xpsy.SQRT2, 0, dtype=np.float32),
         3.4e38, 65535.0], np.float32)
    return np.abs(np.concatenate([x, specials]))


def test_xsqrt_fastpath_bitwise():
    rng = np.random.default_rng(0)
    x = _adversarial_f32(rng)
    a = xpsy._xsqrt_np(x)
    b = xpsy._xsqrt_generic(x, np)
    np.testing.assert_array_equal(a.view(np.int32), b.view(np.int32))


def test_xlog2_fastpath_bitwise():
    rng = np.random.default_rng(1)
    x = _adversarial_f32(rng)
    x = x[x >= np.float32(2.0 ** -126)]      # xlog2 domain: normal positives
    a = xpsy._xlog2_np(x)
    b = xpsy._xlog2_generic(x, np)
    np.testing.assert_array_equal(a.view(np.int32), b.view(np.int32))


def test_xexp2_fastpath_bitwise():
    rng = np.random.default_rng(2)
    x = np.concatenate([
        rng.uniform(-126, 126, 200000).astype(np.float32),
        np.array([0.0, -0.5, 0.5, 125.9, -125.9, 1.0 / 3.0], np.float32)])
    a = xpsy._xexp2_np(x)
    b = xpsy._xexp2_generic_np(x)
    np.testing.assert_array_equal(a.view(np.int32), b.view(np.int32))


def test_xsqrt_noncontiguous_input():
    """Fast path must handle broadcast/strided views (quantize feeds
    x[:, None, :] * step products)."""
    rng = np.random.default_rng(3)
    base = np.abs(rng.standard_normal((64, 2, 32)).astype(np.float32))
    v = base[::2, 1, ::3]                    # non-contiguous view
    np.testing.assert_array_equal(xpsy._xsqrt_np(v),
                                  xpsy._xsqrt_generic(np.ascontiguousarray(v),
                                                      np))


def test_escape_len_table_matches_formula():
    m = np.arange(C.QMAX + 1)
    e = np.floor(np.log2(np.maximum(m, 1))).astype(np.int64)
    want = np.where(m >= C.ESC_MAG, 2 * e - 3, 0)
    np.testing.assert_array_equal(T.escape_len(m), want)
    np.testing.assert_array_equal(T.escape_len(-m), want)   # sign-safe
