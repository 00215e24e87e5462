"""Entropy coding + quantizer unit tests (SURVEY.md §4).

Huffman encode∘decode = identity for all codebooks including escapes;
bit cost accounting matches the actually emitted bit count exactly.
"""
import numpy as np
import pytest

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu import tables as T
from mrcaudiocodec_tpu.spec import entropy, quantize
from mrcaudiocodec_tpu.utils.bits import pack_codes


def _random_q(rng, fs, block_type):
    """Random quantized frame with a mix of band magnitudes incl escapes."""
    lay = T.unified_layout(fs)
    edges = lay["edges"][block_type]
    width = lay["width"][block_type]
    q = np.zeros(C.LONG_COEFFS, dtype=np.int32)
    for b in range(lay["nb"]):
        if width[b] == 0:
            continue
        lo, hi = edges[b], edges[b + 1]
        kind = rng.integers(0, 5)
        if kind == 0:
            continue                                   # zero band
        elif kind == 1:
            q[lo:hi] = rng.integers(-1, 2, hi - lo)
        elif kind == 2:
            q[lo:hi] = rng.integers(-4, 5, hi - lo)
        elif kind == 3:
            q[lo:hi] = rng.integers(-15, 16, hi - lo)
        else:
            q[lo:hi] = rng.integers(-400, 401, hi - lo)   # escapes
    return q


@pytest.mark.parametrize("fs", [44100, 48000])
@pytest.mark.parametrize("block_type", [C.LONG, C.SHORT])
def test_frame_symbols_roundtrip(fs, block_type):
    rng = np.random.default_rng(7)
    lay = T.unified_layout(fs)
    for trial in range(5):
        q = _random_q(rng, fs, block_type)
        amp = rng.integers(0, C.AMP_MAX + 1, lay["nb"]).astype(np.int32)
        amp = (amp // C.AMP_STEP) * C.AMP_STEP
        gain = int(rng.integers(60, 200))
        codes, lens = entropy.encode_frame_symbols(q, amp, gain, block_type, fs)
        packed = pack_codes(np.array(codes, np.uint64), np.array(lens, np.int64))
        bits = np.unpackbits(np.frombuffer(packed, np.uint8))
        cur = entropy._Bits(bits, 0)
        q2, e_bin, bt2, gain2 = entropy.decode_frame_content(cur, fs)
        assert bt2 == block_type and gain2 == gain
        np.testing.assert_array_equal(q2, q)
        # e_bin consistent with amp on coded bins
        e_band = np.clip(gain - amp, 0, 255)
        bb = lay["bin_band"][block_type]
        np.testing.assert_array_equal(e_bin, e_band[bb])


@pytest.mark.parametrize("block_type", [C.LONG, C.SHORT])
def test_bit_cost_matches_emission(block_type):
    """frame_content_bits must equal the exact emitted bit count."""
    fs = 44100
    rng = np.random.default_rng(11)
    lay = T.unified_layout(fs)
    for trial in range(5):
        q = _random_q(rng, fs, block_type)
        amp = np.zeros(lay["nb"], np.int32)
        amp[rng.integers(0, lay["nb"], 5)] = C.AMP_STEP
        predicted = entropy.frame_content_bits(
            q, amp, lay["edges"][block_type], lay["width"][block_type])
        codes, lens = entropy.encode_frame_symbols(q, amp, 120, block_type, fs)
        assert int(predicted) == int(sum(lens))


def test_quantizer_roundtrip_monotone():
    x = np.linspace(-100, 100, 4097).astype(np.float32)
    e = np.full_like(x, 128, dtype=np.int32)
    q = quantize.quantize(x, e)
    # sign symmetry and monotonicity
    np.testing.assert_array_equal(q, -quantize.quantize(-x, e))
    assert np.all(np.diff(q) >= 0)
    xh = quantize.dequantize(q, e)
    # reconstruction error bounded by the companded step size at |x|<=100
    assert np.abs(xh - x).max() < 3.0
    # zero maps to zero
    assert quantize.quantize(np.zeros(4, np.float32), e[:4]).tolist() == [0]*4


def test_quantizer_clamps_at_qmax():
    x = np.array([1e9], np.float32)
    q = quantize.quantize(x, np.array([0], np.int32))
    assert q[0] == C.QMAX


def test_pack_codes_matches_bitwriter():
    from mrcaudiocodec_tpu.utils.bits import BitWriter, BitReader
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 21, 100)
    vals = [int(rng.integers(0, 1 << l)) for l in lens]
    w = BitWriter()
    for v, l in zip(vals, lens):
        w.write(v, int(l))
    a = w.getvalue()
    b = pack_codes(np.array(vals, np.uint64), lens.astype(np.int64))
    assert a == b
    r = BitReader(a)
    for v, l in zip(vals, lens):
        assert r.read(int(l)) == v
