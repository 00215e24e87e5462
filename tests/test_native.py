"""Native C++ bitstream runtime vs pure-Python reference equality."""
import numpy as np
import pytest

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu import native
from mrcaudiocodec_tpu.config import CodecConfig
from mrcaudiocodec_tpu.spec import bitstream as B
from mrcaudiocodec_tpu.spec import codec as scodec
from mrcaudiocodec_tpu.spec import entropy as spec_entropy

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _stream(channels=2, seed=0):
    from tests.test_conformance import make_clip
    cfg = CodecConfig(fs=44100, channels=channels, bitrate=96000 * channels)
    x = make_clip(44100, 0.5, channels, seed=seed)
    return scodec.encode(x, cfg), cfg


def test_native_decode_matches_python():
    data, cfg = _stream()
    _, nf, _, hb = B.read_header(data)
    offs, lens = B.frame_byte_offsets(data, hb // 8, nf * cfg.channels)
    content_offs = offs * 8 + C.FRAME_LEN_BITS
    q, e_band, bt, gain = native.decode_records(data, content_offs, cfg.fs)

    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    from mrcaudiocodec_tpu import tables as T
    lay = T.unified_layout(cfg.fs)
    for i in range(nf * cfg.channels):
        cur = spec_entropy._Bits(bits, int(content_offs[i]))
        q_ref, e_bin_ref, bt_ref, gain_ref = \
            spec_entropy.decode_frame_content(cur, cfg.fs)
        assert bt[i] == bt_ref and gain[i] == gain_ref
        np.testing.assert_array_equal(q[i], q_ref, f"record {i} q")
        bb = lay["bin_band"][bt_ref]
        np.testing.assert_array_equal(e_band[i][bb], e_bin_ref,
                                      f"record {i} e")


def test_native_pack_matches_numpy():
    rng = np.random.default_rng(1)
    lens = rng.integers(0, 25, 2000)
    codes = np.array([rng.integers(0, 1 << max(l, 1)) for l in lens],
                     np.uint64)
    from mrcaudiocodec_tpu.utils.bits import pack_codes
    a = pack_codes(codes, lens.astype(np.int64))
    b = native.pack_codes_native(codes, lens.astype(np.int64))
    assert a == b


def test_decoder_uses_native_and_matches():
    from mrcaudiocodec_tpu.models import codec as tcodec
    data, cfg = _stream(channels=1, seed=3)
    y_spec, _ = scodec.decode(data)
    y_tpu, _ = tcodec.decode(data)
    np.testing.assert_array_equal(y_spec, y_tpu)   # bitwise since rev 5


def test_native_decode_corrupt_stream_safe():
    """Corrupt/truncated payloads must raise cleanly, never crash/overrun."""
    rng = np.random.default_rng(9)
    data, cfg = _stream(channels=1, seed=5)
    _, nf, _, hb = B.read_header(data)
    offs, lens = B.frame_byte_offsets(data, hb // 8, nf)
    content_offs = offs * 8 + C.FRAME_LEN_BITS
    # flip random bits in the payload region and truncate
    for trial in range(8):
        buf = bytearray(data)
        for _ in range(40):
            pos = int(rng.integers(B.HEADER_BYTES, len(buf)))
            buf[pos] ^= int(rng.integers(1, 256))
        cut = bytes(buf[:int(rng.integers(B.HEADER_BYTES + 4, len(buf)))])
        n_fit = int(np.searchsorted(offs, len(cut)))
        try:
            native.decode_records(cut, content_offs[:max(n_fit, 1)], cfg.fs)
        except ValueError:
            pass        # clean rejection is the expected outcome
