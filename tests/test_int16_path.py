"""int16 fast paths must be bit/value-identical to the float paths."""
import numpy as np

from mrcaudiocodec_tpu.config import CodecConfig


def test_int16_encode_bit_identical():
    """Encoding raw int16 == encoding int16/32768 floats, byte for byte."""
    from mrcaudiocodec_tpu.models import codec as tcodec
    from tests.test_conformance import make_clip
    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    xf = make_clip(44100, 0.4, 2)
    xi = np.clip(np.round(xf * 32768.0), -32768, 32767).astype(np.int16)
    bs_float = tcodec.encode(xi.astype(np.float32) / np.float32(32768.0), cfg)
    bs_int = tcodec.encode(xi, cfg)
    assert bs_float == bs_int


def test_int16_decode_matches_float_rounding():
    """decode(pcm_dtype='int16') == round(decode float32 * 32767)."""
    from mrcaudiocodec_tpu.models import codec as tcodec
    from tests.test_conformance import make_clip
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    x = make_clip(44100, 0.4, 1)
    bs = tcodec.encode(x, cfg)
    yf, _ = tcodec.decode(bs)
    yi, _ = tcodec.decode(bs, pcm_dtype="int16")
    ref = np.clip(np.round(yf * 32767.0), -32768, 32767).astype(np.int16)
    # rounding on device happens before the float PCM is materialized, so
    # allow the +-1 LSB that a .5-boundary double-round can produce
    assert np.abs(yi.astype(np.int32) - ref.astype(np.int32)).max() <= 1
    assert (yi != ref).mean() < 1e-3
