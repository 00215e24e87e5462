"""Vectorized packer must produce byte-identical streams to the reference
per-frame packer (models/encoder.pack_stream)."""
import numpy as np
import pytest

from mrcaudiocodec_tpu.config import CodecConfig


@pytest.mark.parametrize("channels,fs", [(1, 44100), (2, 48000)])
def test_vectorized_pack_matches_loop(channels, fs):
    from mrcaudiocodec_tpu.models import encoder, packing
    from tests.test_conformance import make_clip
    cfg = CodecConfig(fs=fs, channels=channels,
                      bitrate=96000 * channels)
    x = make_clip(fs, 0.5, channels)
    dec, nf = encoder.encode_arrays(x, cfg)
    a = encoder.pack_stream(dec, nf, x.shape[0], cfg)
    b = packing.pack_stream(dec, nf, x.shape[0], cfg)
    assert a == b


def test_vectorized_pack_with_escapes():
    """Force large coefficients so escape slots are exercised."""
    from mrcaudiocodec_tpu.models import encoder, packing
    rng = np.random.default_rng(0)
    fs = 44100
    n = 30000
    x = np.clip(0.9 * rng.standard_normal(n), -1, 1).astype(np.float32)[:, None]
    cfg = CodecConfig(fs=fs, channels=1, bitrate=256000)
    dec, nf = encoder.encode_arrays(x, cfg)
    assert np.abs(dec["q"]).max() >= 16, "test content produced no escapes"
    a = encoder.pack_stream(dec, nf, n, cfg)
    b = packing.pack_stream(dec, nf, n, cfg)
    assert a == b
