"""On-device bitstream packing must be byte-identical to the host packers
and to the spec codec (it inherits the full conformance contract)."""
import os

import numpy as np
import pytest

from mrcaudiocodec_tpu.config import CodecConfig


@pytest.mark.parametrize("channels,bitrate", [(1, 96000), (2, 128000)])
def test_device_pack_equals_host_pack(channels, bitrate):
    from mrcaudiocodec_tpu.models import encoder, packing
    from tests.test_conformance import make_clip
    cfg = CodecConfig(fs=44100, channels=channels, bitrate=bitrate)
    x = make_clip(44100, 0.5, channels)
    dec, nf = encoder.encode_arrays(x, cfg)
    host_stream = packing.pack_stream(dec, nf, x.shape[0], cfg)
    dev_stream = encoder.encode_device_packed(x, cfg)
    assert dev_stream == host_stream


def test_device_pack_with_escapes():
    from mrcaudiocodec_tpu.models import encoder, packing
    rng = np.random.default_rng(0)
    n = 30000
    x = np.clip(0.9 * rng.standard_normal(n), -1, 1).astype(np.float32)[:, None]
    cfg = CodecConfig(fs=44100, channels=1, bitrate=256000)
    dec, nf = encoder.encode_arrays(x, cfg)
    assert np.abs(dec["q"]).max() >= 16
    host_stream = packing.pack_stream(dec, nf, n, cfg)
    dev_stream = encoder.encode_device_packed(x, cfg)
    assert dev_stream == host_stream


def test_device_pack_roundtrip_spec_decode():
    """Spec decoder consumes device-packed streams."""
    from mrcaudiocodec_tpu.models import encoder
    from mrcaudiocodec_tpu.spec import codec as scodec
    from tests.test_conformance import make_clip, snr_db
    cfg = CodecConfig(fs=48000, channels=2, bitrate=192000)
    x = make_clip(48000, 0.4, 2)
    bs = encoder.encode_device_packed(x, cfg)
    y, cfg2 = scodec.decode(bs)
    assert cfg2.fs == 48000
    assert snr_db(x, y) > 15.0
