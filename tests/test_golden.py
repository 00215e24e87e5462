"""Golden conformance vectors (SURVEY.md §4 'golden/conformance').

The spec codec is NORMATIVE: its bitstream for a fixed clip must never
change accidentally. These SHA-256 hashes pin the format; if an
intentional format/algorithm change lands, regenerate them consciously
(script in the module docstring of this file's git history) and note the
format break in docs/FORMAT.md.
"""
import hashlib

import numpy as np
import pytest

from mrcaudiocodec_tpu.config import CodecConfig
from mrcaudiocodec_tpu.spec import codec as scodec


def make_golden_clip(fs, seconds, channels):
    rng = np.random.default_rng(12345)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = (0.4 * np.sin(2 * np.pi * 330 * t)
         + 0.18 * np.sin(2 * np.pi * 1870 * t)).astype(np.float32)
    x += (0.015 * rng.standard_normal(n)).astype(np.float32)
    x[n // 3:n // 3 + 72] += (0.55 * rng.standard_normal(72)).astype(np.float32)
    x = np.clip(x, -1, 1)
    xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    x = xi.astype(np.float32) / np.float32(32768.0)
    if channels == 2:
        return np.stack([x, np.roll(x, 13) * 0.85], 1)
    return x[:, None]


GOLDEN = [
    ("g1", 44100, 1, 96000, {},
     "ff3b0dc43fd0d13086f074705708a8b6e4b6b4fad36d0ecd720cc6ce1e8a3be9"),
    ("g2", 44100, 2, 128000, {},
     "ded8e52e57d05ddc1dc1d1584a1955432fced1dd309af734183bb0137cb8e641"),
    ("g3", 48000, 2, 192000, {},
     "301dab67db619b02f1d8f219eba0e163e8942db0a30a3bdc60d6e57a3ea2d16e"),
    ("g4", 44100, 1, 96000, {'window_switching': False},
     "60122258716993c3f2c3861a9c39562d86208eb803c561655346900e69ce9dfe"),
    ("g5_32k", 32000, 1, 64000, {},
     "b8c763155cdb68e1af709e3fa79b4e5a47901196d790e5b9106d67097366907a"),
    ("g6_kbd", 44100, 1, 96000, {'window': 'kbd'},
     "88e0688b2c6e3d5618dcde34f44b6d6ad3efde4e22a1a1c6d432277b7c6de9c8"),
]


@pytest.mark.parametrize("name,fs,ch,br,kw,digest", GOLDEN,
                         ids=[g[0] for g in GOLDEN])
def test_golden_spec_stream(name, fs, ch, br, kw, digest):
    cfg = CodecConfig(fs=fs, channels=ch, bitrate=br, **kw)
    bs = scodec.encode(make_golden_clip(fs, 0.7, ch), cfg)
    assert hashlib.sha256(bs).hexdigest() == digest


def test_golden_tpu_stream_matches():
    """The TPU engine reproduces a golden stream bit-for-bit (CPU mesh)."""
    from mrcaudiocodec_tpu.models import codec as tcodec
    name, fs, ch, br, kw, digest = GOLDEN[1]
    cfg = CodecConfig(fs=fs, channels=ch, bitrate=br, **kw)
    bs = tcodec.encode(make_golden_clip(fs, 0.7, ch), cfg)
    assert hashlib.sha256(bs).hexdigest() == digest
