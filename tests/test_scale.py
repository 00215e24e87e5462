"""Acceptance config 3 at TRUE scale (BASELINE.json:9; VERDICT r1 #7):
a 5-minute 48 kHz stereo 192 kbps encode through both engines — stream
equality, decode quality, chunk-ladder seams, and the reservoir horizon
at minutes-scale.

Slow (spec encode is ~1x realtime): skipped unless MRC_RUN_SLOW=1. Run it
as:  MRC_RUN_SLOW=1 python -m pytest tests/test_scale.py -q
Results from this session's run are recorded in BASELINE.md.
"""
import os

import numpy as np
import pytest

from mrcaudiocodec_tpu.config import CodecConfig
from mrcaudiocodec_tpu.spec import codec as scodec

pytestmark = pytest.mark.skipif(
    not os.environ.get("MRC_RUN_SLOW"),
    reason="minutes-scale run; set MRC_RUN_SLOW=1")


def make_track(fs, seconds, seed=0):
    """Music-like 5-minute program: evolving tone stack, noise floor,
    transients every ~0.7 s, and a loudness arc that exercises the
    reservoir at horizon (quiet stretches bank bits, loud ones spend)."""
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = np.zeros(n, np.float32)
    for f0, a in [(220, 0.3), (554, 0.18), (1320, 0.1), (3520, 0.06)]:
        x += (a * np.sin(2 * np.pi * f0 * t
                         + 0.1 * np.sin(2 * np.pi * 0.25 * t))
              ).astype(np.float32)
    x += (0.015 * rng.standard_normal(n)).astype(np.float32)
    for pos in range(fs // 2, n - 300, int(0.7 * fs)):
        x[pos:pos + 96] += (0.5 * rng.standard_normal(96)).astype(np.float32)
    # slow loudness arc: 0.35..1.0 gain over the track
    x *= (0.675 + 0.325 * np.sin(2 * np.pi * t / seconds - np.pi / 2)
          ).astype(np.float32)
    x = np.clip(x, -1, 1)
    return np.stack([x, np.roll(x, 11) * 0.9], axis=1)


def test_config3_five_minutes_full_length():
    from mrcaudiocodec_tpu.models import codec as tcodec
    from tests.test_conformance import frame_agreement, snr_db

    fs, seconds = 48000, 300.0
    cfg = CodecConfig(fs=fs, channels=2, bitrate=192000)
    x = make_track(fs, seconds)

    bs_spec = scodec.encode(x, cfg)
    bs_tpu = tcodec.encode(x, cfg)
    same, nf = frame_agreement(bs_spec, bs_tpu)
    if os.environ.get("MRC_TESTS_KEEP_TPU"):
        assert same / nf >= 0.95, f"only {same}/{nf} frames identical"
    else:
        assert same == nf, f"only {same}/{nf} frames identical"
        assert bs_spec == bs_tpu

    rate_kbps = len(bs_tpu) * 8 / seconds / 1000
    assert rate_kbps <= 192.0 + 1.0, f"rate {rate_kbps:.1f} kbps over target"

    y, _ = tcodec.decode(bs_tpu)
    s = snr_db(x, y)
    assert s > 25.0, f"decode SNR {s:.1f} dB too low"
    print(f"\nconfig3 full-length: {same}/{nf} frames identical, "
          f"rate {rate_kbps:.1f} kbps, SNR {s:.1f} dB")
