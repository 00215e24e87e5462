"""Acceptance config 3 at TRUE scale (BASELINE.json:9; VERDICT r1 #7):
a 5-minute 48 kHz stereo 192 kbps encode through both engines — stream
equality, decode quality, chunk-ladder seams, and the reservoir horizon
at minutes-scale.

Slow (spec encode is ~1x realtime): skipped unless MRC_RUN_SLOW=1. Run it
as:  MRC_RUN_SLOW=1 python -m pytest tests/test_scale.py -q          (CPU)
or:  MRC_RUN_SLOW=1 MRC_TESTS_KEEP_TPU=1 python -m pytest tests/test_scale.py
Measured results are recorded in BASELINE.md §"Minutes-scale byte identity".
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


def records_of(bs):
    """Split an MRC1 stream into its per-channel frame records."""
    from mrcaudiocodec_tpu import config as C
    from mrcaudiocodec_tpu.spec import bitstream
    cfg, n_frames, _, bitpos = bitstream.read_header(bs)
    nrec = n_frames * cfg.channels
    offs, lens = bitstream.frame_byte_offsets(bs, bitpos // 8, nrec)
    return cfg, [bs[int(o):int(o) + (C.FRAME_LEN_BITS + int(ln) + 7) // 8]
                 for o, ln in zip(offs, lens)]


def decode_record(rec, fs):
    from mrcaudiocodec_tpu import config as C
    from mrcaudiocodec_tpu.spec import entropy
    bits = np.unpackbits(np.frombuffer(rec, np.uint8))
    cur = entropy._Bits(bits, pos=C.FRAME_LEN_BITS)
    q, e_bin, bt, gain = entropy.decode_frame_content(cur, fs)
    return np.asarray(q), np.asarray(e_bin), bt, gain


def test_config3_five_minutes_full_length():
    """The exact cross-engine contract at scale (BASELINE.json:5): the
    engine stream must be BYTE-IDENTICAL to the normative spec stream for
    the full 5-minute program — on every backend. The xmath fixed-IEEE-
    sequence MDCT (mrcaudiocodec_tpu/xmath.py) removed the last rounding
    divergence (the old matmul MDCT's 1-ulp BLAS-vs-XLA deltas), so the
    historical >=99.5%-of-records floor and the +-1-gain escape hatch are
    gone: every record, every byte, or this test fails and names the
    first differing record's decoded decisions."""
    from mrcaudiocodec_tpu.models import codec as tcodec
    from tests.test_conformance import frame_agreement, snr_db

    fs, seconds = 48000, 300.0
    cfg = CodecConfig(fs=fs, channels=2, bitrate=192000)
    x = make_track(fs, seconds)

    bs_spec = scodec.encode(x, cfg)
    bs_tpu = tcodec.encode(x, cfg)
    same, nf = frame_agreement(bs_spec, bs_tpu)
    if same != nf or bs_tpu != bs_spec:
        # diagnose: decode the first differing record's decisions
        _, rec_s = records_of(bs_spec)
        _, rec_t = records_of(bs_tpu)
        for i, (a, b) in enumerate(zip(rec_s, rec_t)):
            if a == b:
                continue
            qa, ea, bta, ga = decode_record(a, fs)
            qb, eb, btb, gb = decode_record(b, fs)
            flips = int((qa != qb).sum())
            raise AssertionError(
                f"{same}/{nf} records identical; first diff rec {i}: "
                f"bt {bta}/{btb}, gain {ga}/{gb}, "
                f"sf diffs {int((ea != eb).sum())}, q diffs {flips}")
        raise AssertionError(
            f"records identical but streams differ "
            f"({len(bs_spec)} vs {len(bs_tpu)} bytes)")

    rate_kbps = len(bs_tpu) * 8 / seconds / 1000
    assert rate_kbps <= 192.0 + 1.0, f"rate {rate_kbps:.1f} kbps over target"

    y, _ = tcodec.decode(bs_tpu)
    s = snr_db(x, y)
    assert s > 25.0, f"decode SNR {s:.1f} dB too low"
    print(f"\nconfig3 full-length: {same}/{nf} frames byte-identical, "
          f"rate {rate_kbps:.1f} kbps, SNR {s:.1f} dB")
