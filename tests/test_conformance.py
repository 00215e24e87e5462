"""Conformance harness (SURVEY.md §2b N13): the JAX/TPU path must reproduce
the normative spec codec bit-for-bit (equal rate decisions => bit-exact
bitstreams, BASELINE.json:5), and each path must decode the other's
streams. The named cases mirror the acceptance configs (BASELINE.json:7-9)
at reduced clip lengths for test speed.
"""
import numpy as np
import pytest

from mrcaudiocodec_tpu.config import CodecConfig
from mrcaudiocodec_tpu.spec import bitstream as B
from mrcaudiocodec_tpu.spec import codec as scodec


def make_clip(fs, seconds, channels, seed=0):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = (0.45 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 2350 * t)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    for pos in range(fs // 2, n - 200, fs):
        x[pos:pos + 64] += (0.6 * rng.standard_normal(64)).astype(np.float32)
    x = np.clip(x, -1, 1)
    if channels == 2:
        return np.stack([x, np.roll(x, 7) * 0.9], axis=1)
    return x[:, None]


def snr_db(x, y):
    return 10 * np.log10((np.mean(x ** 2) + 1e-30)
                         / (np.mean((x - y) ** 2) + 1e-30))


def frame_agreement(bs_a: bytes, bs_b: bytes):
    """-> (identical_frames, total_frames) between two MRC1 streams."""
    cfg_a, nf, _, hb = B.read_header(bs_a)
    _, nf2, _, _ = B.read_header(bs_b)
    assert nf == nf2
    nf = nf * cfg_a.channels          # channel-interleaved records
    oa, la = B.frame_byte_offsets(bs_a, hb // 8, nf)
    ob, lb = B.frame_byte_offsets(bs_b, hb // 8, nf)
    same = 0
    for i in range(nf):
        na = oa[i] + (20 + la[i] + 7) // 8
        nb = ob[i] + (20 + lb[i] + 7) // 8
        if la[i] == lb[i] and bs_a[oa[i]:na] == bs_b[ob[i]:nb]:
            same += 1
    return same, nf


CASES = [
    # (name, fs, channels, bitrate, kwargs) — acceptance configs 1-3
    ("config1_mono_96k_long", 44100, 1, 96000,
     dict(window_switching=False)),
    ("config2_stereo_128k_switching", 44100, 2, 128000, {}),
    ("config3_48k_192k_full", 48000, 2, 192000, {}),
    ("no_psycho", 44100, 1, 96000, dict(full_psycho=False)),
    ("no_reservoir", 44100, 1, 96000, dict(reservoir=False)),
    ("kbd_window", 44100, 1, 96000, dict(window="kbd")),
    ("mono_32k_64k", 32000, 1, 64000, {}),
]


@pytest.mark.parametrize("name,fs,channels,bitrate,kw",
                         CASES, ids=[c[0] for c in CASES])
def test_tpu_path_bit_exact(name, fs, channels, bitrate, kw):
    from mrcaudiocodec_tpu.models import codec as tcodec
    cfg = CodecConfig(fs=fs, channels=channels, bitrate=bitrate, **kw)
    x = make_clip(fs, 0.6, channels)
    bs_spec = scodec.encode(x, cfg)
    bs_tpu = tcodec.encode(x, cfg)
    same, nf = frame_agreement(bs_spec, bs_tpu)
    # The contract: BYTE EQUALITY on every backend, no floor. Rev 4
    # (docs/FORMAT.md, DESIGN.md §4c) made the entire encoder's decision
    # arithmetic a fixed sequence of correctly-rounded-everywhere ops, so
    # spec == engine holds bitwise on CPU and on the real TPU alike —
    # verified on v5e hardware 2026-08-20: TPU_CONFORMANCE.json records
    # 5/5 configs byte_equal, total_agreement 1.0 (the pre-rev-4 residual
    # was psycho ulps through TPU's non-correctly-rounded divide/sqrt —
    # scripts/tpu_g3_probe.py, tpu_div_probe.py).
    assert same == nf, f"{name}: only {same}/{nf} frames identical"
    assert bs_spec == bs_tpu


@pytest.mark.parametrize("n", [1, 10, 1023, 1024, 1025])
def test_subframe_and_boundary_lengths(n):
    """Clip lengths at and around the frame boundary: byte-equal streams
    and bitwise-equal decodes across engines (priming/flush edges)."""
    from mrcaudiocodec_tpu.models import codec as tcodec
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    x = (0.3 * np.random.default_rng(n).standard_normal((n, 1))
         ).astype(np.float32)
    bs_spec = scodec.encode(x, cfg)
    bs_tpu = tcodec.encode(x, cfg)
    assert bs_spec == bs_tpu
    y_spec, _ = scodec.decode(bs_spec)
    y_tpu, _ = tcodec.decode(bs_tpu)
    assert y_spec.shape == (n, 1)
    np.testing.assert_array_equal(y_spec, y_tpu)


@pytest.mark.parametrize("direction", ["spec->tpu", "tpu->spec"])
def test_cross_decode(direction):
    """Streams are interchangeable between engines."""
    from mrcaudiocodec_tpu.models import codec as tcodec
    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    x = make_clip(44100, 0.5, 2)
    if direction == "spec->tpu":
        bs = scodec.encode(x, cfg)
        y, cfg2 = tcodec.decode(bs)
    else:
        bs = tcodec.encode(x, cfg)
        y, cfg2 = scodec.decode(bs)
    assert cfg2.fs == cfg.fs
    assert y.shape == x.shape
    assert snr_db(x, y) > 15.0


def test_tpu_decode_matches_spec_decode():
    """Same stream -> both decoders produce BITWISE identical PCM.

    Rev 5 pinned the spec's overlap-add to the same single f32 hop-add
    the engine's chunked decoder performs (spec/dsp.py overlap_add), so
    the determinism story now runs through the decoder too — no
    tolerance."""
    from mrcaudiocodec_tpu.models import codec as tcodec
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    x = make_clip(44100, 0.5, 1)
    bs = scodec.encode(x, cfg)
    y_spec, _ = scodec.decode(bs)
    y_tpu, _ = tcodec.decode(bs)
    np.testing.assert_array_equal(y_spec, y_tpu)


def test_quality_parity_with_spec():
    """Decoded SNR of the TPU path >= spec at equal bitrate (BASELINE.json:5)."""
    from mrcaudiocodec_tpu.models import codec as tcodec
    cfg = CodecConfig(fs=44100, channels=1, bitrate=128000)
    x = make_clip(44100, 0.6, 1)
    y_spec, _ = scodec.decode(scodec.encode(x, cfg))
    y_tpu, _ = tcodec.decode(tcodec.encode(x, cfg))
    assert snr_db(x, y_tpu) >= snr_db(x, y_spec) - 0.1


def test_reservoir_scan_matches_host_loop():
    """Associative clamped-add scan == sequential reservoir loop (N9)."""
    import jax.numpy as jnp
    from mrcaudiocodec_tpu.ops import reservoir as ores
    from mrcaudiocodec_tpu.spec import reservoir as sres
    rng = np.random.default_rng(3)
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    pe = rng.uniform(0, 4000, 337).astype(np.float32)
    host = sres.allocate(pe, cfg)
    mean_pe = sres.mean_pe_of(sres.quantize_pe(pe))
    dev = np.asarray(ores.allocate(jnp.asarray(pe), cfg, mean_pe))
    np.testing.assert_array_equal(host, dev)


def test_mean_pe_exact_no_overflow():
    """Device mean-PE must equal the host int64 mean even where a direct
    int32 sum would overflow (VERDICT r1 missing #6: long-clip horizon)."""
    import jax.numpy as jnp
    from mrcaudiocodec_tpu.ops import reservoir as ores
    rng = np.random.default_rng(4)
    # 40k frames of worst-case PE: direct int32 sum would wrap at ~32k
    pe_q = rng.integers(60000, 65536, 40000).astype(np.int32)
    want = int(np.sum(pe_q.astype(np.int64))) // len(pe_q)
    got = int(ores.mean_pe_exact(jnp.asarray(pe_q), len(pe_q)))
    assert got == want
    # and on realistic magnitudes it matches exactly too
    pe_q = rng.integers(0, 4000, 12345).astype(np.int32)
    want = max(1, int(np.sum(pe_q.astype(np.int64))) // len(pe_q))
    assert int(ores.mean_pe_exact(jnp.asarray(pe_q), len(pe_q))) == want
