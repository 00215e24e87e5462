"""Corpus runner parallelism (SURVEY.md §2b N7/N11, acceptance config 5;
VERDICT r1 #6): run_corpus must batch equal-shape clips over every local
device and still emit streams byte-identical to per-clip encoding.

Runs on the conftest-forced 8-virtual-device CPU mesh.
"""
import glob
import json
import os

import jax
import numpy as np
import pytest

from mrcaudiocodec_tpu import corpus
from mrcaudiocodec_tpu.config import CodecConfig
from mrcaudiocodec_tpu.spec import audiofile


@pytest.fixture(autouse=True)
def _host_pack_by_default(request, monkeypatch):
    """On the 8-virtual-device CPU mesh the on-device record packer's
    compare-reduce byte assembly is slow enough to double this module's
    runtime, so most tests here run the decision-array + host-pack form
    of the fused path; tests marked with `devicepack` keep the production
    default (device-packed records) so that path stays covered end to
    end. Both forms must emit byte-identical streams either way — that
    equality IS this module's assertion."""
    if request.node.get_closest_marker("devicepack") is None:
        from mrcaudiocodec_tpu.models import encoder
        monkeypatch.setattr(encoder, "DEVICE_PACK", False)


def _write_corpus(tmpdir, n_clips, seconds=0.4, fs=44100, channels=2):
    clips = corpus._synth_corpus(n_clips, seconds, fs=fs, channels=channels)
    paths = []
    for i, x in enumerate(clips):
        p = os.path.join(tmpdir, f"clip{i:03d}.wav")
        audiofile.write_wav(p, x, fs)
        paths.append(p)
    return paths, clips


def test_run_corpus_uses_all_devices_and_matches_per_clip(tmp_path):
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (conftest forces them on CPU; a "
                    "single-chip MRC_TESTS_KEEP_TPU run skips)")
    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    paths, clips = _write_corpus(str(indir), 9)   # 9 stereo = 18 rows
    stats = corpus.run_corpus(paths, str(outdir), {"bitrate": 128000})
    assert stats["encoded"] == 9
    assert stats["devices_local"] == 8
    assert stats["devices_global"] == 8
    # grouped: 9 equal-shape clips flush as ONE mega-batch, not 9
    assert stats["batches"] == 1

    from mrcaudiocodec_tpu.models import codec as tcodec
    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    for i, p in enumerate(paths):
        x, _ = audiofile.read_wav(p, raw_int16=True)
        with open(outdir / f"clip{i:03d}.mrc", "rb") as f:
            got = f.read()
        assert got == tcodec.encode(x, cfg), f"clip {i} differs"


def test_run_corpus_resume_skips_done(tmp_path):
    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    paths, _ = _write_corpus(str(indir), 3, seconds=0.3)
    s1 = corpus.run_corpus(paths, str(outdir), {"bitrate": 96000})
    assert s1["encoded"] == 3
    s2 = corpus.run_corpus(paths, str(outdir), {"bitrate": 96000})
    assert s2["encoded"] == 0 and s2["skipped"] == 3


def test_run_corpus_mixed_shapes(tmp_path):
    """Unequal-length clips group separately and still match per-clip."""
    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    pa, _ = _write_corpus(str(indir), 2, seconds=0.3)
    clips_b = corpus._synth_corpus(2, 0.5, channels=1, seed=7)
    pb = []
    for i, x in enumerate(clips_b):
        p = os.path.join(str(indir), f"mono{i}.wav")
        audiofile.write_wav(p, x, 44100)
        pb.append(p)
    stats = corpus.run_corpus(pa + pb, str(outdir), {"bitrate": 96000})
    assert stats["encoded"] == 4

    from mrcaudiocodec_tpu.models import codec as tcodec
    for p in pa + pb:
        x, _ = audiofile.read_wav(p, raw_int16=True)
        cfg = CodecConfig(fs=44100, channels=x.shape[1], bitrate=96000)
        base = os.path.splitext(os.path.basename(p))[0]
        with open(outdir / f"{base}.mrc", "rb") as f:
            assert f.read() == tcodec.encode(x, cfg), p


def test_run_corpus_mixed_lengths_one_bucket(tmp_path):
    """Clips of DIFFERENT lengths in the same FRAME_BUCKET bucket must
    flush as ONE fused mega-batch (VERDICT r3 #7: real corpora have varying
    lengths) and stay byte-identical to per-clip encoding."""
    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    paths = []
    rng = np.random.default_rng(3)
    # lengths 0.25..0.62 s -> nf in [12..28], all within bucket ceil(nf/64)=1
    for i, sec in enumerate([0.25, 0.33, 0.41, 0.5, 0.62]):
        x = corpus._synth_corpus(1, sec, seed=100 + i)[0]
        p = os.path.join(str(indir), f"len{i}.wav")
        audiofile.write_wav(p, x, 44100)
        paths.append(p)
    stats = corpus.run_corpus(paths, str(outdir), {"bitrate": 128000})
    assert stats["encoded"] == 5
    assert stats["batches"] == 1, "mixed lengths should share one bucket"

    from mrcaudiocodec_tpu.models import codec as tcodec
    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    for i, p in enumerate(paths):
        x, _ = audiofile.read_wav(p, raw_int16=True)
        with open(outdir / f"len{i}.mrc", "rb") as f:
            assert f.read() == tcodec.encode(x, cfg), f"clip {i} differs"


def test_run_corpus_basename_collision(tmp_path):
    """Two sources with the same basename must both be written (suffix
    de-collision), not silently overwrite each other."""
    ina, inb = tmp_path / "a", tmp_path / "b"
    outdir = tmp_path / "out"
    ina.mkdir(), inb.mkdir()
    xa = corpus._synth_corpus(1, 0.3, seed=1)[0]
    xb = corpus._synth_corpus(1, 0.3, seed=2)[0]
    pa, pb = str(ina / "same.wav"), str(inb / "same.wav")
    audiofile.write_wav(pa, xa, 44100)
    audiofile.write_wav(pb, xb, 44100)
    stats = corpus.run_corpus([pa, pb], str(outdir), {"bitrate": 96000})
    assert stats["encoded"] == 2
    outs = sorted(os.path.basename(p) for p in glob.glob(str(outdir / "*.mrc")))
    assert outs == ["same.1.mrc", "same.mrc"]
    with open(tmp_path / "out" / "manifest.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert {r["src"] for r in recs} == {pa, pb}
    assert len({r["dst"] for r in recs}) == 2
    # resume run touches nothing
    s2 = corpus.run_corpus([pa, pb], str(outdir), {"bitrate": 96000})
    assert s2["encoded"] == 0 and s2["skipped"] == 2


@pytest.mark.devicepack
def test_fused_int16_batch_matches_float(tmp_path):
    """int16 mega-batch rows produce the same streams as the float path."""
    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    clips = corpus._synth_corpus(3, 0.4, seed=5)
    as_i16 = [np.clip(np.round(c * 32768.0), -32768, 32767).astype(np.int16)
              for c in clips]
    as_f32 = [i.astype(np.float32) / np.float32(32768.0) for i in as_i16]
    out_i = corpus.encode_batch(as_i16, cfg)
    out_f = corpus.encode_batch(as_f32, cfg)
    assert out_i == out_f
