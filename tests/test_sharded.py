"""Distributed-vs-single-device equality (SURVEY.md §4): the sharded encode
must reproduce the unsharded decisions exactly, on an 8-virtual-device CPU
mesh (conftest forces XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcaudiocodec_tpu import config as C
from mrcaudiocodec_tpu.config import CodecConfig
from mrcaudiocodec_tpu.parallel import mesh as pmesh
from mrcaudiocodec_tpu.parallel.sharded import sharded_encode_step
from mrcaudiocodec_tpu.models import encoder
from mrcaudiocodec_tpu.spec import reservoir as sres


def _clips(n_clips, nf, fs=44100, seed=0):
    rng = np.random.default_rng(seed)
    n = (nf - 1) * C.HOP          # samples so that frames_for_samples == nf
    t = np.arange(n) / fs
    out = np.zeros((n_clips, n), np.float32)
    for c in range(n_clips):
        x = (0.4 * np.sin(2 * np.pi * (300 + 100 * c) * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        x[n // 3:n // 3 + 64] += (0.5 * rng.standard_normal(64)).astype(np.float32)
        out[c] = np.clip(x, -1, 1)
    return out


def _pad_for_shard(x, nf):
    """[B, n] signal -> [B, nf * HOP] padded layout for sharded_encode_step
    (global padded signal minus the leading priming hop)."""
    b, n = x.shape
    xp = np.zeros((b, nf * C.HOP), np.float32)
    xp[:, :n] = x
    return xp


@pytest.mark.parametrize("n_data,n_seq", [(1, 8), (2, 4), (8, 1)])
def test_sharded_equals_unsharded(n_data, n_seq):
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg = CodecConfig(fs=44100, channels=1, bitrate=96000)
    n_clips = max(n_data, 2)
    nf = 16 * n_seq // 1            # divisible by seq shards
    x = _clips(n_clips, nf)
    xp = _pad_for_shard(x, nf)

    mesh = pmesh.make_mesh(n_data, n_seq)
    step = sharded_encode_step(mesh, cfg, nf)
    xp_dev = jax.device_put(jnp.asarray(xp), pmesh.seq_sharding(mesh))
    q_s, amp_s, gain_s, bt_s, bits_s, cb_s = [np.asarray(v) for v in step(xp_dev)]
    q_s = q_s.reshape(n_clips, nf, -1)
    amp_s = amp_s.reshape(n_clips, nf, -1)
    gain_s = gain_s.reshape(n_clips, nf)
    bt_s = bt_s.reshape(n_clips, nf)

    # unsharded reference: the models/encoder pipeline per clip
    for c in range(n_clips):
        dec, nf2 = encoder.encode_arrays(x[c][:, None], cfg)
        assert nf2 == nf
        np.testing.assert_array_equal(bt_s[c], dec["bt"][0], f"clip {c} bt")
        np.testing.assert_array_equal(gain_s[c], dec["gain"][0],
                                      f"clip {c} gain")
        np.testing.assert_array_equal(amp_s[c], dec["amp"][0], f"clip {c} amp")
        np.testing.assert_array_equal(q_s[c], dec["q"][0], f"clip {c} q")


def test_halo_framing_matches_host():
    """The ppermute-halo framing reproduces spec frame windows EXACTLY.

    Runs just the halo-exchange + frame-extraction prefix of the sharded
    body under shard_map and compares every 2048-sample frame window
    byte-for-byte against spec.dsp.frame_signal (not a downstream proxy).
    """
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import PartitionSpec as P
    from mrcaudiocodec_tpu.spec.dsp import frame_signal

    nf = 24
    x = _clips(2, nf)
    mesh = pmesh.make_mesh(1, 8)

    def framing_only(xp):
        # mirror of parallel.sharded._shard_encode_body's framing prefix
        naxis = jax.lax.psum(1, "seq")
        idx = jax.lax.axis_index("seq")
        b_loc, f_loc = xp.shape[0], xp.shape[1] // C.HOP
        right = [(i, (i + 1) % naxis) for i in range(naxis)]
        halo = jax.lax.ppermute(xp[:, -C.HOP:], "seq", right)
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([halo, xp], axis=1)
        idxs = (np.arange(C.LONG_SIZE)[None, :]
                + C.HOP * np.arange(f_loc)[:, None])
        return ext[:, idxs]                      # [B, F_loc, 2048]

    sm = jax.jit(jax.shard_map(
        framing_only, mesh=mesh, in_specs=P("data", "seq"),
        out_specs=P("data", "seq", None), check_vma=False))
    xp = jax.device_put(jnp.asarray(_pad_for_shard(x, nf)),
                        pmesh.seq_sharding(mesh))
    frames_sharded = np.asarray(sm(xp))          # [2, nf, 2048]
    for c in range(x.shape[0]):
        host_frames = frame_signal(x[c])
        assert host_frames.shape[0] == nf
        np.testing.assert_array_equal(frames_sharded[c], host_frames,
                                      f"clip {c} frame windows")


def test_dryrun_multichip_entry():
    """The driver's multi-chip dryrun must keep working (VERDICT r1 #1)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    import importlib
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    g = importlib.import_module("__graft_entry__")
    g.dryrun_multichip(8)


@pytest.mark.parametrize("n_data,n_seq", [(1, 8), (2, 4), (8, 1)])
def test_sharded_decode_equals_unsharded(n_data, n_seq):
    """Decode-side N8 parity (VERDICT r3 #8): seq-sharded dequant + IMDCT
    + one ppermute overlap-add boundary must reproduce the single-device
    decoder's PCM BITWISE, at several mesh shapes."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from mrcaudiocodec_tpu.models import codec as tcodec
    from mrcaudiocodec_tpu.parallel.sharded import sharded_decode

    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    x = _clips(2, 20)
    xs = np.stack([x[0], x[1] * 0.8], axis=1)         # [n, 2] stereo
    bs = tcodec.encode(xs, cfg)
    y_ref, _ = tcodec.decode(bs)                      # chunked single-device
    mesh = pmesh.make_mesh(n_data, n_seq)
    y_sh, cfg2 = sharded_decode(bs, mesh)
    assert cfg2.channels == 2
    assert y_sh.shape == y_ref.shape
    np.testing.assert_array_equal(y_sh, y_ref,
                                  f"mesh ({n_data},{n_seq}) PCM differs")


def test_encode_batch_fused_matches_per_clip():
    """Fused batch encode must produce the same streams as per-clip encode."""
    from mrcaudiocodec_tpu.corpus import encode_batch, _synth_corpus
    from mrcaudiocodec_tpu.models import codec as tcodec
    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    clips = _synth_corpus(3, 0.5)
    fused = encode_batch(clips, cfg)
    for i, x in enumerate(clips):
        single = tcodec.encode(np.asarray(x, np.float32), cfg)
        assert fused[i] == single, f"clip {i} differs"
