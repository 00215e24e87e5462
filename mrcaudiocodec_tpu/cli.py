"""Command-line entry points (reference component R16, SURVEY.md §2).

    python -m mrcaudiocodec_tpu.cli encode in.wav out.mrc --bitrate 128 \
        [--engine spec|tpu] [--no-window-switching] [--no-psycho] \
        [--no-reservoir]
    python -m mrcaudiocodec_tpu.cli decode in.mrc out.wav [--engine spec|tpu]
    python -m mrcaudiocodec_tpu.cli info in.mrc

`--engine spec` runs the normative NumPy codec; `--engine tpu` (default)
runs the JAX/XLA path (falls back to spec with a warning if jax is
unavailable).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .config import CodecConfig
from .spec import audiofile, bitstream


def _build_cfg(args, fs: int, channels: int) -> CodecConfig:
    return CodecConfig(
        fs=fs,
        channels=channels,
        bitrate=args.bitrate * 1000,
        window_switching=not args.no_window_switching,
        full_psycho=not args.no_psycho,
        reservoir=not args.no_reservoir,
        window=args.window,
    )


def _get_engine(name: str):
    if name == "spec":
        from .spec import codec as eng
        return eng, "spec"
    try:
        from .models import codec as eng   # JAX path
        return eng, "tpu"
    except Exception as e:                 # pragma: no cover
        print(f"warning: tpu engine unavailable ({e}); using spec",
              file=sys.stderr)
        from .spec import codec as eng
        return eng, "spec"


def cmd_encode(args) -> int:
    eng, name = _get_engine(args.engine)
    x, fs = audiofile.read_wav(args.infile, raw_int16=(name == "tpu"))
    cfg = _build_cfg(args, fs, x.shape[1])
    t0 = time.perf_counter()
    data = eng.encode(x, cfg)
    dt = time.perf_counter() - t0
    with open(args.outfile, "wb") as f:
        f.write(data)
    dur = x.shape[0] / fs
    kbps = len(data) * 8 / dur / 1000
    print(f"[{name}] encoded {dur:.2f}s {cfg.channels}ch @{fs}Hz -> "
          f"{len(data)} bytes ({kbps:.1f} kbps) in {dt:.2f}s "
          f"({dur / dt:.2f}x realtime)")
    return 0


def cmd_decode(args) -> int:
    with open(args.infile, "rb") as f:
        data = f.read()
    eng, name = _get_engine(args.engine)
    t0 = time.perf_counter()
    if name == "tpu":
        x, cfg = eng.decode(data, pcm_dtype="int16")
    else:
        x, cfg = eng.decode(data)
    dt = time.perf_counter() - t0
    audiofile.write_wav(args.outfile, x, cfg.fs)
    dur = x.shape[0] / cfg.fs
    print(f"[{name}] decoded {dur:.2f}s {cfg.channels}ch @{cfg.fs}Hz "
          f"in {dt:.2f}s ({dur / dt:.2f}x realtime)")
    return 0


def cmd_info(args) -> int:
    with open(args.infile, "rb") as f:
        data = f.read()
    cfg, nf, ns, _ = bitstream.read_header(data)
    dur = ns / cfg.fs
    print(f"MRC1 stream: {cfg.fs} Hz, {cfg.channels} ch, "
          f"{cfg.bitrate / 1000:.0f} kbps target, {nf} frames, "
          f"{ns} samples ({dur:.2f}s)")
    print(f"  window_switching={cfg.window_switching} "
          f"full_psycho={cfg.full_psycho} reservoir={cfg.reservoir} "
          f"window={cfg.window}")
    print(f"  actual rate: {len(data) * 8 / dur / 1000:.1f} kbps")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mrcaudiocodec_tpu",
                                description="MRC1 TPU-native perceptual audio codec")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode", help="encode WAV -> MRC1")
    pe.add_argument("infile")
    pe.add_argument("outfile")
    pe.add_argument("--bitrate", type=int, default=128,
                    help="target bitrate in kbps (total)")
    pe.add_argument("--engine", choices=["spec", "tpu"], default="tpu")
    pe.add_argument("--window", choices=["sine", "kbd"], default="sine")
    pe.add_argument("--no-window-switching", action="store_true")
    pe.add_argument("--no-psycho", action="store_true")
    pe.add_argument("--no-reservoir", action="store_true")
    pe.set_defaults(fn=cmd_encode)

    pd = sub.add_parser("decode", help="decode MRC1 -> WAV")
    pd.add_argument("infile")
    pd.add_argument("outfile")
    pd.add_argument("--engine", choices=["spec", "tpu"], default="tpu")
    pd.set_defaults(fn=cmd_decode)

    pi = sub.add_parser("info", help="print MRC1 stream info")
    pi.add_argument("infile")
    pi.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    except (ValueError, EOFError) as e:
        print(f"error: invalid input: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
