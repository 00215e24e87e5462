"""Record the scaling artifact (BASELINE.json:5,11 ">=90% linear" target;
VERDICT r1 #10 / r2 #2 / r3 #3): measure sharded-encode frames/s at
1 device vs the full 8-virtual-device CPU mesh — both pure-DP (8,1) and a
mixed (2,4) data x seq shape — and write SCALING_r{N}.json at the repo root.

    python scripts/run_scaling.py [--round 4]

CPU-virtual-device numbers measure SPMD overhead (partitioning, halo
ppermute, reservoir all_gather), not ICI bandwidth — but they are the only
multi-device measurement this single-chip sandbox can produce, and the
collective pattern is identical to the real-slice one (SURVEY.md §4).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mrcaudiocodec_tpu.parallel.launch import scaling_bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--seconds", type=float, default=24.0)
    ap.add_argument("--clips", type=int, default=8)
    args = ap.parse_args()

    assert jax.device_count() == 8, jax.devices()
    out = {
        "backend": "cpu-virtual", "devices": 8,
        "seconds_per_clip": args.seconds, "clips": args.clips,
        "note_alignment": ("clip lengths are slab-aligned so every shard owns a "
                 "multiple of ops/blocking.DECISION_BLOCK frames; without "
                 "this the fixed-slab padding (not the collectives) "
                 "dominates and masquerades as SPMD overhead — see "
                 "parallel/launch.scaling_bench docstring"),
        "note": ("8 virtual devices SHARE one CPU's cores, so frames/s "
                 "cannot scale with device count here; the meaningful "
                 "number is spmd_efficiency = wall(1 device) / wall(8-way "
                 "sharded) at CONSTANT total work — 1.0 means the "
                 "partitioned program (halo ppermute, reservoir "
                 "all_gather, sharded layouts) adds zero overhead over "
                 "the single-device program, which is what transfers to "
                 "real multi-chip ICI scaling."),
    }
    for label, n_seq in (("dp_8x1", 1), ("mixed_2x4", 4)):
        r = scaling_bench(args.seconds, args.clips, 128000, n_seq=n_seq)
        r["spmd_efficiency"] = r["1dev"]["wall_s"] / r["all"]["wall_s"]
        out[label] = r
        print(label, json.dumps(r), flush=True)
    path = f"SCALING_r{args.round:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
