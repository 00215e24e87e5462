"""Multi-host launch helpers (SURVEY.md §2b N11, acceptance config 5).

There is no hand-written communication backend: `jax.distributed` wires the
hosts together and XLA compiles the collectives — `ppermute`/`all_gather`
over ICI inside a slice, DCN across slices. The mesh construction in
parallel/mesh.py keeps the chatty 'seq' axis innermost so halo exchange and
reservoir carries ride ICI; only independent-clip sharding crosses DCN.

Typical 2-host v5e-16 run (BASELINE.json:11):

    # on every host (coordinator = host 0):
    python -m mrcaudiocodec_tpu.parallel.launch corpus \
        --coordinator 10.0.0.1:8476 --num-hosts 2 --host-id $ID \
        --indir wavs/ --outdir out/

Each host reads and packs only the clips assigned to it (round-robin by
clip index), so file I/O scales with hosts; the device mesh spans all
chips and every encode step runs SPMD over P('data','seq').
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def initialize(coordinator: str | None, num_hosts: int, host_id: int):
    """jax.distributed init (no-op for single-host runs).

    MRC_FORCE_CPU=1 pins the CPU platform BEFORE backend init (the
    sandbox's axon sitecustomize overrides JAX_PLATFORMS=cpu from the
    environment, but a jax.config update after import wins — same trick
    as tests/conftest.py) so a multi-host launch can be exercised as N
    localhost processes: scripts/run_multihost_cpu.py."""
    import os

    import jax

    if os.environ.get("MRC_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    if num_hosts > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_hosts,
            process_id=host_id,
        )
    return jax


def scaling_bench(seconds: float, n_clips: int, bitrate: int,
                  n_seq: int = 1, trials: int = 3,
                  align_slabs: bool = True):
    """frames/s over all local+remote devices for a synthetic corpus.

    Returns a dict with frames/s and the per-device efficiency baseline
    (frames/s at n_devices=1 measured in the same process).

    align_slabs rounds the clip length so every shard's frame count is a
    multiple of ops/blocking.DECISION_BLOCK. Constant-work comparisons
    REQUIRE this: the decision stages run in fixed 128-frame slabs, so a
    shard owning e.g. 260 frames pads to 384 (+48% arithmetic) while the
    unsharded run pads 2080 to only 2176 (+5%) — that padding asymmetry,
    not the halo/reservoir collectives, was the whole of the r4 artifact's
    apparent 14% dp_8x1 'SPMD overhead' (r5 measurement: with aligned
    shards both mesh shapes run >= 1.0x the single-device wall; with
    collectives force-disabled the unaligned overhead is unchanged)."""
    import jax

    from .. import config as C
    from ..config import CodecConfig
    from ..ops.blocking import DECISION_BLOCK
    from . import mesh as pmesh
    from .sharded import sharded_encode_step
    from ..corpus import _synth_corpus

    cfg = CodecConfig(fs=44100, channels=1, bitrate=bitrate)
    if align_slabs:
        # every seq shard must own a multiple of DECISION_BLOCK frames and
        # at least two slabs (map_frame_blocks pads below that)
        unit = max(n_seq, 1) * DECISION_BLOCK * 2
        nf_target = max(unit, int(44100 * seconds) // C.HOP // unit * unit)
        seconds = (nf_target - 1) * C.HOP / 44100.0
    clips = _synth_corpus(n_clips, seconds, channels=1)
    n = clips[0].shape[0]
    nf = cfg.frames_for_samples(n)

    ndev = jax.device_count()
    n_data = ndev // n_seq
    results = {}
    cases = [("1dev", 1, 1), ("all", n_data, n_seq)]
    if jax.process_count() > 1:
        # a 1-device mesh is not constructible under a multi-process
        # launch (every process must own part of every global array);
        # the single-process run of the same mesh provides the baseline
        cases = cases[1:]
    for label, nd, ns in cases:
        if nd * ns > ndev:
            continue
        mesh = pmesh.make_mesh(nd, ns, devices=jax.devices()[:nd * ns])
        # pad clip count to the data axis
        reps = -(-n_clips // nd) * nd
        xp = np.zeros((reps, nf * C.HOP), np.float32)
        for i, cl in enumerate(clips):
            xp[i, :n] = cl[:, 0]
        step = sharded_encode_step(mesh, cfg, nf)
        # device_put straight from the (identical-on-every-process) host
        # array: each process populates only its addressable shards
        xd = jax.device_put(xp, pmesh.seq_sharding(mesh))
        out = step(xd)
        jax.block_until_ready(out)          # compile + warm
        dt = 1e30
        for _ in range(trials):             # best-of: the virtual devices
            t0 = time.perf_counter()        # share cores with the OS
            out = step(xd)
            jax.block_until_ready(out)
            dt = min(dt, time.perf_counter() - t0)
        results[label] = {
            "devices": nd * ns,
            "frames_per_s": reps * nf / dt,
            "wall_s": dt,
            "nf_per_clip": int(nf),
        }
    if "1dev" in results and "all" in results:
        r1, ra = results["1dev"], results["all"]
        results["scaling_efficiency"] = (
            ra["frames_per_s"] / (r1["frames_per_s"] * ra["devices"]))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mrcaudiocodec_tpu.parallel.launch")
    sub = ap.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("corpus")
    pc.add_argument("--coordinator", default=None)
    pc.add_argument("--num-hosts", type=int, default=1)
    pc.add_argument("--host-id", type=int, default=0)
    pc.add_argument("--indir", required=True)
    pc.add_argument("--outdir", required=True)
    pc.add_argument("--bitrate", type=int, default=128)
    ps = sub.add_parser("scaling")
    ps.add_argument("--coordinator", default=None)
    ps.add_argument("--num-hosts", type=int, default=1)
    ps.add_argument("--host-id", type=int, default=0)
    ps.add_argument("--seconds", type=float, default=10.0)
    ps.add_argument("--clips", type=int, default=16)
    ps.add_argument("--bitrate", type=int, default=128)
    ps.add_argument("--n-seq", type=int, default=1)
    args = ap.parse_args(argv)

    initialize(args.coordinator, args.num_hosts, args.host_id)

    if args.cmd == "scaling":
        out = scaling_bench(args.seconds, args.clips, args.bitrate * 1000,
                            args.n_seq)
        print(json.dumps(out))
        return 0

    import glob
    import os

    from ..corpus import run_corpus
    paths = sorted(glob.glob(os.path.join(args.indir, "*.wav")))
    mine = [p for i, p in enumerate(paths)
            if i % args.num_hosts == args.host_id]
    stats = run_corpus(mine, args.outdir, {"bitrate": args.bitrate * 1000},
                       manifest_path=os.path.join(
                           args.outdir, f"manifest_h{args.host_id}.jsonl"))
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
