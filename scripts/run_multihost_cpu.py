"""Execute acceptance config 5's code path as TWO localhost processes
(VERDICT r2 #2 / r3 #4: `launch.py corpus --num-hosts 2` had never run):
each process is one "host" with 4 virtual CPU devices, wired together by
jax.distributed.initialize through a localhost coordinator, round-robin
clip split, per-host manifests.

    python scripts/run_multihost_cpu.py [--round 4]

Verifies afterwards (in THIS process, on the normative per-clip path):
  * the two manifests exactly partition the corpus (disjoint, complete)
  * every emitted .mrc is byte-identical to single-process encode
and writes MULTIHOST_r{N}.json at the repo root.
"""
import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

COORD_PORT = 12739
N_CLIPS = 10


def scaling_main(args):
    """Constant-work multi-process scaling (VERDICT r4 next-step 10):
    the SAME 8-device global mesh and the SAME synthetic corpus run once
    as ONE process owning all 8 virtual devices and once as TWO
    jax.distributed processes owning 4 each — so the wall ratio isolates
    the multi-process overhead (Gloo collectives, cross-process
    dispatch) at constant global work and constant device count.
    Writes MULTIHOST_SCALING_r{N}.json."""
    common = ["scaling", "--seconds", str(args.seconds),
              "--clips", "8", "--bitrate", "128", "--n-seq", "1"]
    runs = {}
    for tag, nprocs, devs in (("one_process", 1, 8), ("two_processes", 2, 4)):
        env = dict(os.environ)
        env["MRC_FORCE_CPU"] = "1"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={devs}").strip()
        procs = []
        for hid in range(nprocs):
            cmd = [sys.executable, "-m", "mrcaudiocodec_tpu.parallel.launch",
                   *common, "--num-hosts", str(nprocs),
                   "--host-id", str(hid)]
            if nprocs > 1:
                cmd += ["--coordinator", f"127.0.0.1:{COORD_PORT + 1}"]
            procs.append(subprocess.Popen(cmd, env=env,
                                          stdout=subprocess.PIPE,
                                          stderr=subprocess.PIPE, text=True))
        outs = []
        for hid, p in enumerate(procs):
            out, err = p.communicate(timeout=900)
            if p.returncode != 0:
                sys.stderr.write(err)
                raise SystemExit(f"{tag} host {hid} failed")
            outs.append(json.loads(out.strip().splitlines()[-1]))
        walls = [o["all"]["wall_s"] for o in outs]
        runs[tag] = {"processes": nprocs, "devices_per_process": devs,
                     "global_devices": 8,
                     "wall_s": max(walls),        # slowest process gates
                     "per_process": outs}
        print(tag, json.dumps(runs[tag]["wall_s"]), flush=True)
    eff = runs["one_process"]["wall_s"] / runs["two_processes"]["wall_s"]
    result = {
        "backend": "cpu-virtual",
        "methodology": ("constant total work, constant 8-device global "
                        "mesh; one process owning 8 virtual devices vs "
                        "two jax.distributed (Gloo) processes owning 4 "
                        "each; efficiency = wall_1proc / wall_2proc "
                        "(1.0 = zero multi-process overhead)"),
        "multiprocess_efficiency": round(eff, 4),
        **runs,
    }
    path = f"MULTIHOST_SCALING_r{args.round:02d}.json"
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", path, json.dumps(result)[:200])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--seconds", type=float, default=0.6)
    ap.add_argument("--mode", choices=["corpus", "scaling"],
                    default="corpus")
    args = ap.parse_args()
    if args.mode == "scaling":
        if args.seconds == 0.6:
            args.seconds = 6.0
        return scaling_main(args)

    tmp = tempfile.mkdtemp(prefix="mrc_mh_")
    indir = os.path.join(tmp, "in")
    outdir = os.path.join(tmp, "out")
    os.makedirs(indir)

    # synthesize a small mixed-length corpus (pure NumPy, no jax here yet)
    import numpy as np

    from mrcaudiocodec_tpu.corpus import _synth_corpus
    from mrcaudiocodec_tpu.spec import audiofile

    paths = []
    for i in range(N_CLIPS):
        sec = args.seconds * (1.0 + 0.3 * (i % 3))
        x = _synth_corpus(1, sec, seed=50 + i)[0]
        p = os.path.join(indir, f"clip{i:02d}.wav")
        audiofile.write_wav(p, x, 44100)
        paths.append(p)

    env = dict(os.environ)
    env["MRC_FORCE_CPU"] = "1"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    procs = []
    t0 = time.perf_counter()
    for hid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mrcaudiocodec_tpu.parallel.launch",
             "corpus", "--coordinator", f"127.0.0.1:{COORD_PORT}",
             "--num-hosts", "2", "--host-id", str(hid),
             "--indir", indir, "--outdir", outdir, "--bitrate", "128"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    stats = []
    for hid, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        print(f"--- host {hid} rc={p.returncode}")
        sys.stdout.write(out)
        if p.returncode != 0:
            sys.stderr.write(err)
            raise SystemExit(f"host {hid} failed")
        stats.append(json.loads(out.strip().splitlines()[-1]))
    wall = time.perf_counter() - t0

    # --- verify: manifests partition the corpus
    srcs = [set(), set()]
    for hid in range(2):
        with open(os.path.join(outdir, f"manifest_h{hid}.jsonl")) as f:
            for line in f:
                srcs[hid].add(json.loads(line)["src"])
    assert srcs[0].isdisjoint(srcs[1]), "hosts encoded overlapping clips"
    assert srcs[0] | srcs[1] == set(paths), "corpus not fully covered"
    expected = {p for i, p in enumerate(paths) if i % 2 == 0}
    assert srcs[0] == expected, "round-robin split mismatch"

    # --- verify: streams byte-identical to single-process per-clip encode
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mrcaudiocodec_tpu.config import CodecConfig
    from mrcaudiocodec_tpu.models import codec as tcodec

    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    n_checked = 0
    for p in paths:
        x, _ = audiofile.read_wav(p, raw_int16=True)
        base = os.path.splitext(os.path.basename(p))[0]
        with open(os.path.join(outdir, base + ".mrc"), "rb") as f:
            got = f.read()
        want = tcodec.encode(x, cfg)
        assert got == want, f"{p}: multi-host stream differs from per-clip"
        n_checked += 1

    result = {
        "hosts": 2, "devices_per_host": 4, "backend": "cpu-virtual",
        "clips": N_CLIPS, "clips_checked_byte_identical": n_checked,
        "manifest_partition_ok": True,
        "wall_seconds": round(wall, 2),
        "per_host_stats": stats,
    }
    path = f"MULTIHOST_r{args.round:02d}.json"
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", path, json.dumps(result))


if __name__ == "__main__":
    main()
