"""Production-gate probe for the quant Pallas kernel (VERDICT r2 #1a/c).

1. kernel-vs-XLA equality at the remaining production candidate shapes
   (G=4 refine blocks, G=1 fallback) on hardware;
2. full 30 s stereo encode with MRC_PALLAS_QUANT on vs off -> byte
   equality + wall time both ways.

Run from the repo root on the TPU: python scripts/tpu_quant_prod.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402

from mrcaudiocodec_tpu import config as C              # noqa: E402
from mrcaudiocodec_tpu import tables as T              # noqa: E402
from mrcaudiocodec_tpu.ops import dsp, rd              # noqa: E402
from mrcaudiocodec_tpu.ops.pallas import quant_kernel  # noqa: E402


def kernel_shapes():
    FS = 44100
    rng = np.random.default_rng(7)
    NF = 128
    fr = jnp.asarray((0.3 * rng.standard_normal((NF, C.LONG_SIZE))
                      ).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, 5, NF).astype(np.int32))
    coeffs = dsp.analyze(fr, bt)
    nb = T.unified_layout(FS)["nb"]
    amp = jnp.asarray((rng.integers(0, 13, (NF, nb)) * 2).astype(np.int32))
    for g in (1, 4, 8):
        base = rng.integers(C.GAIN_MIN, C.GAIN_MAX - g + 1,
                            NF).astype(np.int32)
        gains = jnp.asarray(base[:, None] + np.arange(g, dtype=np.int32))
        ref = np.asarray(jax.jit(
            lambda c, a, gg, b: rd._bits_for_gains(c, a, gg, b, FS))(
                coeffs, amp, gains, bt))
        got = np.asarray(jax.jit(
            lambda c, a, gg, b: quant_kernel.bits_for_gains(
                c, a, gg, b, FS))(coeffs, amp, gains, bt))
        neq = ref != got
        print(f"G={g}: mismatches {int(neq.sum())}/{neq.size}", flush=True)


def make_clip(fs=44100, seconds=30.0, seed=3):
    rng = np.random.default_rng(seed)
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = np.zeros(n, np.float32)
    for f0, a in [(220, 0.3), (554, 0.18), (1320, 0.1), (3520, 0.06)]:
        x += (a * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    x += (0.02 * rng.standard_normal(n)).astype(np.float32)
    for pos in range(fs // 2, n - 200, int(0.9 * fs)):
        x[pos:pos + 64] += (0.5 * rng.standard_normal(64)).astype(np.float32)
    x = np.clip(x, -1, 1)
    return np.stack([x, np.roll(x, 7) * 0.9], axis=1)


def full_encode():
    from mrcaudiocodec_tpu.config import CodecConfig
    from mrcaudiocodec_tpu.models import encoder
    cfg = CodecConfig(fs=44100, channels=2, bitrate=128000)
    x = make_clip()

    streams = {}
    for flag in ("0", "1"):
        os.environ["MRC_PALLAS_QUANT"] = flag
        # the flag is read at TRACE time inside cached jits, so the cache
        # MUST be dropped between settings or the second leg silently
        # re-runs the first flag's executable (ADVICE r3 #2 — the old
        # artifact's 'byte-identical' was vacuous for exactly that reason)
        jax.clear_caches()
        bs = encoder.encode(x, cfg)         # warm-up/compile
        t0 = time.perf_counter()
        for _ in range(3):
            bs = encoder.encode(x, cfg)
        dt = (time.perf_counter() - t0) / 3
        streams[flag] = bs
        print(f"MRC_PALLAS_QUANT={flag}: {dt:.3f}s "
              f"({30.0 / dt:.1f}x RT)", flush=True)
    print("streams byte-identical:", streams["0"] == streams["1"],
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    kernel_shapes()
    full_encode()
