"""Verify the xmath fixed-sequence MDCT arithmetic is BITWISE identical
between NumPy (the normative spec) and XLA:TPU / the jnp engine path, at
every production shape — the keystone of the spec<->engine byte-equality
contract (VERDICT r2 #3). Also runs a full spec-vs-engine encode byte
comparison on the TPU.

Run from the repo root on the TPU:  python scripts/tpu_xmath_probe.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402

from mrcaudiocodec_tpu import config as C              # noqa: E402
from mrcaudiocodec_tpu import xmath                    # noqa: E402


def bitcmp(name, a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    neq = (a.view(np.uint32) != b.view(np.uint32))
    status = "BITWISE EQUAL" if not neq.any() else f"{int(neq.sum())}/{neq.size} DIFF"
    print(f"{name}: {status}", flush=True)
    if neq.any():
        idx = np.argwhere(neq)[:4]
        for i in idx:
            i = tuple(i)
            print(f"   at {i}: np={a[i]!r} dev={b[i]!r}", flush=True)
    return not neq.any()


def main():
    print("devices:", jax.devices(), "backend:", jax.default_backend(),
          flush=True)
    rng = np.random.default_rng(11)
    ok = True

    # 1. roll-form dct_iv (the TPU production path) at the two production
    # sizes, several batch shapes, vs the normative NumPy Stockham chain
    for m, shapes in [(1024, [(1, 1024), (37, 1024), (1024, 1024)]),
                      (128, [(5, 8, 128), (128, 8, 128)])]:
        for shape in shapes:
            u = (0.6 * rng.standard_normal(shape)).astype(np.float32)
            ref = xmath.dct_iv(u, np)
            got = jax.jit(lambda v: xmath.dct_iv_fast(v, jnp))(u)
            ok &= bitcmp(f"dct_iv_fast m={m} shape={shape}", ref, got)

    # 2. full windowed chains (the exact normative sequences, roll form)
    from mrcaudiocodec_tpu import tables as T
    w_long = T.long_windows("sine")[C.LONG].astype(np.float32)
    w_short = T.short_window("sine").astype(np.float32)
    fr = (0.5 * rng.standard_normal((129, C.LONG_SIZE))).astype(np.float32)
    ref = xmath.mdct_windowed(fr, w_long[None, :], np)
    got = jax.jit(lambda v: xmath.mdct_windowed_fast(
        v, jnp.asarray(np.broadcast_to(w_long[None, :], v.shape)), jnp))(fr)
    ok &= bitcmp("mdct_windowed_fast long [129]", ref, got)

    sub = (0.5 * rng.standard_normal((64, 8, 2 * C.SHORT_COEFFS))
           ).astype(np.float32)
    ref = xmath.mdct_windowed(sub, w_short[None, None, :], np)
    got = jax.jit(lambda v: xmath.mdct_windowed_fast(
        v, jnp.asarray(np.broadcast_to(w_short[None, None, :], v.shape)),
        jnp))(sub)
    ok &= bitcmp("mdct_windowed_fast short [64,8]", ref, got)

    x = (3.0 * rng.standard_normal((129, C.LONG_COEFFS))).astype(np.float32)
    ref = xmath.imdct_windowed(x, np.broadcast_to(
        w_long[None, :], (129, C.LONG_SIZE)), np)
    got = jax.jit(lambda v: xmath.imdct_windowed_fast(v, jnp.asarray(
        np.broadcast_to(w_long[None, :], (v.shape[0], C.LONG_SIZE))), jnp))(x)
    ok &= bitcmp("imdct_windowed_fast long [129]", ref, got)

    # 3. full engine analyze vs spec analyze_frame, all block types
    from mrcaudiocodec_tpu.ops import dsp as jdsp
    from mrcaudiocodec_tpu.spec import dsp as sdsp
    frames = (0.5 * rng.standard_normal((130, C.LONG_SIZE))).astype(np.float32)
    bt = np.resize(np.arange(5, dtype=np.int32), 130)
    ref = np.stack([sdsp.analyze_frame(frames[f], int(bt[f]))
                    for f in range(len(bt))])
    got = jdsp.analyze(jnp.asarray(frames), jnp.asarray(bt))
    ok &= bitcmp("ops.dsp.analyze vs spec.analyze_frame [130]", ref, got)

    # 4. full encode: spec stream vs TPU engine stream, 4 s stereo
    from mrcaudiocodec_tpu.config import CodecConfig
    from mrcaudiocodec_tpu.models import encoder
    from mrcaudiocodec_tpu.spec import codec as scodec
    fs = 44100
    n = 4 * fs
    t = np.arange(n) / fs
    x1 = (0.4 * np.sin(2 * np.pi * 330 * t)
          + 0.15 * np.sin(2 * np.pi * 2470 * t)).astype(np.float32)
    x1 += (0.02 * rng.standard_normal(n)).astype(np.float32)
    x1[n // 3:n // 3 + 80] += (0.5 * rng.standard_normal(80)
                               ).astype(np.float32)
    x1 = np.clip(x1, -1, 1)
    x = np.stack([x1, np.roll(x1, 9) * 0.9], axis=1)
    cfg = CodecConfig(fs=fs, channels=2, bitrate=128000)
    bs_spec = scodec.encode(x, cfg)
    bs_eng = encoder.encode(x, cfg)
    print(f"full encode byte-identical: {bs_spec == bs_eng} "
          f"({len(bs_spec)} bytes)", flush=True)
    ok &= bs_spec == bs_eng
    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)


if __name__ == "__main__":
    main()
