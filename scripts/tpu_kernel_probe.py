"""Probe: compile + bench the Pallas kernels on the real TPU vs the XLA
reference paths (VERDICT r1 #2/#3). Run from the repo root:

    python scripts/tpu_kernel_probe.py [mdct|quant|all]

Emits timings to stdout; failures print the Mosaic error and continue.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from mrcaudiocodec_tpu import config as C              # noqa: E402
from mrcaudiocodec_tpu import tables as T              # noqa: E402
from mrcaudiocodec_tpu.ops import dsp, rd              # noqa: E402


def sync(o):
    leaves = jax.tree.leaves(o)
    np.asarray(leaves[0].ravel()[:1])


def bench(fn, n=10):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn()
    sync(o)
    return (time.perf_counter() - t0) / n


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    nf = 1024
    rng = np.random.default_rng(0)
    fr = jnp.asarray((0.3 * rng.standard_normal((nf, C.LONG_SIZE))
                      ).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, 5, nf).astype(np.int32))
    fs = 44100

    if what in ("mdct", "all"):
        print("== MDCT (normative xmath: Pallas kernel vs XLA roll form "
              "vs NumPy spec) ==", flush=True)
        import os
        from mrcaudiocodec_tpu import xmath
        # XLA roll form (MRC_PALLAS_MDCT=0 path)
        os.environ["MRC_PALLAS_MDCT"] = "0"
        ref_fn = jax.jit(lambda f, b: dsp.analyze(f, b))
        out_x = ref_fn(fr, bt)
        sync(out_x)
        t_ref = bench(lambda: ref_fn(fr, bt))
        print(f"XLA roll-form analyze[{nf}]: {t_ref*1e3:.2f} ms", flush=True)
        try:
            # fused Pallas FFT-stage kernel (default path)
            os.environ["MRC_PALLAS_MDCT"] = "1"
            k_fn = jax.jit(lambda f, b: dsp.analyze(f, b))
            out_k = k_fn(fr, bt)
            sync(out_k)
            t_k = bench(lambda: k_fn(fr, bt))
            print(f"Pallas analyze[{nf}]: {t_k*1e3:.2f} ms", flush=True)
            same = (np.asarray(out_k).view(np.uint32)
                    == np.asarray(out_x).view(np.uint32)).all()
            print("Pallas == XLA bitwise:", bool(same), flush=True)
            from mrcaudiocodec_tpu.spec import dsp as sdsp
            ref = np.stack([
                sdsp.analyze_frame(np.asarray(fr)[f], int(np.asarray(bt)[f]))
                for f in range(64)])
            same_np = (ref.view(np.uint32)
                       == np.asarray(out_k)[:64].view(np.uint32)).all()
            print("Pallas == NumPy spec bitwise [64]:", bool(same_np),
                  flush=True)
        except Exception as e:
            print("MDCT kernel FAILED:", repr(e)[:500], flush=True)
        finally:
            os.environ.pop("MRC_PALLAS_MDCT", None)

    if what in ("quant", "all"):
        print("== QUANT ==", flush=True)
        coeffs = dsp.analyze(fr, bt)
        nb = T.unified_layout(fs)["nb"]
        amp = jnp.zeros((nf, nb), jnp.int32)
        g = 8
        gains = jnp.broadcast_to(
            jnp.arange(40, 40 + g, dtype=jnp.int32)[None, :], (nf, g))
        ref_fn = jax.jit(lambda c, a, gg, b: rd._bits_for_gains(
            c, a, gg, b, fs))
        t_ref = bench(lambda: ref_fn(coeffs, amp, gains, bt))
        print(f"XLA _bits_for_gains[{nf},{g}]: {t_ref*1e3:.2f} ms",
              flush=True)
        try:
            from mrcaudiocodec_tpu.ops.pallas import quant_kernel
            k_fn = jax.jit(lambda c, a, gg, b: quant_kernel.bits_for_gains(
                c, a, gg, b, fs))
            out = k_fn(coeffs, amp, gains, bt)
            sync(out)
            t_k = bench(lambda: k_fn(coeffs, amp, gains, bt))
            print(f"Pallas bits_for_gains[{nf},{g}]: {t_k*1e3:.2f} ms",
                  flush=True)
            ref = np.asarray(ref_fn(coeffs, amp, gains, bt))
            got = np.asarray(out)
            print("exact match:", bool((ref == got).all()), flush=True)
        except Exception as e:
            print("QUANT kernel FAILED:", repr(e)[:2000], flush=True)


if __name__ == "__main__":
    main()
