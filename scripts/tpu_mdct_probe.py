"""Diagnose the MDCT Pallas kernel's 74x loss to XLA (VERDICT r1 #3).

Times the XLA analyze path vs pallas variants over BLOCK_F x precision on
the real TPU. Run:  python scripts/tpu_mdct_probe.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from mrcaudiocodec_tpu import config as C                   # noqa: E402
from mrcaudiocodec_tpu import tables as T                   # noqa: E402
from mrcaudiocodec_tpu.ops import dsp                       # noqa: E402
from mrcaudiocodec_tpu.ops.pallas import mdct_kernel        # noqa: E402


def sync(o):
    np.asarray(jax.tree.leaves(o)[0].ravel()[:1])


def bench(fn, n=20):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn()
    sync(o)
    return (time.perf_counter() - t0) / n


def make_variant(block_f: int, precision):
    win, basis = mdct_kernel._consts("sine")

    def kern(frames_ref, bt_ref, win_ref, basis_ref, out_ref):
        fr = frames_ref[:]
        bt = bt_ref[:, 0]
        w = jnp.zeros_like(fr)
        for t in range(C.N_BLOCK_TYPES):
            sel = (bt == t).astype(fr.dtype)[:, None]
            w = w + sel * win_ref[t, :][None, :]
        out_ref[:] = jax.lax.dot_general(
            fr * w, basis_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)

    def call(frames, bt):
        nf = frames.shape[0]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nf, C.LONG_COEFFS), jnp.float32),
            grid=(nf // block_f,),
            in_specs=[
                pl.BlockSpec((block_f, C.LONG_SIZE), lambda i: (i, 0)),
                pl.BlockSpec((block_f, 1), lambda i: (i, 0)),
                pl.BlockSpec((C.N_BLOCK_TYPES, C.LONG_SIZE),
                             lambda i: (0, 0)),
                pl.BlockSpec((C.LONG_SIZE, C.LONG_COEFFS), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_f, C.LONG_COEFFS),
                                   lambda i: (i, 0)),
        )(frames.astype(jnp.float32),
          bt.astype(jnp.int32).reshape(nf, 1), win, basis)
    return call


def main():
    print("devices:", jax.devices(), flush=True)
    nf = 1024
    rng = np.random.default_rng(0)
    fr = jnp.asarray((0.3 * rng.standard_normal((nf, C.LONG_SIZE))
                      ).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, 5, nf).astype(np.int32))

    ref_fn = jax.jit(lambda f, b: dsp.analyze(f, b))
    t_ref = bench(lambda: ref_fn(fr, bt))
    ref = np.asarray(ref_fn(fr, bt))
    print(f"XLA analyze[{nf}]: {t_ref*1e3:.2f} ms", flush=True)
    # pure long-window XLA matmul for the speed-of-light anchor
    w0 = jnp.asarray(mdct_kernel._consts("sine")[0][0])
    b0 = jnp.asarray(mdct_kernel.folded_basis())
    mm = jax.jit(lambda f: (f * w0[None, :]) @ b0)
    t_mm = bench(lambda: mm(fr))
    print(f"XLA bare long matmul[{nf}]: {t_mm*1e3:.2f} ms", flush=True)

    mask = np.asarray(bt) != C.SHORT
    for block_f in (64, 128, 256):
        for pname, prec in (("DEFAULT", jax.lax.Precision.DEFAULT),
                            ("HIGHEST", jax.lax.Precision.HIGHEST)):
            try:
                call = make_variant(block_f, prec)
                fn = jax.jit(call)
                out = fn(fr, bt)
                sync(out)
                t = bench(lambda: fn(fr, bt))
                err = np.abs(np.asarray(out)[mask] - ref[mask]).max()
                print(f"pallas BF={block_f} prec={pname}: {t*1e3:.2f} ms "
                      f"(max|err| long rows {err:.2e})", flush=True)
            except Exception as e:
                print(f"pallas BF={block_f} prec={pname}: FAIL "
                      f"{repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
