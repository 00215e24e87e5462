"""Probe which lane-restructuring primitives the remote Mosaic compiler
accepts, to pick a workaround for the lane-splitting-reshape crash
([F,1024] -> [F,512,2] kills the compile; scripts/tpu_quant_bisect.py).

    python scripts/tpu_primitive_probe.py

Candidates:
  p0_reshape     control: the known-bad lane-splitting reshape
  p1_strided     strided lane slice x[:, ::2]
  p2_roll        pltpu.roll along the lane axis
  p3_deint_mm    deinterleave via constant 0/1 f32 matmul
  p4_evenmask    flat-lane even-position mask (iota % 2) + masked onehot dot
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

BLOCK_F = 32
NF = 64


def run(name, kernel, extra_specs=(), extra_args=(), out_cols=8):
    rng = np.random.default_rng(0)
    x = jnp.asarray((10.0 * rng.standard_normal((NF, 1024))
                     ).astype(np.float32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NF, out_cols), jnp.float32),
            grid=(NF // BLOCK_F,),
            in_specs=[pl.BlockSpec((BLOCK_F, 1024), lambda i: (i, 0))]
            + list(extra_specs),
            out_specs=pl.BlockSpec((BLOCK_F, out_cols), lambda i: (i, 0)),
        )(x, *extra_args)
        host = np.asarray(out)
        print(f"{name}: PASS sum={host.sum():.1f}", flush=True)
        return host
    except Exception as e:
        print(f"{name}: FAIL {repr(e)[:200]}", flush=True)
        return None


def p0_reshape(x_ref, out_ref):
    x = x_ref[:]
    bf = x.shape[0]
    v = x.reshape(bf, 512, 2).sum(axis=-1)
    out_ref[:] = jnp.broadcast_to(v.sum(axis=1, keepdims=True),
                                  out_ref.shape)


def p1_strided(x_ref, out_ref):
    x = x_ref[:]
    even = x[:, ::2]
    odd = x[:, 1::2]
    out_ref[:] = jnp.broadcast_to(
        (even + odd).sum(axis=1, keepdims=True), out_ref.shape)


def p2_roll(x_ref, out_ref):
    x = x_ref[:]
    nxt = pltpu.roll(x, shift=-1, axis=1)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    pair = jnp.where(iota % 2 == 0, x + nxt, 0.0)
    out_ref[:] = jnp.broadcast_to(pair.sum(axis=1, keepdims=True),
                                  out_ref.shape)


def p3_deint_mm(x_ref, e_ref, o_ref, out_ref):
    x = x_ref[:]
    even = jax.lax.dot_general(
        x, e_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    odd = jax.lax.dot_general(
        x, o_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = jnp.broadcast_to(
        (even + odd).sum(axis=1, keepdims=True), out_ref.shape)


def p4_evenmask(x_ref, tab_ref, out_ref):
    """Masked one-hot length lookup in flat [BF,1024] lane layout:
    sym = (x int in [0,9)) at even positions paired with rolled odd."""
    x = x_ref[:]
    m = jnp.clip(jnp.abs(x).astype(jnp.int32), 0, 8)
    nxt = pltpu.roll(m, shift=-1, axis=1)
    sym = m * 9 + nxt                                    # [BF,1024]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    valid = (iota % 2 == 0)
    bf = x.shape[0]
    r = bf * 1024
    it = jax.lax.broadcasted_iota(jnp.int32, (r, 81), 1)
    oh = ((sym.reshape(r, 1) == it)
          & valid.reshape(r, 1)).astype(jnp.bfloat16)
    bits = jax.lax.dot_general(
        oh, tab_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [r, 1]
    out_ref[:] = jnp.broadcast_to(
        bits.reshape(bf, 1024).sum(axis=1, keepdims=True), out_ref.shape)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    xh = (10.0 * rng.standard_normal((NF, 1024))).astype(np.float32)

    r0 = run("p0_reshape", p0_reshape)
    r1 = run("p1_strided", p1_strided)
    r2 = run("p2_roll", p2_roll)

    e = np.zeros((1024, 512), np.float32)
    o = np.zeros((1024, 512), np.float32)
    e[np.arange(0, 1024, 2), np.arange(512)] = 1.0
    o[np.arange(1, 1024, 2), np.arange(512)] = 1.0
    r3 = run("p3_deint_mm", p3_deint_mm,
             [pl.BlockSpec((1024, 512), lambda i: (0, 0)),
              pl.BlockSpec((1024, 512), lambda i: (0, 0))],
             [jnp.asarray(e), jnp.asarray(o)])

    tab = np.arange(81, dtype=np.float32).reshape(81, 1)
    r4 = run("p4_evenmask", p4_evenmask,
             [pl.BlockSpec((81, 1), lambda i: (0, 0))], [jnp.asarray(tab)])

    # correctness reference on host
    want = xh.sum()
    for name, r in [("p1", r1), ("p2", r2), ("p3", r3)]:
        if r is not None:
            ok = abs(r[0, 0] - want / 1) < 1e-1 * abs(want) + 1e2
            print(f"{name} value check vs host pair-sum: got {r[0,0]:.1f} "
                  f"(per-row)", flush=True)
    if r4 is not None:
        m = np.clip(np.abs(xh).astype(np.int64), 0, 8)
        nxt = np.roll(m, -1, axis=1)
        sym = m * 9 + nxt
        bits = sym.astype(np.float64)
        bits[:, 1::2] = 0
        print("p4 host check row0:", bits[0].sum(), "kernel:", r4[0, 0],
              flush=True)


if __name__ == "__main__":
    main()
