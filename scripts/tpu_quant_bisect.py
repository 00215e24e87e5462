"""Bisect which part of the quant kernel kills the remote Mosaic compile.

Each variant is a cut-down pallas kernel on the same block shapes; run:
    python scripts/tpu_quant_bisect.py
prints PASS/FAIL per variant.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from mrcaudiocodec_tpu import config as C                  # noqa: E402
from mrcaudiocodec_tpu import tables as T                  # noqa: E402
from mrcaudiocodec_tpu.ops.pallas.quant_kernel import (    # noqa: E402
    _onehot_dot, _esc_pair_dot, _masks)

BLOCK_F = 32
NF = 64
FS = 44100


def run(name, kernel, extra_specs=(), extra_args=()):
    rng = np.random.default_rng(0)
    x = jnp.asarray((10.0 * rng.standard_normal((NF, 1024))
                     ).astype(np.float32))
    amp_bin = jnp.zeros((NF, 1024), jnp.int32)
    gains = jnp.broadcast_to(jnp.arange(40, 48, dtype=jnp.int32)[None, :],
                             (NF, 8))
    bt = jnp.zeros((NF, 1), jnp.int32)
    g = 8
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NF, g), jnp.int32),
            grid=(NF // BLOCK_F,),
            in_specs=[
                pl.BlockSpec((BLOCK_F, 1024), lambda i: (i, 0)),
                pl.BlockSpec((BLOCK_F, 1024), lambda i: (i, 0)),
                pl.BlockSpec((BLOCK_F, g), lambda i: (i, 0)),
                pl.BlockSpec((BLOCK_F, 1), lambda i: (i, 0)),
            ] + list(extra_specs),
            out_specs=pl.BlockSpec((BLOCK_F, g), lambda i: (i, 0)),
        )(x, amp_bin, gains, bt, *extra_args)
        np.asarray(out.ravel()[:1])
        print(f"{name}: PASS", flush=True)
        return True
    except Exception as e:
        msg = repr(e)
        print(f"{name}: FAIL {msg[:160]}", flush=True)
        return False


def v1_quantize_only(x_ref, ab_ref, g_ref, bt_ref, out_ref):
    """pow/exp2/floor path + gain fori, no lookups."""
    x = x_ref[:]
    ax = jnp.abs(x)
    gains = g_ref[:]
    giota = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    def per_gain(gi, acc):
        gg = jnp.sum(jnp.where(giota == gi, gains, 0), axis=1)
        e = jnp.clip(gg[:, None] - ab_ref[:], C.GAIN_MIN, C.GAIN_MAX)
        step = jnp.exp2((e.astype(jnp.float32) - C.GAIN_BIAS) / 4.0)
        mag = jnp.minimum(jnp.floor((ax / step) ** 0.75 + C.QUANT_MAGIC),
                          float(C.QMAX)).astype(jnp.int32)
        tot = mag.sum(axis=1)
        return acc + tot[:, None] * (giota == gi).astype(jnp.int32)

    out_ref[:] = jax.lax.fori_loop(0, 8, per_gain,
                                   jnp.zeros(out_ref.shape, jnp.int32))


def v2_onehot81(x_ref, ab_ref, g_ref, bt_ref, small_ref, out_ref):
    """one-hot 81 lookup on 4-tuples, single gain iteration."""
    x = x_ref[:]
    ax = jnp.abs(x)
    gains = g_ref[:]
    giota = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    def per_gain(gi, acc):
        gg = jnp.sum(jnp.where(giota == gi, gains, 0), axis=1)
        e = jnp.clip(gg[:, None] - ab_ref[:], C.GAIN_MIN, C.GAIN_MAX)
        step = jnp.exp2((e.astype(jnp.float32) - C.GAIN_BIAS) / 4.0)
        mag = jnp.minimum(jnp.floor((ax / step) ** 0.75 + C.QUANT_MAGIC),
                          float(C.QMAX)).astype(jnp.int32)
        q = jnp.where(x < 0, -mag, mag)
        bf = x.shape[0]
        t4 = (jnp.clip(q, -1, 1) + 1).reshape(bf, 256, 4)
        sym1 = (((t4[..., 0] * 3 + t4[..., 1]) * 3 + t4[..., 2]) * 3
                + t4[..., 3])
        bits1 = _onehot_dot(sym1, small_ref[:], 81)
        tot = bits1.sum(axis=1).astype(jnp.int32)
        return acc + tot[:, None] * (giota == gi).astype(jnp.int32)

    out_ref[:] = jax.lax.fori_loop(0, 8, per_gain,
                                   jnp.zeros(out_ref.shape, jnp.int32))


def v3_maskmm(x_ref, ab_ref, g_ref, bt_ref, mask2_ref, out_ref):
    """3D constant mask block + bt-select band matmul."""
    x = x_ref[:]
    bt = bt_ref[:, 0]
    nb = mask2_ref.shape[-1]
    bf = x.shape[0]
    v = jnp.abs(x).reshape(bf, 512, 2).sum(axis=-1)
    acc = jnp.zeros((bf, nb), jnp.float32)
    for t in range(C.N_BLOCK_TYPES):
        sel = (bt == t).astype(jnp.float32)[:, None]
        acc = acc + sel * jax.lax.dot_general(
            v, mask2_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    tot = acc.sum(axis=1).astype(jnp.int32)
    out_ref[:] = jnp.broadcast_to(tot[:, None], out_ref.shape)


def v4_escpair(x_ref, ab_ref, g_ref, bt_ref, esc_ref, out_ref):
    """separable escape pair lookup."""
    x = x_ref[:]
    bf = x.shape[0]
    mag = jnp.minimum(jnp.abs(x), 30.0).astype(jnp.int32)
    m2 = jnp.minimum(mag, C.ESC_MAG).reshape(bf, 512, 2)
    bits3 = _esc_pair_dot(m2[..., 0], m2[..., 1], esc_ref[:])
    tot = bits3.sum(axis=1).astype(jnp.int32)
    out_ref[:] = jnp.broadcast_to(tot[:, None], out_ref.shape)


def v5_escextra(x_ref, ab_ref, g_ref, bt_ref, out_ref):
    """escape extra-bits chain (8 compares + where)."""
    x = x_ref[:]
    bf = x.shape[0]
    mag = jnp.minimum(jnp.abs(x) * 100.0, 4095.0).astype(jnp.int32)
    mp = mag.reshape(bf, 512, 2)
    e_esc = jnp.full(mp.shape, 4, jnp.int32)
    for k in range(5, 13):
        e_esc = e_esc + (mp >= (1 << k)).astype(jnp.int32)
    extra = (jnp.where(mp >= C.ESC_MAG, 2 * e_esc - 3, 0)
             + (mp > 0).astype(jnp.int32)).sum(axis=-1)
    tot = extra.sum(axis=1).astype(jnp.int32)
    out_ref[:] = jnp.broadcast_to(tot[:, None], out_ref.shape)


def main():
    print("devices:", jax.devices(), flush=True)
    ca = T.code_arrays()
    m2, m4 = _masks(FS)
    nb = m2.shape[-1]
    small = np.asarray(ca["len_small"], np.float32).reshape(-1, 1)
    esc17 = np.asarray(ca["len_esc"], np.float32).reshape(17, 17)

    run("v1_quantize_only", v1_quantize_only)
    run("v2_onehot81", v2_onehot81,
        [pl.BlockSpec((81, 1), lambda i: (0, 0))], [jnp.asarray(small)])
    run("v3_maskmm", v3_maskmm,
        [pl.BlockSpec((C.N_BLOCK_TYPES, 512, nb), lambda i: (0, 0, 0))],
        [jnp.asarray(m2)])
    run("v4_escpair", v4_escpair,
        [pl.BlockSpec((17, 17), lambda i: (0, 0))], [jnp.asarray(esc17)])
    run("v5_escextra", v5_escextra)


if __name__ == "__main__":
    main()
