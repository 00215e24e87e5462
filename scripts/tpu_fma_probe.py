"""Does XLA:TPU / Mosaic contract mul+add to a single-rounded FMA, and in
which operand pattern? Determines the normative MDCT arithmetic (see
xmath.py). Run on the TPU: python scripts/tpu_fma_probe.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")

import jax                                             # noqa: E402
import jax.numpy as jnp                                # noqa: E402
from jax.experimental import pallas as pl              # noqa: E402


def fma64(a, b, c):
    """round_f32(a*b + c) with one f64 rounding in the middle (product is
    exact in f64; good enough to classify contraction behavior)."""
    return (a.astype(np.float64) * b.astype(np.float64)
            + c.astype(np.float64)).astype(np.float32)


def classify(name, got, cands):
    matches = [k for k, v in cands.items()
               if (got.view(np.uint32) == v.view(np.uint32)).all()]
    print(f"{name}: matches {matches or 'NONE'}", flush=True)
    if not matches:
        for k, v in cands.items():
            neq = got.view(np.uint32) != v.view(np.uint32)
            print(f"   vs {k}: {int(neq.sum())}/{neq.size} diffs", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    n = 8 * 1024
    a = (0.3 * rng.standard_normal((8, n // 8))).astype(np.float32)
    b = (0.3 * rng.standard_normal((8, n // 8))).astype(np.float32)
    c = (0.3 * rng.standard_normal((8, n // 8))).astype(np.float32)
    d = (0.3 * rng.standard_normal((8, n // 8))).astype(np.float32)

    plain1 = a * b - c
    cands1 = {"plain": plain1, "fma": fma64(a, b, -c)}
    got = np.asarray(jax.jit(lambda a, b, c: a * b - c)(a, b, c))
    classify("XLA a*b-c", got, cands1)

    plain2 = a * b - c * d
    cands2 = {
        "plain": plain2,
        "fma_first": fma64(a, b, -(c * d)),
        "fma_second": fma64(-c, d, a * b),
        "fma_both64": (a.astype(np.float64) * b.astype(np.float64)
                       - c.astype(np.float64) * d.astype(np.float64)
                       ).astype(np.float32),
    }
    got = np.asarray(jax.jit(lambda a, b, c, d: a * b - c * d)(a, b, c, d))
    classify("XLA a*b-c*d", got, cands2)

    plain3 = a * b + c * d
    cands3 = {
        "plain": plain3,
        "fma_first": fma64(a, b, c * d),
        "fma_second": fma64(c, d, a * b),
    }
    got = np.asarray(jax.jit(lambda a, b, c, d: a * b + c * d)(a, b, c, d))
    classify("XLA a*b+c*d", got, cands3)

    # Pallas kernels, same three patterns
    def k1(a_ref, b_ref, c_ref, d_ref, o_ref):
        o_ref[:] = a_ref[:] * b_ref[:] - c_ref[:]

    def k2(a_ref, b_ref, c_ref, d_ref, o_ref):
        o_ref[:] = a_ref[:] * b_ref[:] - c_ref[:] * d_ref[:]

    def k3(a_ref, b_ref, c_ref, d_ref, o_ref):
        o_ref[:] = a_ref[:] * b_ref[:] + c_ref[:] * d_ref[:]

    for name, k, cands in (("Pallas a*b-c", k1, cands1),
                           ("Pallas a*b-c*d", k2, cands2),
                           ("Pallas a*b+c*d", k3, cands3)):
        try:
            got = np.asarray(pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
            )(a, b, c, d))
            classify(name, got, cands)
        except Exception as e:
            print(f"{name}: FAILED {repr(e)[:300]}", flush=True)

    # chained pattern like a butterfly stage: (x+y)*w - (u+v)*t
    x = a + b
    u = c + d
    plain4 = x * 0.7 - u * 0.3
    w7 = np.float32(0.7)
    w3 = np.float32(0.3)
    cands4 = {
        "plain": plain4,
        "fma_first": fma64(x, np.full_like(x, w7), -(u * w3)),
        "fma_second": fma64(-u, np.full_like(u, w3), x * w7),
    }
    got = np.asarray(jax.jit(
        lambda a, b, c, d: (a + b) * w7 - (c + d) * w3)(a, b, c, d))
    classify("XLA (a+b)*k1-(c+d)*k2", got, cands4)


if __name__ == "__main__":
    main()
