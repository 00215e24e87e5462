"""Localize the quant Pallas kernel's G=32 hardware mismatch (VERDICT r2 #1a).

Three phases, finest last:
  1. payload_bits kernel-vs-XLA at several G and gain ranges -> which
     (frame, gain) entries disagree.
  2. a mag-probe Pallas kernel that emits the quantized magnitudes for ONE
     gain column -> which bins disagree, and at which (x, e).
  3. elementwise divide/sqrt Mosaic-vs-XLA on exactly those (x, step)
     pairs -> which single IEEE op is lowered differently.

Run from the repo root on the TPU:  python scripts/tpu_quant_g32.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from mrcaudiocodec_tpu import config as C              # noqa: E402
from mrcaudiocodec_tpu import tables as T              # noqa: E402
from mrcaudiocodec_tpu.ops import dsp, entropy, quantize, rd  # noqa: E402
from mrcaudiocodec_tpu.ops.pallas import quant_kernel  # noqa: E402

FS = 44100
NF = 256


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    fr = jnp.asarray((0.3 * rng.standard_normal((NF, C.LONG_SIZE))
                      ).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, 5, NF).astype(np.int32))
    coeffs = dsp.analyze(fr, bt)
    nb = T.unified_layout(FS)["nb"]
    amp = jnp.asarray(
        (rng.integers(0, C.AMP_MAX // C.AMP_STEP + 1, (NF, nb))
         * C.AMP_STEP).astype(np.int32))
    return coeffs, amp, bt


def phase1(coeffs, amp, bt):
    print("== phase 1: payload bits kernel vs XLA ==", flush=True)
    xla_fn = jax.jit(lambda c, a, gg, b: rd._bits_for_gains(c, a, gg, b, FS))
    k_fn = jax.jit(lambda c, a, gg, b: quant_kernel.payload_bits_for_gains(
        c, a, gg, b, FS))
    # XLA path returns payload + fixed + sf; compare payload-only by
    # subtracting the shared fixed part (identical code on both sides).
    tb = entropy._dev_tables(FS)
    width = entropy._select_by_bt(tb["width"], bt)
    nreal = entropy.lut(tb["nreal"], bt)
    sf = entropy.sf_delta_bits(amp, width)
    fixed = np.asarray(C.BLOCK_TYPE_BITS + C.GAIN_BITS + C.CB_BITS * nreal
                       + sf)[:, None]

    bad_entries = []
    for name, gains_np in [
        ("G=8 mid (40..47)", np.arange(40, 48)),
        ("G=8 low (0..7)", np.arange(0, 8)),
        ("G=8 high (248..255)", np.arange(248, 256)),
        ("G=16 (64..184 step 8)", np.arange(64, 192, 8)),
        ("G=32 coarse (0..248 step 8)",
         np.arange(C.GAIN_MIN, C.GAIN_MAX + 1, C.GAIN_COARSE_STEP)),
    ]:
        g = len(gains_np)
        gains = jnp.broadcast_to(
            jnp.asarray(gains_np.astype(np.int32))[None, :], (NF, g))
        ref = np.asarray(xla_fn(coeffs, amp, gains, bt)) - fixed
        got = np.asarray(k_fn(coeffs, amp, gains, bt))
        neq = ref != got
        print(f"{name}: mismatches {int(neq.sum())}/{neq.size}", flush=True)
        if neq.any():
            fi, gi = np.nonzero(neq)
            for j in range(min(6, len(fi))):
                f, gg = int(fi[j]), int(gi[j])
                print(f"  frame {f} bt={int(np.asarray(bt)[f])} "
                      f"gain {int(gains_np[gg])}: xla {ref[f, gg]} "
                      f"kernel {got[f, gg]}", flush=True)
                bad_entries.append((f, int(gains_np[gg])))
    return bad_entries


def _mag_kernel(x_ref, ab_ref, g_ref, out_ref):
    """Quantizer magnitudes for a single scalar gain column (the kernel's
    exact arithmetic, minus the cost lookups)."""
    x = x_ref[:]
    ax = jnp.abs(x)
    g = g_ref[:, :1]                                       # [BF, 1]
    e = jnp.clip(g - ab_ref[:], C.GAIN_MIN, C.GAIN_MAX)
    d = e - C.GAIN_BIAS
    r = d & 3
    frac = jnp.where(r == 0, jnp.float32(1.0),
                     jnp.where(r == 1, jnp.float32(2.0 ** 0.25),
                               jnp.where(r == 2, jnp.float32(2.0 ** 0.5),
                                         jnp.float32(2.0 ** 0.75))))
    two_k = jax.lax.bitcast_convert_type(
        ((d >> 2) + 127) << 23, jnp.float32)
    a = ax / (frac * two_k)
    p = jnp.sqrt(a * jnp.sqrt(a))
    mag = jnp.minimum(jnp.floor(p + C.QUANT_MAGIC), float(C.QMAX))
    out_ref[:] = mag.astype(jnp.int32)


def mag_probe(coeffs, amp, bt, gain_val):
    amp_bin = entropy.amp_to_bins(amp, bt, FS)
    nf = coeffs.shape[0]
    gains = jnp.full((nf, 8), gain_val, jnp.int32)
    out = pl.pallas_call(
        _mag_kernel,
        out_shape=jax.ShapeDtypeStruct((nf, C.LONG_COEFFS), jnp.int32),
        grid=(nf // quant_kernel.BLOCK_F,),
        in_specs=[
            pl.BlockSpec((quant_kernel.BLOCK_F, C.LONG_COEFFS),
                         lambda i: (i, 0)),
            pl.BlockSpec((quant_kernel.BLOCK_F, C.LONG_COEFFS),
                         lambda i: (i, 0)),
            pl.BlockSpec((quant_kernel.BLOCK_F, 8), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((quant_kernel.BLOCK_F, C.LONG_COEFFS),
                               lambda i: (i, 0)),
    )(coeffs.astype(jnp.float32), amp_bin, gains)
    e_bin = jnp.clip(jnp.int32(gain_val) - amp_bin, C.GAIN_MIN, C.GAIN_MAX)
    ref_q = quantize.quantize(coeffs, e_bin)
    return (np.asarray(out), np.abs(np.asarray(ref_q)),
            np.asarray(e_bin), np.asarray(coeffs))


def phase2(coeffs, amp, bt, bad_entries):
    print("== phase 2: magnitude probe ==", flush=True)
    gains = sorted({g for _, g in bad_entries}) or [0, 8, 128, 248]
    pairs = []
    for gv in gains[:4]:
        mag_k, mag_x, e_bin, x = mag_probe(coeffs, amp, bt, gv)
        neq = mag_k != mag_x
        print(f"gain {gv}: mag mismatches {int(neq.sum())}/{neq.size}",
              flush=True)
        if neq.any():
            fi, bi = np.nonzero(neq)
            for j in range(min(8, len(fi))):
                f, b = int(fi[j]), int(bi[j])
                print(f"  f={f} bin={b} x={x[f, b]!r} e={e_bin[f, b]} "
                      f"k={mag_k[f, b]} xla={mag_x[f, b]}", flush=True)
                pairs.append((float(x[f, b]), int(e_bin[f, b])))
    return pairs


def _op_kernel(x_ref, s_ref, div_ref, sq_ref, p_ref):
    a = jnp.abs(x_ref[:]) / s_ref[:]
    div_ref[:] = a
    sq = jnp.sqrt(a)
    sq_ref[:] = sq
    p_ref[:] = jnp.sqrt(a * sq)


def phase3(pairs):
    print("== phase 3: elementwise op compare ==", flush=True)
    if not pairs:
        # synthesize a broad sweep anyway
        rng = np.random.default_rng(1)
        xs = (0.3 * rng.standard_normal(1024 * 8)).astype(np.float32)
        es = rng.integers(0, 256, xs.size).astype(np.int32)
        pairs = list(zip(xs.tolist(), es.tolist()))
    n = max(256, len(pairs))
    n = -(-n // 256) * 256
    xs = np.zeros(n, np.float32)
    es = np.zeros(n, np.int32)
    for i, (xv, ev) in enumerate(pairs[:n]):
        xs[i], es[i] = xv, ev
    steps = np.asarray(
        quantize.band_steps(jnp.asarray(es)), np.float32)
    X = jnp.asarray(xs.reshape(-1, 256))
    S = jnp.asarray(steps.reshape(-1, 256))
    nrow = X.shape[0]
    shape = jax.ShapeDtypeStruct(X.shape, jnp.float32)
    div_k, sq_k, p_k = pl.pallas_call(
        _op_kernel, out_shape=(shape, shape, shape),
        grid=(1,),
        in_specs=[pl.BlockSpec((nrow, 256), lambda i: (0, 0))] * 2,
        out_specs=[pl.BlockSpec((nrow, 256), lambda i: (0, 0))] * 3,
    )(X, S)

    @jax.jit
    def xla_ops(x, s):
        a = jnp.abs(x) / s
        a = jax.lax.optimization_barrier(a)
        t = a * jnp.sqrt(a)
        t = jax.lax.optimization_barrier(t)
        return a, jnp.sqrt(a), jnp.sqrt(t)

    div_x, sq_x, p_x = xla_ops(X, S)
    for name, kk, xx in (("divide", div_k, div_x), ("sqrt", sq_k, sq_x),
                         ("p=sqrt(a*sqrt(a))", p_k, p_x)):
        kb = np.asarray(kk).view(np.uint32)
        xb = np.asarray(xx).view(np.uint32)
        neq = kb != xb
        print(f"{name}: bit mismatches {int(neq.sum())}/{neq.size}",
              flush=True)
        if neq.any():
            ri, ci = np.nonzero(neq)
            for j in range(min(6, len(ri))):
                r, c = int(ri[j]), int(ci[j])
                print(f"  x={xs[r * 256 + c]!r} step={steps[r * 256 + c]!r} "
                      f"k={np.asarray(kk)[r, c]!r} xla={np.asarray(xx)[r, c]!r}",
                      flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    coeffs, amp, bt = make_inputs()
    bad = phase1(coeffs, amp, bt)
    pairs = phase2(coeffs, amp, bt, bad)
    phase3(pairs)


if __name__ == "__main__":
    main()
