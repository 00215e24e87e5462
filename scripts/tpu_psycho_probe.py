"""Stage-level timing of the analysis executable on the real TPU: where do
the ~19 ms/1024-frames go? (bench.py --kernels; VERDICT r1 #8)

    python scripts/tpu_psycho_probe.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from mrcaudiocodec_tpu import config as C                   # noqa: E402
from mrcaudiocodec_tpu import tables as T                   # noqa: E402
from mrcaudiocodec_tpu.ops import dsp, psycho               # noqa: E402
from mrcaudiocodec_tpu.ops.psycho import (_dev_const, _power,  # noqa: E402
                                          _block_thresholds, band_sum)


def sync(o):
    np.asarray(jax.tree.leaves(o)[0].ravel()[:1])


def bench(fn, n=10):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn()
    sync(o)
    return (time.perf_counter() - t0) / n


def main():
    print("devices:", jax.devices(), flush=True)
    nf, fs = 1024, 44100
    rng = np.random.default_rng(0)
    fr = jnp.asarray((0.3 * rng.standard_normal((nf, C.LONG_SIZE))
                      ).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, 5, nf).astype(np.int32))
    coeffs = dsp.analyze(fr, bt)
    cl = _dev_const(fs, True)
    cs = _dev_const(fs, False)

    stages = {}

    f_mdct = jax.jit(lambda f, b: dsp.analyze(f, b))
    stages["mdct_xla"] = bench(lambda: f_mdct(fr, bt))

    f_fftl = jax.jit(lambda f: _power(jnp.fft.rfft(f * cl["hann"]),
                                      C.LONG_COEFFS))
    stages["fft_long"] = bench(lambda: f_fftl(fr))
    p_l = f_fftl(fr)

    def short_p(f):
        subs = dsp._short_subblocks(f) * cs["hann"][None, None, :]
        return _power(jnp.fft.rfft(subs), C.SHORT_COEFFS)
    f_ffts = jax.jit(short_p)
    stages["fft_short"] = bench(lambda: f_ffts(fr))
    p_s = f_ffts(fr)

    f_thl = jax.jit(lambda p: _block_thresholds(p, cl, True))
    stages["thresholds_long"] = bench(lambda: f_thl(p_l))
    f_ths = jax.jit(lambda p: _block_thresholds(p, cs, True))
    stages["thresholds_short"] = bench(lambda: f_ths(p_s))

    lay = T.unified_layout(fs)
    f_bs = jax.jit(lambda c, b: band_sum(c.astype(jnp.float32) ** 2,
                                         lay["band_mask"], b))
    stages["band_sum_mdct"] = bench(lambda: f_bs(coeffs, bt))

    f_full = jax.jit(lambda f, c, b: psycho.analyze(f, c, b, fs, True))
    stages["psycho_full"] = bench(lambda: f_full(fr, coeffs, bt))

    # matmul-form DFT power spectrum (candidate rfft replacement)
    k = np.arange(C.LONG_COEFFS)
    n = np.arange(C.LONG_SIZE)
    ang = 2 * np.pi * np.outer(n, k) / C.LONG_SIZE
    ccos = jnp.asarray((np.cos(ang) * np.asarray(cl["hann"])[:, None]
                        ).astype(np.float32))
    csin = jnp.asarray((np.sin(ang) * np.asarray(cl["hann"])[:, None]
                        ).astype(np.float32))

    def dft_p(f):
        re = jax.lax.dot_general(
            f, ccos, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        im = jax.lax.dot_general(
            f, csin, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return re * re + im * im
    f_dft = jax.jit(dft_p)
    stages["dft_matmul_long"] = bench(lambda: f_dft(fr))
    perr = np.abs(np.asarray(f_dft(fr)) - np.asarray(p_l)).max()
    rel = perr / max(1e-9, float(np.asarray(p_l).max()))
    print(f"dft-matmul power max|err| {perr:.3e} (rel {rel:.2e})", flush=True)

    for name, t in stages.items():
        print(f"{name}: {t*1e3:.2f} ms / {nf} frames", flush=True)


if __name__ == "__main__":
    main()
