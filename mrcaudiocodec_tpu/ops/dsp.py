"""JAX device DSP: batched transient detect, MDCT/IMDCT, overlap-add.

TPU-first mirror of the normative spec (mrcaudiocodec_tpu/spec/dsp.py):
every frame of a batch flows through both the long and the short analysis
path with static shapes, and the result is selected by block type — no
data-dependent control flow, so XLA fuses the whole filterbank into a few
large MXU matmuls (SURVEY.md §2b N2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T

F32 = jnp.float32


@functools.lru_cache(maxsize=None)
def _consts(window: str = "sine"):
    """Device-ready constant tables (float32)."""
    return {
        "long_windows": np.asarray(T.long_windows(window), dtype=np.float32),
        "short_window": np.asarray(T.short_window(window), dtype=np.float32),
        "dct4_long": np.asarray(T.dct_iv_matrix(C.LONG_COEFFS),
                                dtype=np.float32),
        "dct4_short": np.asarray(T.dct_iv_matrix(C.SHORT_COEFFS),
                                 dtype=np.float32),
    }


# ---------------------------------------------------------------------------
# Framing (host-side helper) — R2
# ---------------------------------------------------------------------------


def frame_signal(x: np.ndarray) -> np.ndarray:
    """Host-side framing identical to spec.dsp.frame_signal."""
    from ..spec.dsp import frame_signal as _fs
    return _fs(x)


# ---------------------------------------------------------------------------
# Transient detection + block types — R5 (batched)
# ---------------------------------------------------------------------------


def detect_transients(frames: jnp.ndarray) -> jnp.ndarray:
    """[F, 2048] -> [F] bool; fixed-block execution (ops/blocking.py) so
    the result is bit-identical for any batch shape."""
    from .blocking import map_frame_blocks
    return map_frame_blocks(_detect_transients_block, (frames,))


def _detect_transients_block(frames: jnp.ndarray) -> jnp.ndarray:
    """[F, 2048] -> [F] bool — the shared pinned sequence
    (xpsy.transient_detect, normative rev 4), bit-identical to the spec
    on every backend. On XLA:CPU the d^2 sub-block energies route through
    the native FFI (mode 2: squared segmented sums) because the square
    feeding the scan's adds would FMA-contract; everything downstream is
    adds/add-then-mul/compares, contraction-immune anywhere."""
    from .. import xpsy
    fr = frames.astype(F32)
    if jax.default_backend() == "tpu":
        return xpsy.transient_detect(fr, jnp)
    from .. import native
    if jax.default_backend() == "cpu" and native.xpsy_ffi_registered():
        i32 = xpsy.band_energy_blob(xpsy._SUB_EDGES)

        def sub_energy(d):
            call = jax.ffi.ffi_call(
                "mrc_xpsy",
                (jax.ShapeDtypeStruct((d.shape[0], xpsy.N_SUB), jnp.float32),
                 jax.ShapeDtypeStruct((d.shape[0], xpsy.N_SUB), jnp.float32),
                 jax.ShapeDtypeStruct((d.shape[0],), jnp.float32)),
                vmap_method="broadcast_all")
            e, _, _ = call(d, jnp.zeros((1,), jnp.float32),
                           jnp.asarray(i32), mode=2, full_psycho=0)
            return e

        return xpsy.transient_detect(fr, jnp, sub_energy=sub_energy)

    def host(f):
        return np.asarray(xpsy.transient_detect(
            np.asarray(f, np.float32), np))

    return jax.pure_callback(
        host, jax.ShapeDtypeStruct((fr.shape[0],), jnp.bool_),
        fr, vmap_method="sequential")


def block_types(transient: jnp.ndarray, window_switching: bool) -> jnp.ndarray:
    """[F] bool -> [F] int32 (mirror of spec.dsp.block_types)."""
    tr = transient
    if not window_switching:
        return jnp.zeros(tr.shape, dtype=jnp.int32)
    f = jnp.zeros_like(tr[:1])
    ls = jnp.concatenate([f, tr[:-1]])
    rs = jnp.concatenate([tr[1:], f])
    bt = jnp.where(
        tr, C.SHORT,
        jnp.where(ls & rs, C.STARTSTOP,
                  jnp.where(ls, C.STOP, jnp.where(rs, C.START, C.LONG))))
    return bt.astype(jnp.int32)


# ---------------------------------------------------------------------------
# MDCT / IMDCT — R3/R4 (batched, matmul form: MXU-native)
# ---------------------------------------------------------------------------


def _fold(v: jnp.ndarray) -> jnp.ndarray:
    m = v.shape[-1] // 2
    h = m // 2
    a = -v[..., 3 * h - 1:2 * h - 1:-1] - v[..., 3 * h:]
    b = v[..., :h] - v[..., 2 * h - 1:h - 1:-1]
    return jnp.concatenate([a, b], axis=-1)


def _unfold(u: jnp.ndarray) -> jnp.ndarray:
    m = u.shape[-1]
    h = m // 2
    return jnp.concatenate([
        u[..., h:],
        -u[..., m - 1:h - 1:-1],
        -u[..., h - 1::-1],
        -u[..., :h],
    ], axis=-1)


_XMATH_MODE = {"dct_iv": 0, "mdct_windowed": 1, "imdct_windowed": 2}


def _norm_chain(fn_name: str, out_last: int, *args) -> jnp.ndarray:
    """Run a normative xmath chain, bit-identical to spec on EVERY backend.

    * TPU: the shared xmath arithmetic in jnp, evaluated in ROLL FORM
      (xmath.dct_iv_fast) — the same butterfly graph as the spec's
      Stockham chain (bit-identical values, asserted in NumPy by
      tests/test_mdct.py), stored constant-shape so every stage keeps a
      512-lane minor dim. The naive Stockham storage schedule shrinks
      the minor dim 512 -> 2 and cost ~500 s of remote Mosaic/XLA
      compile per process + 150 ms steady state on the v5e; the roll
      form removes both. XLA:TPU emits plain single-rounded IEEE
      mul/add for these chains (scripts/tpu_fma_probe.py), so the jnp
      instantiation is BITWISE equal to the NumPy spec on hardware
      (scripts/tpu_xmath_probe.py).
    * CPU: XLA:CPU's LLVM backend fuses mul+add chains into FMAs at
      instruction selection — even across selects, optimization_barriers,
      bitcast round-trips and fpext/fptrunc pairs (measured; no flag
      disables it, including --xla_allow_excess_precision=false) — which
      breaks IEEE-sequence equality. The CPU engine therefore runs the
      identical op DAG natively (native/xmath_ffi.cpp, built with
      -ffp-contract=off) as an XLA custom call: bit-identical to the
      NumPy spec, and — unlike a pure_callback — shardable (no host
      Python in the executable; callbacks deadlocked under shard_map).
    * Anything else (e.g. GPU, whose LLVM backend contracts FMAs by
      default): the no-contraction property was only ever measured on
      XLA:TPU, so unknown backends take the CPU route (FFI if built,
      normative-NumPy callback otherwise) rather than silently trusting
      jnp lowering.
    """
    from .. import xmath
    if jax.default_backend() != "tpu":
        from .. import native
        if jax.default_backend() == "cpu" and native.xmath_ffi_registered():
            mode = _XMATH_MODE[fn_name]
            x = args[0]
            w = args[1] if len(args) > 1 else x    # mode 0: win unused
            m = x.shape[-1] // 2 if mode == 1 else x.shape[-1]
            out_shape = x.shape[:-1] + (out_last,)
            call = jax.ffi.ffi_call(
                "mrc_xmath",
                jax.ShapeDtypeStruct(out_shape, jnp.float32),
                vmap_method="broadcast_all")
            return call(x.astype(F32), w.astype(F32),
                        jnp.asarray(xmath.ffi_table(m)), mode=mode)
        # toolchain-less fallback: normative NumPy verbatim. NOT shardable
        # (host callback) — native builds wherever g++/clang++ exists.
        fn = getattr(xmath, fn_name)
        out_shape = args[0].shape[:-1] + (out_last,)
        return jax.pure_callback(
            lambda *a: fn(*[np.asarray(v) for v in a], np),
            jax.ShapeDtypeStruct(out_shape, jnp.float32), *args,
            vmap_method="sequential")
    return getattr(xmath, fn_name + "_fast")(*args, jnp, fft=_tpu_fft())


def _tpu_fft():
    """FFT-stage implementation for the TPU fast path: the fused Pallas
    kernel (default), or None (pure-XLA roll form) when disabled via
    MRC_PALLAS_MDCT=0. Both compute the identical normative values; the
    kernel keeps all butterfly stages in VMEM. Non-production shapes
    return None from fft_natural and fall back to the XLA roll form —
    same values, so no flag or shape can change the stream."""
    import os
    if os.environ.get("MRC_PALLAS_MDCT", "1") == "0":
        return None
    from .. import xmath
    from .pallas import xmath_kernel

    def fft(zr, zi):
        out = xmath_kernel.fft_natural(zr, zi)
        return out if out is not None else xmath.fft_dif(zr, zi, jnp)

    return fft


def dct_iv_dev(u: jnp.ndarray) -> jnp.ndarray:
    """Backend-dispatched normative DCT-IV (see _norm_chain)."""
    return _norm_chain("dct_iv", u.shape[-1], u)


def mdct_windowed_dev(fr: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Backend-dispatched window+fold+DCT-IV chain (see _norm_chain)."""
    return _norm_chain("mdct_windowed", fr.shape[-1] // 2,
                       fr, jnp.broadcast_to(w, fr.shape))


def imdct_windowed_dev(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Backend-dispatched DCT-IV+unfold+window chain (see _norm_chain)."""
    out = _norm_chain("imdct_windowed", x.shape[-1] * 2, x,
                      jnp.broadcast_to(w, x.shape[:-1] + (x.shape[-1] * 2,)))
    return out


def _short_subblocks(frames: jnp.ndarray) -> jnp.ndarray:
    """[F, 2048] -> [F, 8, 256] the EIGHT_SHORT sub-block views."""
    off = C.SHORT_OFFSET
    subs = [frames[:, off + g * C.SHORT_COEFFS:
                   off + g * C.SHORT_COEFFS + C.SHORT_SIZE]
            for g in range(C.N_SHORT)]
    return jnp.stack(subs, axis=1)


def analyze(frames: jnp.ndarray, bt: jnp.ndarray,
            window: str = "sine") -> jnp.ndarray:
    """Batched MDCT: [F, 2048] + [F] -> [F, 1024]; fixed-block execution
    so coefficients are bit-identical for any batch shape (the matmul
    tiling — and with it f32 reduction order — varies with M otherwise)."""
    from .blocking import map_frame_blocks
    return map_frame_blocks(lambda f, b: _analyze_block(f, b, window),
                            (frames, bt))


def _analyze_block(frames: jnp.ndarray, bt: jnp.ndarray,
                   window: str = "sine") -> jnp.ndarray:
    """Batched MDCT: [F, 2048] + [F] block types -> [F, 1024] coefficients.

    Both the long path (per-type composed window, 1024-point DCT-IV matmul)
    and the short path (8x 128-point DCT-IV matmul) are computed for every
    frame with static shapes; the per-frame result is selected by block
    type. The 2x arithmetic redundancy is far cheaper on the MXU than any
    shape-dynamic alternative (SURVEY.md §7 step 1).
    """
    cst = _consts(window)
    fr = frames.astype(F32)
    # long-family: the whole window+fold+DCT-IV chain is one normative
    # xmath sequence — bit-identical to spec.dsp on every backend
    w = jnp.asarray(cst["long_windows"])[bt]         # [F, 2048] gather
    xl = mdct_windowed_dev(fr, w)
    # short
    xs = mdct_windowed_dev(
        _short_subblocks(fr),
        jnp.asarray(cst["short_window"])[None, None, :]).reshape(
            fr.shape[0], -1)
    return jnp.where((bt == C.SHORT)[:, None], xs, xl)


def synthesize(coeffs: jnp.ndarray, bt: jnp.ndarray,
               window: str = "sine") -> jnp.ndarray:
    """Batched IMDCT+window: [F, 1024] -> [F, 2048] frames ready for OLA."""
    cst = _consts(window)
    x = coeffs.astype(F32)
    # long-family (DCT-IV is involutive: same normative xmath sequence)
    w = jnp.asarray(cst["long_windows"])[bt]
    vl = imdct_windowed_dev(x, w)
    # short
    us = x.reshape(x.shape[0], C.N_SHORT, C.SHORT_COEFFS)
    subs = imdct_windowed_dev(
        us, jnp.asarray(cst["short_window"])[None, None, :])
    off = C.SHORT_OFFSET
    vs = jnp.zeros_like(vl)
    for g in range(C.N_SHORT):
        vs = vs.at[:, off + g * C.SHORT_COEFFS:
                   off + g * C.SHORT_COEFFS + C.SHORT_SIZE].add(subs[:, g])
    return jnp.where((bt == C.SHORT)[:, None], vs, vl)


def overlap_add(frames_out: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """[F, 2048] synthesis frames -> [n_samples] signal (drop priming pad).

    50%-overlap OLA is just the sum of the two half-frames that cover each
    hop: out_hop[f] = second_half[f-1] + first_half[f].
    """
    nf = frames_out.shape[0]
    first = frames_out[:, :C.HOP]
    second = frames_out[:, C.HOP:]
    hops = first.at[1:].add(second[:-1])             # [F, HOP]
    # hop h covers samples [h*HOP, (h+1)*HOP) of the padded signal; output
    # starts at padded sample HOP (frame_signal primes with one hop).
    flat = hops.reshape(-1)[C.HOP:]
    tail = second[-1]
    flat = jnp.concatenate([flat, tail])
    return flat[:n_samples]
