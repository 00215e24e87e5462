"""JAX psychoacoustic model: batched mirror of spec/psycho.py (R7).

Normative arithmetic rev 4: the whole chain is the fixed IEEE-754 f32
sequence defined in mrcaudiocodec_tpu/xpsy.py, shared VERBATIM with the
spec codec, so psycho outputs (and hence every downstream rate decision)
are bit-identical to the spec on every backend by construction — the
property that already held for the MDCT (xmath.py) and the quantizer.

Backend dispatch (same scheme as ops/dsp._norm_chain):

  * TPU: the shared xpsy arithmetic in jnp. XLA:TPU emits plain
    single-rounded IEEE mul/add for these chains (scripts/tpu_fma_probe)
    so the jnp instantiation IS the spec. Long and short analyses run
    for every frame with static shapes; the per-frame result is selected
    by block type.
  * CPU: XLA:CPU's LLVM backend contracts mul+add into FMAs through any
    barrier (measured r3), so the contraction-exposed chains (FFT+power,
    thresholds, pe, band energies) run the identical op DAG natively
    (native/xpsy_ffi.cpp, -ffp-contract=off) as XLA custom calls —
    shardable, unlike a pure_callback. Rounding-free glue (selects,
    clips, divides, concats) stays in jnp: divide/min/max/where are
    single correctly-rounded ops everywhere.
  * Anything else: normative-NumPy callback (not shardable; the FFI
    builds wherever a C++ toolchain exists).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T
from .. import xpsy

F32 = jnp.float32
TINY = xpsy.TINY
SMR_FLOOR = F32(1e-3)
SMR_CEIL = F32(1e12)


@functools.lru_cache(maxsize=None)
def _unified_band_edges(fs: int):
    """(long_edges, short_edges) of the unified layout as tuples."""
    lay = T.unified_layout(fs)
    return (tuple(int(v) for v in lay["edges"][C.LONG]),
            tuple(int(v) for v in lay["edges"][C.SHORT]))


def _select_slices(s, ends):
    """Segment-end extraction as static slices + concat — pure data
    movement with values identical to the default `s[..., ends]` fancy
    index, but ~4x less device time on v5e (measured 10.6 -> 2.6 ms per
    [1024, 1024] block_thresholds; even compile-time-constant index
    gathers pay a real lowering cost on TPU). Used for every segmented
    reduction the TPU path selects from (ADVICE r4 #2 follow-up)."""
    return jnp.concatenate([s[..., int(e):int(e) + 1] for e in ends],
                           axis=-1)


def _psy_family_jnp(fr: jnp.ndarray, fs: int, long_block: bool,
                    full_psycho: bool):
    """[R, 2n] raw frames -> (band_t [R, nb], band_e [R, nb], pe [R])
    through the shared chain with xp=jnp (TPU path)."""
    cst = xpsy.psy_tables(fs, long_block)
    if long_block:
        w = fr * jnp.asarray(cst["hann"])
        p = xpsy.rfft_power(w, jnp)
        band_t, band_e = xpsy.block_thresholds(p, cst, full_psycho, jnp,
                                               select=_select_slices)
        pe = xpsy.band_pe(band_e, band_t, cst["width"], jnp)
        return band_t, band_e, pe
    from .dsp import _short_subblocks
    subs = _short_subblocks(fr) * jnp.asarray(cst["hann"])[None, None, :]
    p = xpsy.rfft_power(subs, jnp)                       # [R, 8, 128]
    band_t, band_e = xpsy.block_thresholds(p, cst, full_psycho, jnp,
                                           select=_select_slices)
    pe = xpsy.groups_pe(band_e, band_t, cst["width"], jnp)
    nf = fr.shape[0]
    return (band_t.reshape(nf, -1), band_e.reshape(nf, -1), pe)


def _psy_family_ffi(fr: jnp.ndarray, fs: int, long_block: bool,
                    full_psycho: bool):
    """CPU route: identical DAG inside the native kernel."""
    from .. import native
    f32b, i32b = xpsy.ffi_blobs(fs, long_block)
    nf = fr.shape[0]
    nb = (xpsy.psy_tables(fs, long_block)["nb"]
          * (1 if long_block else C.N_SHORT))
    call = jax.ffi.ffi_call(
        "mrc_xpsy",
        (jax.ShapeDtypeStruct((nf, nb), jnp.float32),
         jax.ShapeDtypeStruct((nf, nb), jnp.float32),
         jax.ShapeDtypeStruct((nf,), jnp.float32)),
        vmap_method="broadcast_all")
    return call(fr.astype(F32), jnp.asarray(f32b), jnp.asarray(i32b),
                mode=(0 if long_block else 1),
                full_psycho=1 if full_psycho else 0)


def _psy_family_callback(fr: jnp.ndarray, fs: int, long_block: bool,
                         full_psycho: bool):
    """Fallback: normative NumPy verbatim (host callback, not shardable)."""
    cst = xpsy.psy_tables(fs, long_block)
    nb = cst["nb"] * (1 if long_block else C.N_SHORT)
    nf = fr.shape[0]

    def host(frames):
        frames = np.asarray(frames, np.float32)
        if long_block:
            p = xpsy.rfft_power(frames * cst["hann"], np)
            bt_, be_ = xpsy.block_thresholds(p, cst, full_psycho, np)
            pe = xpsy.band_pe(be_, bt_, cst["width"], np)
            return bt_, be_, pe.astype(np.float32)
        off = C.SHORT_OFFSET
        subs = np.stack([frames[:, off + g * C.SHORT_COEFFS:
                                off + g * C.SHORT_COEFFS + C.SHORT_SIZE]
                         for g in range(C.N_SHORT)], axis=1)
        p = xpsy.rfft_power(subs * cst["hann"], np)
        bt_, be_ = xpsy.block_thresholds(p, cst, full_psycho, np)
        pe = xpsy.groups_pe(be_, bt_, cst["width"], np)
        n = frames.shape[0]
        return (bt_.reshape(n, -1).astype(np.float32),
                be_.reshape(n, -1).astype(np.float32),
                pe.astype(np.float32))

    return jax.pure_callback(
        host,
        (jax.ShapeDtypeStruct((nf, nb), jnp.float32),
         jax.ShapeDtypeStruct((nf, nb), jnp.float32),
         jax.ShapeDtypeStruct((nf,), jnp.float32)),
        fr, vmap_method="sequential")


def _psy_family(fr, fs, long_block, full_psycho):
    if jax.default_backend() == "tpu":
        return _psy_family_jnp(fr, fs, long_block, full_psycho)
    from .. import native
    if jax.default_backend() == "cpu" and native.xpsy_ffi_registered():
        return _psy_family_ffi(fr, fs, long_block, full_psycho)
    return _psy_family_callback(fr, fs, long_block, full_psycho)


def _band_energy(coeffs: jnp.ndarray, edges: tuple):
    """Unified-layout MDCT band energies via the shared scan tree.

    NB: this one stays on seg_sums' DEFAULT static-index select even on
    TPU. It runs inside the RD while_loop (one eval per refine
    iteration), and unlike the analyze-side block_thresholds — where the
    slice+concat selector was A/B-measured 4x faster — the loop-context
    cost of the 88-slice concat has not been cleanly measured on
    hardware (the tunnel degraded before an interleaved A/B could run);
    switching it without measurement risks the encode hot path."""
    if jax.default_backend() == "tpu":
        from ..spec.psycho import mdct_band_energy
        return mdct_band_energy(coeffs, np.asarray(edges), jnp)
    from .. import native
    if jax.default_backend() == "cpu" and native.xpsy_ffi_registered():
        i32 = xpsy.band_energy_blob(edges)
        nf = coeffs.shape[0]
        call = jax.ffi.ffi_call(
            "mrc_xpsy",
            (jax.ShapeDtypeStruct((nf, len(edges) - 1), jnp.float32),
             jax.ShapeDtypeStruct((nf, len(edges) - 1), jnp.float32),
             jax.ShapeDtypeStruct((nf,), jnp.float32)),
            vmap_method="broadcast_all")
        e, _, _ = call(coeffs.astype(F32),
                       jnp.zeros((1,), jnp.float32), jnp.asarray(i32),
                       mode=2, full_psycho=0)
        return e

    def host(co):
        from ..spec.psycho import mdct_band_energy
        return mdct_band_energy(np.asarray(co, np.float32),
                                np.asarray(edges)).astype(np.float32)

    return jax.pure_callback(
        host,
        jax.ShapeDtypeStruct((coeffs.shape[0], len(edges) - 1), jnp.float32),
        coeffs, vmap_method="sequential")


def analyze(frames: jnp.ndarray, coeffs: jnp.ndarray, bt: jnp.ndarray,
            fs: int, full_psycho: bool = True):
    """Batched psycho -> (allowed[F,NB], pe[F], e_mdct[F,NB]); fixed-block
    execution (ops/blocking.py) so outputs are bit-identical for any
    batch shape (and, rev 4, bit-identical to the spec on any backend)."""
    from .blocking import map_frame_blocks
    return map_frame_blocks(
        lambda f, c, b: _analyze_block(f, c, b, fs, full_psycho),
        (frames, coeffs, bt))


def _analyze_block(frames: jnp.ndarray, coeffs: jnp.ndarray, bt: jnp.ndarray,
                   fs: int, full_psycho: bool = True):
    """Batched psycho: -> (allowed[F, NB], pe[F], e_mdct[F, NB])."""
    lay = T.unified_layout(fs)
    nb = lay["nb"]
    fr = frames.astype(F32)
    nf = fr.shape[0]

    t_l, e_l, pe_l = _psy_family(fr, fs, True, full_psycho)
    nb_long = t_l.shape[-1]
    t_long = jnp.concatenate(
        [t_l, jnp.full((nf, nb - nb_long), F32(1e30))], axis=-1)
    e_long = jnp.concatenate(
        [e_l, jnp.zeros((nf, nb - nb_long), F32)], axis=-1)

    t_s, e_s, pe_s = _psy_family(fr, fs, False, full_psycho)
    nshort = t_s.shape[-1]
    t_short = jnp.concatenate(
        [t_s, jnp.full((nf, nb - nshort), F32(1e30))], axis=-1)
    e_short = jnp.concatenate(
        [e_s, jnp.zeros((nf, nb - nshort), F32)], axis=-1)

    is_short = (bt == C.SHORT)
    t_full = jnp.where(is_short[:, None], t_short, t_long)
    e_full = jnp.where(is_short[:, None], e_short, e_long)
    pe = jnp.where(is_short, pe_s, pe_l).astype(F32)

    le, se = _unified_band_edges(fs)
    em_long = _band_energy(coeffs.astype(F32), le)
    em_short = _band_energy(coeffs.astype(F32), se)
    e_mdct = jnp.where(is_short[:, None], em_short, em_long)
    allowed = _allowed(e_mdct, e_full, t_full)
    return allowed.astype(F32), pe, e_mdct


def _allowed(e_mdct, e_full, t_full):
    """Divide-free allowed-noise (xpsy.allowed_noise) with the usual
    backend dispatch: jnp on TPU, FFI mode 3 on CPU (the xlog2/xexp2
    Horner chains would contract on XLA:CPU), callback elsewhere."""
    from .. import xpsy
    if jax.default_backend() == "tpu":
        return xpsy.allowed_noise(e_mdct, e_full, t_full, jnp)
    from .. import native
    if jax.default_backend() == "cpu" and native.xpsy_ffi_registered():
        nf, nb = e_mdct.shape
        stacked = jnp.stack([e_mdct, e_full, t_full]).astype(F32)
        call = jax.ffi.ffi_call(
            "mrc_xpsy",
            (jax.ShapeDtypeStruct((nf, nb), jnp.float32),
             jax.ShapeDtypeStruct((nf, nb), jnp.float32),
             jax.ShapeDtypeStruct((nf,), jnp.float32)),
            vmap_method="broadcast_all")
        allowed, _, _ = call(stacked, jnp.zeros((1,), jnp.float32),
                             jnp.zeros((1,), jnp.int32),
                             mode=3, full_psycho=0)
        return allowed

    def host(em, ef, tf):
        return xpsy.allowed_noise(np.asarray(em, np.float32),
                                  np.asarray(ef, np.float32),
                                  np.asarray(tf, np.float32),
                                  np).astype(np.float32)

    return jax.pure_callback(
        host, jax.ShapeDtypeStruct(e_mdct.shape, jnp.float32),
        e_mdct, e_full, t_full, vmap_method="sequential")
