"""JAX psychoacoustic model: batched mirror of spec/psycho.py (R7).

Long and short analyses run for every frame with static shapes (the
spreading convolution is a plain [NP, NP] matmul — MXU-native); the result
is selected per frame by block type.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T
from ..spec.psycho import (NMT_DB, SIMPLE_OFFSET_DB, SMR_CEIL, SMR_FLOOR,
                           TINY, TMN_DB, _hann, _psy_const)

F32 = jnp.float32


@functools.lru_cache(maxsize=None)
def _dev_const(fs: int, long_block: bool):
    cst = _psy_const(fs, C.LONG_COEFFS if long_block else C.SHORT_COEFFS,
                     long_block)
    out = dict(cst)
    out["hann"] = _hann(C.LONG_SIZE if long_block else C.SHORT_SIZE)
    return out


def _block_thresholds(p: jnp.ndarray, cst, full_psycho: bool):
    """[..., bins] power spectrum -> (threshold[..., nb], energy[..., nb])."""
    from ..spec.psycho import SFM_FLOOR_REL
    p = jnp.maximum(p, SFM_FLOOR_REL * p.max(axis=-1, keepdims=True))
    e_part = p @ cst["part_mat"]
    if full_psycho:
        spread_e = e_part @ cst["spread"]
        log_gm = (jnp.log(p + TINY) @ cst["part_mat"]) / cst["counts"]
        geo = jnp.exp(log_gm)
        arith = e_part / cst["counts"] + TINY
        sfm_db = F32(10.0) * jnp.log10(
            jnp.minimum(geo / arith, F32(1.0)) + TINY)
        alpha = jnp.minimum(sfm_db / F32(-60.0), F32(1.0))
        offset_db = alpha * F32(TMN_DB) + (F32(1.0) - alpha) * F32(NMT_DB)
        t_part = spread_e * jnp.power(F32(10.0), -offset_db / F32(10.0))
    else:
        t_part = e_part * F32(10.0 ** (-SIMPLE_OFFSET_DB / 10.0))
    t_part = jnp.maximum(t_part, cst["ath_part"])
    t_density = t_part / cst["counts"]
    big = F32(1e30)
    dens = jnp.where(cst["pb_mask"], t_density[..., :, None], big)
    band_t = dens.min(axis=-2) * cst["width"]
    band_e = p @ cst["band_mat"]
    return band_t, band_e


def _power(spec: jnp.ndarray, n_keep: int) -> jnp.ndarray:
    return (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)[..., :n_keep].astype(F32)


def analyze(frames: jnp.ndarray, coeffs: jnp.ndarray, bt: jnp.ndarray,
            fs: int, full_psycho: bool = True):
    """Batched psycho -> (allowed[F,NB], pe[F], e_mdct[F,NB]); fixed-block
    execution (ops/blocking.py) so thresholds are bit-identical for any
    batch shape."""
    from .blocking import map_frame_blocks
    return map_frame_blocks(
        lambda f, c, b: _analyze_block(f, c, b, fs, full_psycho),
        (frames, coeffs, bt))


def _analyze_block(frames: jnp.ndarray, coeffs: jnp.ndarray, bt: jnp.ndarray,
                   fs: int, full_psycho: bool = True):
    """Batched psycho: -> (allowed[F, NB], pe[F]). Mirror of spec."""
    lay = T.unified_layout(fs)
    nb = lay["nb"]
    fr = frames.astype(F32)
    nf = fr.shape[0]

    # ---- long path
    cl = _dev_const(fs, True)
    spec_l = jnp.fft.rfft(fr * cl["hann"])
    p_l = _power(spec_l, C.LONG_COEFFS)
    t_l, e_l = _block_thresholds(p_l, cl, full_psycho)      # [F, nb_long]
    pe_l = jnp.sum(cl["width"] * jnp.log2(
        F32(1.0) + jnp.sqrt(e_l / (t_l + TINY))), axis=-1)
    nb_long = cl["nb"]
    t_long = jnp.concatenate(
        [t_l, jnp.full((nf, nb - nb_long), F32(1e30))], axis=-1)
    e_long = jnp.concatenate(
        [e_l, jnp.zeros((nf, nb - nb_long), F32)], axis=-1)

    # ---- short path (8 sub-FFTs)
    cs = _dev_const(fs, False)
    from .dsp import _short_subblocks
    subs = _short_subblocks(fr) * cs["hann"][None, None, :]
    p_s = _power(jnp.fft.rfft(subs), C.SHORT_COEFFS)        # [F, 8, 128]
    t_s, e_s = _block_thresholds(p_s, cs, full_psycho)      # [F, 8, nbs]
    pe_s = jnp.sum(cs["width"] * jnp.log2(
        F32(1.0) + jnp.sqrt(e_s / (t_s + TINY))), axis=(-1, -2))
    nshort = C.N_SHORT * cs["nb"]
    t_short = jnp.concatenate(
        [t_s.reshape(nf, nshort),
         jnp.full((nf, nb - nshort), F32(1e30))], axis=-1)
    e_short = jnp.concatenate(
        [e_s.reshape(nf, nshort), jnp.zeros((nf, nb - nshort), F32)], axis=-1)

    is_short = (bt == C.SHORT)
    t_full = jnp.where(is_short[:, None], t_short, t_long)
    e_full = jnp.where(is_short[:, None], e_short, e_long)
    pe = jnp.where(is_short, pe_s, pe_l).astype(F32)

    smr = jnp.clip(e_full / (t_full + TINY), SMR_FLOOR, SMR_CEIL)
    x2 = coeffs.astype(F32) ** 2
    e_mdct = band_sum(x2, lay["band_mask"], bt)
    allowed = e_mdct / smr
    return allowed.astype(F32), pe, e_mdct


def band_sum(per_bin: jnp.ndarray, band_mask: np.ndarray,
             bt: jnp.ndarray) -> jnp.ndarray:
    """Float band sums [F, 1024] -> [F, NB] via per-type mask matmuls.

    band_mask: [N_BLOCK_TYPES, 1024, NB] from tables.unified_layout. A
    direct masked matmul per block type (then a select on bt) keeps the
    reduction local to each band — a cumsum-at-edges difference would
    cancel catastrophically for quiet bands riding on a loud frame total.

    The per-frame combine is a branchless 0/1 select-accumulate, NOT a
    gather: the take_along_axis formulation measured 18 ms/1024 frames on
    v5e (vs <1 ms for the five dots) — TPU gathers are catastrophic. The
    selected value is added to exact zeros, so results are bit-identical
    to the gather form.
    """
    mask = jnp.asarray(band_mask)
    out = jnp.zeros(per_bin.shape[:-1] + (mask.shape[-1],), per_bin.dtype)
    for t in range(C.N_BLOCK_TYPES):
        sel = (bt == t).astype(per_bin.dtype)[:, None]
        out = out + sel * (per_bin @ mask[t])
    return out
