"""JAX entropy-cost stage: exact-integer mirror of spec/entropy.py (R12).

All bit counts are integer table lookups and integer band sums, so this
module reproduces the spec's costs *bit-for-bit* — the property the
"bit-exact bitstreams for identical rate decisions" conformance contract
rests on (BASELINE.json:5).

Band reductions use the cumulative-sum-at-edges trick (static shapes, exact
for integers); escape lengths use integer threshold comparisons instead of
floating log2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C
from .. import tables as T

I32 = jnp.int32
BIG = np.int32(1 << 24)


@functools.lru_cache(maxsize=None)
def _dev_tables(fs: int):
    ca = T.code_arrays()
    lay = T.unified_layout(fs)
    nreal = (lay["width"] > 0).sum(axis=1).astype(np.int32)  # per block type
    return {
        "len_small": np.asarray(ca["len_small"], np.int32),
        "len_mid": np.asarray(ca["len_mid"], np.int32),
        "len_esc": np.asarray(ca["len_esc"], np.int32),
        "len_sf": np.asarray(ca["len_sf"], np.int32),
        "edges": np.asarray(lay["edges"], np.int32),
        "edges4": np.asarray(lay["edges"] // 4, np.int32),
        "edges2": np.asarray(lay["edges"] // 2, np.int32),
        "width": np.asarray(lay["width"], np.int32),
        "nreal": np.asarray(nreal, np.int32),
        "nb": lay["nb"],
    }


def _band_sum_int(per_item: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """[..., n_items] int32 + [..., NB+1] edges (item units) -> [..., NB]."""
    cs = jnp.cumsum(per_item, axis=-1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    return jnp.take_along_axis(cs, edges[..., 1:], axis=-1) - \
        jnp.take_along_axis(cs, edges[..., :-1], axis=-1)


def lut(table: np.ndarray, sym: jnp.ndarray) -> jnp.ndarray:
    """Exact small-table lookup as a fused masked sum (TPU gathers are
    catastrophically slow; this compare/select/add chain fuses on the VPU).

    table: [n] int; sym: [...] int32 in [0, n). Returns int32.
    """
    tab = np.asarray(table)
    out = jnp.zeros(sym.shape, I32)
    for s in range(len(tab)):
        v = int(tab[s])
        if v:
            out = out + jnp.where(sym == s, I32(v), I32(0))
    return out


def lut2(table2d: np.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact 2D table lookup: one-hot row matmul + masked column select.

    table2d: [na, nb] small non-negative ints (exact in bf16); a, b: int32
    indices with a shared leading shape. Integer-exact: the one-hot matmul
    has exactly one nonzero product per output (0/1 x value <= 255, f32
    accumulation), and the column select is a single-term masked sum.

    Cost is na + nb VPU compare/select passes plus one tiny MXU matmul —
    vs na*nb passes for `lut` on the fused symbol a*nb+b (the 289-pass
    escape-pair lookup becomes 34 passes).
    """
    tab = jnp.asarray(np.asarray(table2d), jnp.bfloat16)
    na, nb = tab.shape
    oh_a = (a[..., None] == jnp.arange(na, dtype=a.dtype)).astype(jnp.bfloat16)
    # bf16 output is exact here: every product is 0/1 x (value <= 255) and
    # only one term per row is nonzero, so no rounding can occur — and the
    # [..., nb] intermediate costs half the HBM traffic of f32.
    rows = jnp.einsum("...a,ab->...b", oh_a, tab,
                      precision=jax.lax.Precision.DEFAULT,
                      preferred_element_type=jnp.bfloat16)
    oh_b = b[..., None] == jnp.arange(nb, dtype=b.dtype)
    return jnp.sum(jnp.where(oh_b, rows, 0.0), axis=-1).astype(I32)


def _select_by_bt(tables5: np.ndarray, bt: jnp.ndarray) -> jnp.ndarray:
    """tables5 [5, ...] constant + bt [F] -> [F, ...] (branchless select)."""
    t5 = jnp.asarray(tables5)
    out = jnp.zeros((bt.shape[0],) + t5.shape[1:], t5.dtype)
    for t in range(t5.shape[0]):
        sel = (bt == t).astype(t5.dtype).reshape(
            (-1,) + (1,) * (t5.ndim - 1))
        out = out + sel * t5[t][None]
    return out


def band_sum_mm(per_item: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Integer-exact band reduction as a bf16 mask matmul on the MXU.

    per_item: [F, ..., T] int values <= 256; mask: [F, T, NB] 0/1 bf16.
    Products are exact in bf16 and accumulate in f32 (< 2^24), so the
    result is exact. Returns int32 [F, ..., NB].
    """
    lhs = per_item.astype(jnp.bfloat16)
    out = jnp.einsum("f...t,ftn->f...n", lhs, mask,
                     precision=jax.lax.Precision.DEFAULT,
                     preferred_element_type=jnp.float32)
    return out.astype(I32)


@functools.lru_cache(maxsize=None)
def _stacked_masks(fs: int):
    """Constant block-type-stacked 0/1 masks for band reductions.

    Stacking the five per-block-type masks along the output axis turns the
    per-frame-mask matmul (which materializes an [F, T, NB] mask tensor in
    HBM and re-reads it on every call) into ONE constant-operand matmul
    producing [..., 5*NB], followed by a cheap per-frame group select. For
    the small candidate counts of the refine loop this cuts HBM traffic by
    an order of magnitude. Integer-exact: 0/1 x (value <= 256) products are
    exact in bf16 and f32 accumulation stays < 2^24.
    """
    lay = T.unified_layout(fs)
    nb = lay["nb"]

    def stack(m):   # [T_types, T_items, NB] -> [T_items, T_types*NB]
        return np.concatenate([np.asarray(m[t], np.float32)
                               for t in range(C.N_BLOCK_TYPES)], axis=1)

    # NOTE: cache numpy, not jnp — a jnp constant created inside a trace is
    # a tracer, and caching it across jit boundaries leaks it.
    return {
        "s2": stack(lay["mask2"]),
        "s4": stack(lay["mask4"]),
        # [NB, T_types*1024]: expands per-band values to per-bin values
        "sbin": np.concatenate(
            [np.asarray(lay["band_mask"][t], np.float32).T
             for t in range(C.N_BLOCK_TYPES)], axis=1),
        "nb": nb,
    }


def _select_group(out5: jnp.ndarray, bt: jnp.ndarray, nb: int) -> jnp.ndarray:
    """[F, ..., 5*nb] f32 + bt [F] -> [F, ..., nb] i32 (branchless select)."""
    res = jnp.zeros(out5.shape[:-1] + (nb,), jnp.float32)
    for t in range(C.N_BLOCK_TYPES):
        sel = (bt == t).astype(jnp.float32).reshape(
            (-1,) + (1,) * (out5.ndim - 1))
        res = res + sel * out5[..., t * nb:(t + 1) * nb]
    return res.astype(I32)


def band_sum_sel(per_item: jnp.ndarray, bt: jnp.ndarray,
                 stacked: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Integer-exact band reduction via the stacked constant mask.

    per_item: [F, ..., T] int values <= 256 (frame axis first); stacked:
    [T, 5*nb] from _stacked_masks. Returns int32 [F, ..., nb]."""
    out5 = jnp.einsum("f...t,tn->f...n", per_item.astype(jnp.bfloat16),
                      jnp.asarray(stacked, jnp.bfloat16),
                      precision=jax.lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)
    return _select_group(out5, bt, nb)


def amp_to_bins(amp: jnp.ndarray, bt: jnp.ndarray, fs: int) -> jnp.ndarray:
    """[F, NB] int amp -> [F, 1024] per-bin amp (exact band expansion).

    Every bin belongs to exactly one band (tables.unified_layout invariant,
    checked at table build), so the 0/1 expansion matmul is exact and
    clip(gain - amp_to_bins(amp)) equals the spec's per-band clip followed
    by bin_band indexing."""
    st = _stacked_masks(fs)
    out5 = jnp.einsum("fn,nt->ft", amp.astype(jnp.bfloat16),
                      jnp.asarray(st["sbin"], jnp.bfloat16),
                      precision=jax.lax.Precision.DEFAULT,
                      preferred_element_type=jnp.float32)
    return _select_group(out5, bt, C.LONG_COEFFS)


def escape_bits(mag: jnp.ndarray) -> jnp.ndarray:
    """Escape suffix bits per value: integer-exact (no float log2)."""
    m = jnp.abs(mag)
    # e = floor(log2(m)) for m >= 16 via threshold comparisons
    e = jnp.int32(4)
    for k in range(5, 13):        # QMAX = 4095 < 2^12
        e = e + (m >= (1 << k)).astype(I32)
    return jnp.where(m >= C.ESC_MAG, 2 * e - 3, 0)


def payload_costs_and_choice(q: jnp.ndarray, bt: jnp.ndarray, fs: int,
                             masks=None):
    """Quantized frames -> per-band codebook choice and payload bits.

    q: [F, ..., 1024] int32, bt: [F] int32 block types (first axis shared;
    q may carry extra middle axes, e.g. a gain-candidate axis).
    Returns (cb[F, ..., NB] int32, payload[F, ..., NB] int32).

    All reductions are masked-sum lookups + bf16 mask matmuls (exact); no
    gathers — TPU gathers made the original formulation ~500x slower.
    """
    tb = _dev_tables(fs)
    st = _stacked_masks(fs)
    nb = st["nb"]
    lead = q.shape[:-1]
    width = _select_by_bt(tb["width"], bt)        # [F, NB]
    wshape = (width.shape[0],) + (1,) * (len(lead) - 1) + (width.shape[-1],)
    width = width.reshape(wshape)

    aq = jnp.abs(q)
    # CB_SMALL: 4-tuples of clipped values, split into two 9-way digits
    c = jnp.clip(q, -1, 1) + 1
    t4 = c.reshape(lead + (-1, 4))
    bits1 = band_sum_sel(lut2(tb["len_small"].reshape(9, 9),
                              t4[..., 0] * 3 + t4[..., 1],
                              t4[..., 2] * 3 + t4[..., 3]), bt, st["s4"], nb)
    # CB_MID: pairs
    c2 = jnp.clip(q, -4, 4) + 4
    t2 = c2.reshape(lead + (-1, 2))
    bits2 = band_sum_sel(lut2(tb["len_mid"].reshape(9, 9),
                              t2[..., 0], t2[..., 1]), bt, st["s2"], nb)
    # CB_ESC: magnitude pairs + signs + escapes
    m2 = jnp.minimum(aq, C.ESC_MAG).reshape(lead + (-1, 2))
    qp = aq.reshape(lead + (-1, 2))
    esc = (lut2(tb["len_esc"].reshape(C.ESC_MAG + 1, C.ESC_MAG + 1),
                m2[..., 0], m2[..., 1])
           + (qp[..., 0] != 0).astype(I32) + (qp[..., 1] != 0).astype(I32)
           + escape_bits(qp[..., 0]) + escape_bits(qp[..., 1]))
    bits3 = band_sum_sel(esc, bt, st["s2"], nb)

    # validity via integer pair counts (exact; <= 2 per pair)
    pair = lambda pred: (pred.reshape(lead + (-1, 2))[..., 0].astype(I32)
                         + pred.reshape(lead + (-1, 2))[..., 1].astype(I32))
    n_gt0 = band_sum_sel(pair(aq > 0), bt, st["s2"], nb)
    n_gt1 = band_sum_sel(pair(aq > 1), bt, st["s2"], nb)
    n_gt4 = band_sum_sel(pair(aq > 4), bt, st["s2"], nb)

    costs = jnp.stack([jnp.zeros_like(bits1), bits1, bits2, bits3], axis=-1)
    valid = jnp.stack([n_gt0 == 0, n_gt1 == 0, n_gt4 == 0,
                       jnp.ones_like(n_gt0, dtype=bool)], axis=-1)
    masked = jnp.where(valid, costs, BIG)
    cb = jnp.argmin(masked, axis=-1).astype(I32)
    payload = jnp.min(masked, axis=-1)
    empty = width == 0
    cb = jnp.where(empty, 0, cb)
    payload = jnp.where(empty, 0, payload)
    return cb, payload


def sf_delta_bits(amp: jnp.ndarray, width: jnp.ndarray) -> jnp.ndarray:
    """[..., NB] amp + width -> [...] total scale-factor bits (exact)."""
    tb_sf = np.asarray(T.code_arrays()["len_sf"], np.int32)
    real = width > 0
    a = jnp.where(real, amp, 0)
    prev = jnp.concatenate([jnp.zeros_like(a[..., :1]), a[..., :-1]], axis=-1)
    delta = prev - a
    bits = lut(tb_sf, delta + C.SF_DELTA_MAX)
    return jnp.where(real, bits, 0).sum(axis=-1)


def frame_content_bits(q: jnp.ndarray, amp: jnp.ndarray, bt: jnp.ndarray,
                       fs: int, masks=None) -> jnp.ndarray:
    """Exact frame content bit count. q: [..., 1024], amp: [..., NB]."""
    tb = _dev_tables(fs)
    width = _select_by_bt(tb["width"], bt)
    nreal = lut(tb["nreal"], bt)
    _, payload = payload_costs_and_choice(q, bt, fs, masks=masks)
    fixed = C.BLOCK_TYPE_BITS + C.GAIN_BITS + C.CB_BITS * nreal
    wshape = (width.shape[0],) + (1,) * (q.ndim - 2) + (width.shape[-1],)
    sf = sf_delta_bits(amp, width.reshape(wshape))
    fshape = (nreal.shape[0],) + (1,) * (q.ndim - 2)
    return fixed.reshape(fshape) + sf + payload.sum(axis=-1)
