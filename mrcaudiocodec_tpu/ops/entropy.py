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


def escape_bits(mag: jnp.ndarray) -> jnp.ndarray:
    """Escape suffix bits per value: integer-exact (no float log2)."""
    m = jnp.abs(mag)
    # e = floor(log2(m)) for m >= 16 via threshold comparisons
    e = jnp.int32(4)
    for k in range(5, 13):        # QMAX = 4095 < 2^12
        e = e + (m >= (1 << k)).astype(I32)
    return jnp.where(m >= C.ESC_MAG, 2 * e - 3, 0)


def payload_costs_and_choice(q: jnp.ndarray, bt: jnp.ndarray, fs: int):
    """Quantized frames -> per-band codebook choice and payload bits.

    q: [..., 1024] int32, bt: [...] int32 block types (leading axes shared).
    Returns (cb[..., NB] int32, payload[..., NB] int32).
    """
    tb = _dev_tables(fs)
    lead = q.shape[:-1]
    edges = jnp.asarray(tb["edges"])[bt]          # [..., NB+1]
    e4 = jnp.asarray(tb["edges4"])[bt]
    e2 = jnp.asarray(tb["edges2"])[bt]
    width = jnp.asarray(tb["width"])[bt]          # [..., NB]

    aq = jnp.abs(q)
    # CB_SMALL: 4-tuples of clipped values
    c = jnp.clip(q, -1, 1) + 1
    t4 = c.reshape(lead + (-1, 4))
    sym1 = ((t4[..., 0] * 3 + t4[..., 1]) * 3 + t4[..., 2]) * 3 + t4[..., 3]
    bits1 = _band_sum_int(jnp.take(jnp.asarray(tb["len_small"]), sym1), e4)
    # CB_MID: pairs
    c2 = jnp.clip(q, -4, 4) + 4
    t2 = c2.reshape(lead + (-1, 2))
    sym2 = t2[..., 0] * 9 + t2[..., 1]
    bits2 = _band_sum_int(jnp.take(jnp.asarray(tb["len_mid"]), sym2), e2)
    # CB_ESC: magnitude pairs + signs + escapes
    m2 = jnp.minimum(aq, C.ESC_MAG).reshape(lead + (-1, 2))
    sym3 = m2[..., 0] * (C.ESC_MAG + 1) + m2[..., 1]
    qp = q.reshape(lead + (-1, 2))
    esc = (jnp.take(jnp.asarray(tb["len_esc"]), sym3)
           + (qp[..., 0] != 0).astype(I32) + (qp[..., 1] != 0).astype(I32)
           + escape_bits(qp[..., 0]) + escape_bits(qp[..., 1]))
    bits3 = _band_sum_int(esc, e2)

    # validity via integer counts (exact)
    n_gt0 = _band_sum_int((aq > 0).astype(I32), edges)
    n_gt1 = _band_sum_int((aq > 1).astype(I32), edges)
    n_gt4 = _band_sum_int((aq > 4).astype(I32), edges)

    costs = jnp.stack([jnp.zeros_like(bits1), bits1, bits2, bits3], axis=-1)
    valid = jnp.stack([n_gt0 == 0, n_gt1 == 0, n_gt4 == 0,
                       jnp.ones_like(n_gt0, dtype=bool)], axis=-1)
    masked = jnp.where(valid, costs, BIG)
    cb = jnp.argmin(masked, axis=-1).astype(I32)
    payload = jnp.take_along_axis(masked, cb[..., None], axis=-1)[..., 0]
    empty = width == 0
    cb = jnp.where(empty, 0, cb)
    payload = jnp.where(empty, 0, payload)
    return cb, payload


def sf_delta_bits(amp: jnp.ndarray, width: jnp.ndarray) -> jnp.ndarray:
    """[..., NB] amp + width -> [...] total scale-factor bits (exact)."""
    tb_sf = jnp.asarray(np.asarray(T.code_arrays()["len_sf"], np.int32))
    real = width > 0
    a = jnp.where(real, amp, 0)
    prev = jnp.concatenate([jnp.zeros_like(a[..., :1]), a[..., :-1]], axis=-1)
    delta = prev - a
    bits = jnp.take(tb_sf, delta + C.SF_DELTA_MAX)
    return jnp.where(real, bits, 0).sum(axis=-1)


def frame_content_bits(q: jnp.ndarray, amp: jnp.ndarray, bt: jnp.ndarray,
                       fs: int) -> jnp.ndarray:
    """Exact frame content bit count. q: [..., 1024], amp: [..., NB]."""
    tb = _dev_tables(fs)
    width = jnp.asarray(tb["width"])[bt]
    nreal = jnp.asarray(tb["nreal"])[bt]
    _, payload = payload_costs_and_choice(q, bt, fs)
    fixed = C.BLOCK_TYPE_BITS + C.GAIN_BITS + C.CB_BITS * nreal
    return fixed + sf_delta_bits(amp, width) + payload.sum(axis=-1)
