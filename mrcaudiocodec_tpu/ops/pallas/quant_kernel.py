"""Pallas TPU kernel: fused quantization inner-loop cost sweep (N4).

For a block of frames and all candidate gains at once: quantize, map to
codebook symbols, accumulate exact Huffman bit costs per band (masked-sum
table lookups — no HBM round-trips for the [F, G, 1024] intermediates the
XLA path materializes), pick the cheapest valid codebook per band, and
return total payload bits per (frame, gain).

The XLA path (ops/rd._bits_for_gains) is already fast; this kernel is the
fused alternative for the hot inner loop, validated bit-exact against it in
tests/test_pallas.py and selectable via MRC_USE_PALLAS=1.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ... import config as C
from ... import tables as T

BLOCK_F = 8
BIG = np.int32(1 << 24)


def _lookup(sym, table_ref, n_sym):
    """Exact table lookup via fori masked accumulation (VPU-friendly)."""
    def body(s, acc):
        return acc + table_ref[s] * (sym == s).astype(jnp.int32)
    return jax.lax.fori_loop(0, n_sym, body, jnp.zeros_like(sym))


def _quant_kernel(x_ref, amp_bin_ref, gains_ref, mask2_ref, mask4_ref,
                  small_ref, mid_ref, esc_ref, out_ref):
    """x [BF,1024], amp_bin [BF,1024], gains [BF,G],
    mask2 [BF,512,96], mask4 [BF,256,96] (band membership, f32),
    len tables; out [BF,G] payload bits."""
    x = x_ref[:]
    ax = jnp.abs(x)
    amp_bin = amp_bin_ref[:]
    g_count = gains_ref.shape[1]
    mask2 = mask2_ref[:]
    mask4 = mask4_ref[:]

    def per_gain(gi, _):
        g = gains_ref[:, gi]                                   # [BF]
        e = jnp.clip(g[:, None] - amp_bin, C.GAIN_MIN, C.GAIN_MAX)
        step = jnp.exp2((e.astype(jnp.float32) - C.GAIN_BIAS) / 4.0)
        a = ax / step
        mag = jnp.minimum(jnp.floor(a ** 0.75 + C.QUANT_MAGIC),
                          float(C.QMAX)).astype(jnp.int32)     # [BF,1024]
        neg = (x < 0)

        # symbols
        q = jnp.where(neg, -mag, mag)
        t4 = jnp.clip(q, -1, 1) + 1
        t4 = t4.reshape(-1, 256, 4)
        sym1 = ((t4[..., 0] * 3 + t4[..., 1]) * 3 + t4[..., 2]) * 3 + t4[..., 3]
        t2 = jnp.clip(q, -4, 4) + 4
        t2 = t2.reshape(-1, 512, 2)
        sym2 = t2[..., 0] * 9 + t2[..., 1]
        m2 = jnp.minimum(mag, C.ESC_MAG).reshape(-1, 512, 2)
        sym3 = m2[..., 0] * (C.ESC_MAG + 1) + m2[..., 1]

        bits1_t = _lookup(sym1, small_ref, 81)                 # [BF,256]
        bits2_t = _lookup(sym2, mid_ref, 81)                   # [BF,512]
        # escape extra bits: signs + suffixes (integer-exact)
        mp = mag.reshape(-1, 512, 2)
        e_esc = jnp.full(mp.shape, 4, jnp.int32)
        for k in range(5, 13):
            e_esc = e_esc + (mp >= (1 << k)).astype(jnp.int32)
        extra = (jnp.where(mp >= C.ESC_MAG, 2 * e_esc - 3, 0)
                 + (mp > 0).astype(jnp.int32)).sum(axis=-1)    # [BF,512]
        bits3_t = _lookup(sym3, esc_ref, 289) + extra

        # band reductions (mask matmuls, integer-exact in f32 < 2^24)
        def bsum(v, mask):
            return jax.lax.dot_general(
                v.astype(jnp.float32)[:, None, :], mask,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]
        b1 = bsum(bits1_t, mask4).astype(jnp.int32)            # [BF,96]
        b2 = bsum(bits2_t, mask2).astype(jnp.int32)
        b3 = bsum(bits3_t, mask2).astype(jnp.int32)
        n0 = bsum((mag.reshape(-1, 512, 2) > 0).sum(-1), mask2).astype(jnp.int32)
        n1 = bsum((mag.reshape(-1, 512, 2) > 1).sum(-1), mask2).astype(jnp.int32)
        n4 = bsum((mag.reshape(-1, 512, 2) > 4).sum(-1), mask2).astype(jnp.int32)

        c1 = jnp.where(n1 == 0, b1, BIG)
        c2 = jnp.where(n4 == 0, b2, BIG)
        cost = jnp.minimum(jnp.minimum(c1, c2), b3)
        cost = jnp.where(n0 == 0, 0, cost)                     # CB_ZERO
        out_ref[:, gi] = cost.sum(axis=-1)
        return 0

    jax.lax.fori_loop(0, g_count, per_gain, 0)


@functools.lru_cache(maxsize=None)
def _masks(fs: int):
    """Tuple-granular band masks per block type: [5, 512, NB], [5, 256, NB]."""
    lay = T.unified_layout(fs)
    nb = lay["nb"]
    m2 = np.zeros((C.N_BLOCK_TYPES, 512, nb), np.float32)
    m4 = np.zeros((C.N_BLOCK_TYPES, 256, nb), np.float32)
    for t in range(C.N_BLOCK_TYPES):
        bb = lay["bin_band"][t]
        m2[t, np.arange(512), bb[::2]] = 1.0
        m4[t, np.arange(256), bb[::4]] = 1.0
    return m2, m4


def payload_bits_for_gains(coeffs, amp, gains, bt, fs: int,
                           interpret: bool = False):
    """[F,1024] x [F,NB] x [F,G] x [F] -> payload bits [F,G] int32."""
    ca = T.code_arrays()
    lay = T.unified_layout(fs)
    nf, g = gains.shape
    assert nf % BLOCK_F == 0
    bin_band = jnp.asarray(lay["bin_band"])[bt]
    amp_bin = jnp.take_along_axis(amp, bin_band, axis=-1)      # [F,1024]
    m2_t, m4_t = _masks(fs)
    mask2 = jnp.asarray(m2_t)[bt]                              # [F,512,NB]
    mask4 = jnp.asarray(m4_t)[bt]
    nb = lay["nb"]

    return pl.pallas_call(
        _quant_kernel,
        out_shape=jax.ShapeDtypeStruct((nf, g), jnp.int32),
        grid=(nf // BLOCK_F,),
        in_specs=[
            pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, g), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, 512, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((BLOCK_F, 256, nb), lambda i: (i, 0, 0)),
            pl.BlockSpec((81,), lambda i: (0,)),
            pl.BlockSpec((81,), lambda i: (0,)),
            pl.BlockSpec((289,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((BLOCK_F, g), lambda i: (i, 0)),
        interpret=interpret,
    )(coeffs.astype(jnp.float32), amp_bin.astype(jnp.int32),
      gains.astype(jnp.int32), mask2, mask4,
      jnp.asarray(ca["len_small"], jnp.int32),
      jnp.asarray(ca["len_mid"], jnp.int32),
      jnp.asarray(ca["len_esc"], jnp.int32))


def bits_for_gains(coeffs, amp, gains, bt, fs: int, interpret: bool = False):
    """Full frame-bit mirror of ops.rd._bits_for_gains (bits only)."""
    from .. import entropy
    tb = entropy._dev_tables(fs)
    payload = payload_bits_for_gains(coeffs, amp, gains, bt, fs,
                                     interpret=interpret)
    width = jnp.asarray(tb["width"])[bt]
    nreal = jnp.asarray(tb["nreal"])[bt]
    sf = entropy.sf_delta_bits(amp, width)
    fixed = C.BLOCK_TYPE_BITS + C.GAIN_BITS + C.CB_BITS * nreal
    return payload + (fixed + sf)[:, None]
