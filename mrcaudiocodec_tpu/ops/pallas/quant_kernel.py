"""Pallas TPU kernel: fused quantization inner-loop cost sweep (N4).

Grid = (frame blocks, gain candidates). Each instance quantizes one frame
block at one gain and accumulates the exact Huffman payload bits per band
without touching HBM for any [F, G, 1024] intermediate:

* codeword-length lookups are one-hot bf16 dots against the length tables
  (builds a [tuples, n_sym] one-hot in VMEM via iota compare — no dynamic
  indexing, nothing Mosaic cannot lower),
* the escape-pair table is looked up in SEPARABLE form — row select via
  onehot(m0) @ L[17,17], column select via a masked row sum with
  onehot(m1) — so the worst one-hot is 17 wide, not 289 (the round-1
  [16k, 289] bf16 one-hot was ~9.5 MB of VMEM and crashed the Mosaic
  compile; VERDICT r1 #2),
* band reductions are 0/1 mask matmuls per block type, combined branchless.

All lookup arithmetic is integer-valued (lengths <= 256, bf16-exact), so
the kernel is bit-exact vs the XLA path (ops/rd._bits_for_gains) —
asserted in tests/test_pallas.py (interpret) and on hardware by
scripts/tpu_kernel_probe.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ... import config as C
from ... import tables as T

BLOCK_F = 32
BIG = np.int32(1 << 24)


def _onehot_dot(sym, table, n_sym: int):
    """Exact lookup: one-hot(sym) @ table via iota compare + MXU dot.

    sym [R, T] int32 in [0, n_sym); table [n_sym, 1] f32 (integer-valued,
    <= 256 so bf16-exact). Returns [R, T] f32 (integer-valued).
    """
    r, t = sym.shape
    flat = sym.reshape(r * t, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r * t, n_sym), 1)
    onehot = (flat == iota).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        onehot, table.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape(r, t)


def _esc_pair_dot(m0, m1, esc17):
    """Exact separable pair lookup: L[m0, m1] per tuple.

    m0/m1 [R, T] int32 in [0, 17); esc17 [17, 17] f32 (integer entries).
    rows = onehot(m0) @ esc17 selects row m0 (sum of one product); the
    masked row sum with onehot(m1) selects the column. Both exact."""
    r, t = m0.shape
    n = C.ESC_MAG + 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (r * t, n), 1)
    oh0 = (m0.reshape(r * t, 1) == iota).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        oh0, esc17.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [R*T, 17]
    sel = (m1.reshape(r * t, 1) == iota).astype(jnp.float32)
    return jnp.sum(rows * sel, axis=1).reshape(r, t)


def _quant_kernel(x_ref, amp_bin_ref, gains_ref, bt_ref,
                  small_ref, mid_ref, esc_ref,
                  mask2_ref, mask4_ref, out_ref):
    """x [BF,1024], amp_bin [BF,1024], gains [BF,G], bt [BF,1],
    small/mid len tables [81,1] f32, esc table [17,17] f32,
    mask2 [5,512,NB], mask4 [5,256,NB] f32;
    out [BF,G]: total payload bits per (frame, gain).

    The gain loop is a fori with NO dynamic ref indexing: the current
    column is selected and the result accumulated via iota one-hots."""
    x = x_ref[:]
    ax = jnp.abs(x)
    bt = bt_ref[:, 0]
    gains = gains_ref[:]                                   # [BF, G]
    g_count = gains.shape[1]
    giota = jax.lax.broadcasted_iota(jnp.int32, (1, g_count), 1)

    def per_gain(gi, acc_out):
        g = jnp.sum(jnp.where(giota == gi, gains, 0), axis=1)   # [BF]
        e = jnp.clip(g[:, None] - amp_bin_ref[:], C.GAIN_MIN, C.GAIN_MAX)
        step = jnp.exp2((e.astype(jnp.float32) - C.GAIN_BIAS) / 4.0)
        mag = jnp.minimum(jnp.floor((ax / step) ** 0.75 + C.QUANT_MAGIC),
                          float(C.QMAX)).astype(jnp.int32)  # [BF, 1024]
        q = jnp.where(x < 0, -mag, mag)

        bf = x.shape[0]
        t4 = (jnp.clip(q, -1, 1) + 1).reshape(bf, 256, 4)
        sym1 = (((t4[..., 0] * 3 + t4[..., 1]) * 3 + t4[..., 2]) * 3
                + t4[..., 3])
        t2 = (jnp.clip(q, -4, 4) + 4).reshape(bf, 512, 2)
        sym2 = t2[..., 0] * 9 + t2[..., 1]
        m2 = jnp.minimum(mag, C.ESC_MAG).reshape(bf, 512, 2)

        bits1_t = _onehot_dot(sym1, small_ref[:], 81)      # [BF, 256]
        bits2_t = _onehot_dot(sym2, mid_ref[:], 81)
        mp = mag.reshape(bf, 512, 2)
        e_esc = jnp.full(mp.shape, 4, jnp.int32)
        for k in range(5, 13):
            e_esc = e_esc + (mp >= (1 << k)).astype(jnp.int32)
        extra = (jnp.where(mp >= C.ESC_MAG, 2 * e_esc - 3, 0)
                 + (mp > 0).astype(jnp.int32)).sum(axis=-1)  # [BF, 512]
        bits3_t = (_esc_pair_dot(m2[..., 0], m2[..., 1], esc_ref[:])
                   + extra.astype(jnp.float32))

        n0_t = (mp > 0).sum(axis=-1).astype(jnp.float32)
        n1_t = (mp > 1).sum(axis=-1).astype(jnp.float32)
        n4_t = (mp > 4).sum(axis=-1).astype(jnp.float32)

        # band reductions: 5 static mask matmuls, combined branchless
        nb = mask2_ref.shape[-1]
        acc = [jnp.zeros((bf, nb), jnp.float32) for _ in range(6)]
        for t in range(C.N_BLOCK_TYPES):
            sel = (bt == t).astype(jnp.float32)[:, None]
            m2m = mask2_ref[t]
            m4m = mask4_ref[t]

            def dot(v, m):
                return jax.lax.dot_general(
                    v.astype(jnp.float32), m,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc[0] = acc[0] + sel * dot(bits1_t, m4m)
            acc[1] = acc[1] + sel * dot(bits2_t, m2m)
            acc[2] = acc[2] + sel * dot(bits3_t, m2m)
            acc[3] = acc[3] + sel * dot(n0_t, m2m)
            acc[4] = acc[4] + sel * dot(n1_t, m2m)
            acc[5] = acc[5] + sel * dot(n4_t, m2m)
        b1, b2, b3, n0, n1, n4 = [a.astype(jnp.int32) for a in acc]

        c1 = jnp.where(n1 == 0, b1, BIG)
        c2 = jnp.where(n4 == 0, b2, BIG)
        cost = jnp.minimum(jnp.minimum(c1, c2), b3)
        cost = jnp.where(n0 == 0, 0, cost)
        total = cost.sum(axis=-1).astype(jnp.int32)        # [BF]
        return acc_out + total[:, None] * (giota == gi).astype(jnp.int32)

    out_ref[:] = jax.lax.fori_loop(
        0, g_count, per_gain, jnp.zeros(out_ref.shape, jnp.int32))


@functools.lru_cache(maxsize=None)
def _masks(fs: int):
    lay = T.unified_layout(fs)
    return (np.ascontiguousarray(lay["mask2"], np.float32),
            np.ascontiguousarray(lay["mask4"], np.float32))


def payload_bits_for_gains(coeffs, amp, gains, bt, fs: int,
                           interpret: bool = False):
    """[F,1024] x [F,NB] x [F,G] x [F] -> payload bits [F,G] int32."""
    ca = T.code_arrays()
    lay = T.unified_layout(fs)
    nf, g = gains.shape
    assert nf % BLOCK_F == 0
    bin_band = jnp.asarray(lay["bin_band"])[bt]
    amp_bin = jnp.take_along_axis(amp.astype(jnp.int32), bin_band, axis=-1)
    m2, m4 = _masks(fs)
    nb = lay["nb"]

    def tab(a):
        return np.asarray(a, np.float32).reshape(-1, 1)

    out = pl.pallas_call(
        _quant_kernel,
        out_shape=jax.ShapeDtypeStruct((nf, g), jnp.int32),
        grid=(nf // BLOCK_F,),
        in_specs=[
            pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, g), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, 1), lambda i: (i, 0)),
            pl.BlockSpec((81, 1), lambda i: (0, 0)),
            pl.BlockSpec((81, 1), lambda i: (0, 0)),
            pl.BlockSpec((C.ESC_MAG + 1, C.ESC_MAG + 1), lambda i: (0, 0)),
            pl.BlockSpec((C.N_BLOCK_TYPES, 512, nb), lambda i: (0, 0, 0)),
            pl.BlockSpec((C.N_BLOCK_TYPES, 256, nb), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_F, g), lambda i: (i, 0)),
        interpret=interpret,
    )(coeffs.astype(jnp.float32), amp_bin, gains.astype(jnp.int32),
      bt.astype(jnp.int32).reshape(nf, 1),
      tab(ca["len_small"]), tab(ca["len_mid"]),
      np.asarray(ca["len_esc"], np.float32).reshape(C.ESC_MAG + 1,
                                                    C.ESC_MAG + 1),
      m2, m4)
    return out


def bits_for_gains(coeffs, amp, gains, bt, fs: int, interpret: bool = False):
    """Full frame-bit mirror of ops.rd._bits_for_gains (bits only)."""
    from .. import entropy
    tb = entropy._dev_tables(fs)
    payload = payload_bits_for_gains(coeffs, amp, gains, bt, fs,
                                     interpret=interpret)
    width = entropy._select_by_bt(tb["width"], bt)
    nreal = entropy.lut(tb["nreal"], bt)
    sf = entropy.sf_delta_bits(amp, width)
    fixed = C.BLOCK_TYPE_BITS + C.GAIN_BITS + C.CB_BITS * nreal
    return payload + (fixed + sf)[:, None]
