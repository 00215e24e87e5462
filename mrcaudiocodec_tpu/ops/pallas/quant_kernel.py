"""Pallas TPU kernel: fused quantization inner-loop cost sweep (N4).

Grid = (frame blocks,); a fori loop sweeps the gain candidates. Each
instance quantizes one frame block at every gain and accumulates the
exact Huffman payload bits per band without touching HBM for any
[F, G, 1024] intermediate.

Mosaic constraint (measured on the axon v5e: scripts/tpu_quant_bisect.py,
scripts/tpu_primitive_probe.py): ANY lane-splitting reshape —
[F,1024]->[F,512,2] tuple views and [F,T]->[F*T,1] one-hot rows alike —
crashes the remote compile. The kernel therefore works ENTIRELY in flat
[BF, 1024] lane layout:

* tuple neighbours come from `pltpu.roll` along the lane axis (probe:
  PASS, bit-exact),
* codeword lengths come from a separable decomposition of each 2-D length
  table, L[a,b] = R[a] + C[b] + D[a,b] with sparse D, unrolled as
  compile-time-constant compare/select/add passes (35 passes for the 9x9
  small/mid tables, ~120 for the 17x17 escape table — vs 81/289 direct),
* tuple values live at their first bin (garbage elsewhere); the band-sum
  masks are zero off tuple starts, so one stacked bf16 matmul per block
  type reduces all seven per-position quantities at once (lane-padded to
  128 bands — Mosaic-aligned).

All lookup arithmetic is integer-valued in f32/bf16-exact ranges, so the
kernel is bit-exact vs the XLA path (ops/rd._bits_for_gains) — asserted
in tests/test_pallas.py (interpret) and on hardware by
scripts/tpu_kernel_probe.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config as C
from ... import tables as T

BLOCK_F = 32
NB_PAD = 128          # band axis padded to one full lane tile
BIG = float(1 << 24)


@functools.lru_cache(maxsize=None)
def _sep(name: str):
    """Separable decomposition of a 2-D length table.

    Returns (R[na], Cc[nb], D sparse list[(sym, val)]) with
    L[a,b] == R[a] + Cc[b] + D[a*nb+b] and D holding only the nonzero
    residuals (17 cells for the 9x9 tables, 87 for the 17x17 escape
    table). Anchor (r0, c0) chosen for minimum residual count.
    """
    ca = T.code_arrays()
    n = 9 if name in ("len_small", "len_mid") else C.ESC_MAG + 1
    L = np.asarray(ca[name], np.int64).reshape(n, n)
    best = None
    for r0 in range(n):
        for c0 in range(n):
            d = L - L[:, c0:c0 + 1] - L[r0:r0 + 1, :] + L[r0, c0]
            nnz = np.count_nonzero(d)
            if best is None or nnz < best[0]:
                best = (nnz, r0, c0)
    _, r0, c0 = best
    R = (L[:, c0] - L[r0, c0]).astype(np.int64)
    Cc = L[r0, :].astype(np.int64)
    D = L - R[:, None] - Cc[None, :]
    sparse = [(int(a * n + b), int(D[a, b]))
              for a in range(n) for b in range(n) if D[a, b]]
    assert np.array_equal(R[:, None] + Cc[None, :] + D, L)
    return R.tolist(), Cc.tolist(), sparse


def _lut_const(idx, vals):
    """Unrolled constant 1-D lookup: vals[idx] as f32 masked sums."""
    out = jnp.zeros(idx.shape, jnp.float32)
    for s, v in enumerate(vals):
        if v:
            out = out + jnp.where(idx == s, jnp.float32(v), 0.0)
    return out


def _lut_sparse(sym, pairs):
    """Unrolled sparse correction: sum of val * (sym == s)."""
    out = jnp.zeros(sym.shape, jnp.float32)
    for s, v in pairs:
        out = out + jnp.where(sym == s, jnp.float32(v), 0.0)
    return out


def _pair_bits(a, b, name):
    """L[a, b] for the named 2-D table, flat-lane exact."""
    n = 9 if name in ("len_small", "len_mid") else C.ESC_MAG + 1
    R, Cc, D = _sep(name)
    return (_lut_const(a, R) + _lut_const(b, Cc)
            + _lut_sparse(a * n + b, D))


def _roll1(v):
    """v[j+1] at lane j (wraps; wrapped lanes are masked off by the
    start-position band masks)."""
    return pltpu.roll(v, shift=C.LONG_COEFFS - 1, axis=1)


def _roll2(v):
    return pltpu.roll(v, shift=C.LONG_COEFFS - 2, axis=1)


def _quant_kernel(x_ref, amp_bin_ref, gains_ref, bt_ref, masks_ref,
                  out_ref):
    """x [BF,1024] f32, amp_bin [BF,1024] i32, gains [BF,G] i32,
    bt [BF,1] i32, masks [5, 1024, NB_PAD] bf16 (per-bin band membership,
    zero in padding cols); out [BF,G] i32 total payload bits.

    The gain loop is a fori with NO dynamic ref indexing: the current
    column is selected and the result accumulated via iota one-hots."""
    x = x_ref[:]
    ax = jnp.abs(x)
    bt = bt_ref[:, 0]
    gains = gains_ref[:]                                   # [BF, G]
    g_count = gains.shape[1]
    bf = x.shape[0]
    giota = jax.lax.broadcasted_iota(jnp.int32, (1, g_count), 1)
    jiota = jax.lax.broadcasted_iota(jnp.int32, (bf, C.LONG_COEFFS), 1)
    start2 = (jiota % 2 == 0).astype(jnp.float32)
    start4 = (jiota % 4 == 0).astype(jnp.float32)
    btcat = jnp.concatenate([bt_ref[:]] * 7, axis=0)       # [7BF, 1]

    def per_gain(gi, acc_out):
        from ... import xpsy
        g = jnp.sum(jnp.where(giota == gi, gains, 0), axis=1)   # [BF]
        e = jnp.clip(g[:, None] - amp_bin_ref[:], C.GAIN_MIN, C.GAIN_MAX)
        # normative rev-4 quantizer sequence (spec/quantize.py): once-
        # rounded reciprocal step (divide-free) + pinned Newton sqrt —
        # bit-identical to the spec (Mosaic emits plain single-rounded
        # IEEE mul/add, scripts/tpu_fma_probe.py)
        d = e - C.GAIN_BIAS
        r = d & 3
        inv_frac = jnp.where(
            r == 0, jnp.float32(1.0),
            jnp.where(r == 1, jnp.float32(2.0 ** -0.25),
                      jnp.where(r == 2, jnp.float32(2.0 ** -0.5),
                                jnp.float32(2.0 ** -0.75))))
        two_nk = jax.lax.bitcast_convert_type(
            (127 - (d >> 2)) << 23, jnp.float32)
        a = ax * (inv_frac * two_nk)
        p = xpsy.xsqrt(a * xpsy.xsqrt(a, jnp), jnp)
        mag = jnp.minimum(jnp.floor(p + C.QUANT_MAGIC),
                          float(C.QMAX)).astype(jnp.int32)  # [BF, 1024]

        # CB_SMALL: 4-tuples as two 9-way digits at lanes j%4==0
        c = jnp.clip(mag, 0, 1)
        c = jnp.where(x < 0, -c, c) + 1                     # trit + 1
        cpair = c * 3 + _roll1(c)                           # digit at even j
        bits1 = _pair_bits(cpair, _roll2(cpair), "len_small") * start4

        # CB_MID: 9-way pairs at even lanes
        c2 = jnp.clip(mag, 0, 4)
        c2 = jnp.where(x < 0, -c2, c2) + 4
        bits2 = _pair_bits(c2, _roll1(c2), "len_mid") * start2

        # CB_ESC: clipped magnitude pairs at even lanes; sign and escape
        # suffix bits are per-position and ride the per-bin mask directly
        m0 = jnp.minimum(mag, C.ESC_MAG)
        bits3 = _pair_bits(m0, _roll1(m0), "len_esc") * start2
        e_esc = jnp.full(mag.shape, 4, jnp.int32)
        for k in range(5, 13):
            e_esc = e_esc + (mag >= (1 << k)).astype(jnp.int32)
        extra = (jnp.where(mag >= C.ESC_MAG, 2 * e_esc - 3, 0)
                 + (mag > 0).astype(jnp.int32)).astype(jnp.float32)

        n0 = (mag > 0).astype(jnp.float32)
        n1 = (mag > 1).astype(jnp.float32)
        n4 = (mag > 4).astype(jnp.float32)

        # one stacked bf16 matmul per block type reduces all 7 quantities
        stacked = jnp.concatenate(
            [bits1, bits2, bits3, extra, n0, n1, n4],
            axis=0).astype(jnp.bfloat16)                    # [7BF, 1024]
        acc = jnp.zeros((7 * bf, NB_PAD), jnp.float32)
        for t in range(C.N_BLOCK_TYPES):
            sel = (btcat == t).astype(jnp.float32)          # [7BF, 1]
            # precision pinned to DEFAULT: the surrounding pipeline sets
            # default_matmul_precision("highest"), which Mosaic rejects
            # for bf16 operands ("Bad lhs type"). DEFAULT is exact here —
            # both operands are integer-valued bf16 (products <= 2^8,
            # band sums < 2^24) accumulated in f32.
            acc = acc + sel * jax.lax.dot_general(
                stacked, masks_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        b1 = acc[0 * bf:1 * bf]
        b2 = acc[1 * bf:2 * bf]
        b3 = acc[2 * bf:3 * bf] + acc[3 * bf:4 * bf]
        nb0 = acc[4 * bf:5 * bf]
        nb1 = acc[5 * bf:6 * bf]
        nb4 = acc[6 * bf:7 * bf]

        c1 = jnp.where(nb1 == 0, b1, BIG)
        c2c = jnp.where(nb4 == 0, b2, BIG)
        cost = jnp.minimum(jnp.minimum(c1, c2c), b3)
        cost = jnp.where(nb0 == 0, 0.0, cost)
        total = cost.sum(axis=-1).astype(jnp.int32)         # [BF]
        return acc_out + total[:, None] * (giota == gi).astype(jnp.int32)

    out_ref[:] = jax.lax.fori_loop(
        0, g_count, per_gain, jnp.zeros(out_ref.shape, jnp.int32))


@functools.lru_cache(maxsize=None)
def _flat_masks(fs: int) -> np.ndarray:
    """[5, 1024, NB_PAD] bf16 0/1: per-bin band membership per block type,
    band axis zero-padded to a full lane tile."""
    lay = T.unified_layout(fs)
    nb = lay["nb"]
    m = np.zeros((C.N_BLOCK_TYPES, C.LONG_COEFFS, NB_PAD), np.float32)
    for t in range(C.N_BLOCK_TYPES):
        m[t, :, :nb] = np.asarray(lay["band_mask"][t], np.float32)
    return m.astype(jnp.bfloat16)


def payload_bits_for_gains(coeffs, amp, gains, bt, fs: int,
                           interpret: bool = False):
    """[F,1024] x [F,NB] x [F,G] x [F] -> payload bits [F,G] int32."""
    from .. import entropy
    nf, g = gains.shape
    assert nf % BLOCK_F == 0
    amp_bin = entropy.amp_to_bins(amp.astype(jnp.int32), bt, fs)
    masks = _flat_masks(fs)

    out = pl.pallas_call(
        _quant_kernel,
        out_shape=jax.ShapeDtypeStruct((nf, g), jnp.int32),
        grid=(nf // BLOCK_F,),
        in_specs=[
            pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, C.LONG_COEFFS), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, g), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, 1), lambda i: (i, 0)),
            pl.BlockSpec((C.N_BLOCK_TYPES, C.LONG_COEFFS, NB_PAD),
                         lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_F, g), lambda i: (i, 0)),
        interpret=interpret,
    )(coeffs.astype(jnp.float32), amp_bin, gains.astype(jnp.int32),
      bt.astype(jnp.int32).reshape(nf, 1), masks)
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
