"""Pallas TPU kernel: fused normative DIF-FFT stages (SURVEY.md §2b N3).

The MDCT's normative arithmetic (xmath.py) is a fixed sequence of
single-rounded IEEE f32 ops: pre-twiddle -> radix-2 DIF butterflies ->
post-twiddle.  The XLA roll-form evaluation (xmath.fft_dif) materializes
every butterfly stage in HBM; this kernel runs ALL stages of a frame
block inside VMEM — one HBM read of z and one HBM write of y per frame,
regardless of stage count.

The arithmetic IS the spec: the kernel body literally calls
xmath.fft_dif_stages with roll=pltpu.roll, so every multiply/add/select
is the same op on the same operands as the NumPy spec codec's Stockham
chain (values proven bit-identical in tests/test_mdct.py; Mosaic emits
plain single-rounded IEEE mul/add — scripts/tpu_fma_probe.py; hardware
byte equality — scripts/tpu_xmath_probe.py).

Mosaic constraints honored (measured on the axon v5e in r2,
scripts/tpu_quant_bisect.py): flat lane layout only — no lane-splitting
reshape ever happens in-kernel; lane movement is exclusively pltpu.roll.
The bit-reversal (a lane-splitting transpose) and the pre/post twiddle
chains stay outside in XLA, where they fuse into neighbouring
elementwise work.

Both production FFT layouts run through ONE kernel shell:
  * long blocks:  fft_size=512, lanes=512 (one FFT per frame row)
  * short blocks: fft_size=64,  lanes=512 (the 8 sub-block FFTs of one
    frame side by side; masks/twiddles tile, and no used butterfly
    crosses a group boundary — xmath._dif_tables_grouped)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import xmath

BLOCK_F = 128            # frame rows per grid step (matches DECISION_BLOCK)
LANES = 512


@functools.lru_cache(maxsize=None)
def _tw_stack(lanes: int, fft_size: int):
    """Stacked per-stage twiddle tables [S, lanes] f32 (re, im)."""
    tabs = (xmath._dif_tables(fft_size) if lanes == fft_size
            else xmath._dif_tables_grouped(lanes, fft_size))
    twr = np.stack([t[1] for t in tabs]).astype(np.float32)
    twi = np.stack([t[2] for t in tabs]).astype(np.float32)
    return twr, twi


def _stages_kernel(fft_size, zre_ref, zim_ref, twr_ref, twi_ref,
                   ore_ref, oim_ref):
    """[BF, lanes] z -> classic-DIF-order y; all stages resident in VMEM.

    Masks are iota-derived (no vector constants in-kernel); twiddles
    stream from the [S, lanes] input refs one 2-D row slice per stage.
    """
    re = zre_ref[:]
    im = zim_ref[:]
    lanes = re.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1)
    tables = []
    m, s = fft_size, 0
    while m > 1:
        half = m // 2
        # group boundaries are multiples of fft_size (a multiple of m),
        # so the global-index mask equals the group-local one
        mask = (iota % m) < half
        tables.append((mask, twr_ref[s:s + 1, :], twi_ref[s:s + 1, :], half))
        m //= 2
        s += 1
    roll = lambda v, sh: pltpu.roll(v, shift=sh % lanes, axis=1)
    ore, oim = xmath.fft_dif_stages(re, im, jnp, roll=roll, tables=tables)
    ore_ref[:] = ore
    oim_ref[:] = oim


def fft_classic(z_re, z_im, fft_size: int, interpret: bool = False):
    """[F, lanes] f32 pair -> [F, lanes] classic-order FFT (per group)."""
    f, lanes = z_re.shape
    twr, twi = _tw_stack(lanes, fft_size)
    n_stages = twr.shape[0]
    pad = (-f) % BLOCK_F
    if pad:
        z_re = jnp.pad(z_re, ((0, pad), (0, 0)))
        z_im = jnp.pad(z_im, ((0, pad), (0, 0)))
    fp = f + pad
    ore, oim = pl.pallas_call(
        functools.partial(_stages_kernel, fft_size),
        out_shape=[jax.ShapeDtypeStruct((fp, lanes), jnp.float32)] * 2,
        grid=(fp // BLOCK_F,),
        in_specs=[
            pl.BlockSpec((BLOCK_F, lanes), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK_F, lanes), lambda i: (i, 0)),
            pl.BlockSpec((n_stages, lanes), lambda i: (0, 0)),
            pl.BlockSpec((n_stages, lanes), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((BLOCK_F, lanes), lambda i: (i, 0))] * 2,
        interpret=interpret,
    )(z_re, z_im, jnp.asarray(twr), jnp.asarray(twi))
    return ore[:f], oim[:f]


def fft_natural(z_re, z_im, interpret: bool = False):
    """Natural-order FFT via the fused kernel, or None if the shape is
    not one of the two production layouts (caller falls back to the
    bit-identical XLA roll form).

    Accepts [F, 512] (long) or [..., G, 64] with G*64 == 512 (short);
    output shape mirrors the input. The final bit-reversal runs outside
    the kernel as a reshape/transpose in XLA (exact data movement).
    """
    shape = z_re.shape
    if len(shape) == 2 and shape[-1] == LANES:
        fft_size = LANES
        zr, zi = z_re, z_im
    elif (len(shape) >= 2 and shape[-1] < LANES
          and LANES % shape[-1] == 0
          and len(shape) >= 2
          and int(np.prod(shape[-2:])) == LANES):
        fft_size = shape[-1]
        zr = z_re.reshape(shape[:-2] + (LANES,))
        zi = z_im.reshape(shape[:-2] + (LANES,))
        if zr.ndim != 2:
            zr = zr.reshape(-1, LANES)
            zi = zi.reshape(-1, LANES)
    else:
        return None
    if zr.ndim != 2:
        return None
    yr, yi = fft_classic(zr, zi, fft_size, interpret=interpret)
    yr = yr.reshape(shape)
    yi = yi.reshape(shape)
    return xmath._bitrev(yr, jnp), xmath._bitrev(yi, jnp)
