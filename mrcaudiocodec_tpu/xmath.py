"""Cross-backend bit-exact transforms (the codec's determinism core).

The MDCT's DCT-IV stage used to be a dense matmul — and GEMM reduction
order is backend private: NumPy-BLAS, XLA:CPU, XLA:TPU (bf16x6 HIGHEST
emulation) and Mosaic each round differently, so the SAME frame produced
coefficients 1-2 ulp apart across engines, and the quantizer's floor
turned that into a flipped q bin per ~500 frames (docs/DESIGN.md §"Cross-
shape determinism"). That was the last measured source of spec-vs-engine
stream divergence.

This module removes the GEMM from the normative path entirely: the
DCT-IV is computed as a FIXED SEQUENCE of single IEEE-754 float32
elementwise operations —

    pre-twiddle -> radix-2 Stockham FFT (log2(M/2) stages) -> post-twiddle

— with every multiply/add/subtract a separate correctly-rounded f32 op
and every constant rounded once from float64 (shared tables). IEEE-754
guarantees each such op bit-identical rounding on every conforming
backend, and the op ORDER is pinned by the dataflow itself, so the
transform is bit-identical across NumPy, XLA:CPU, XLA:TPU and Pallas by
construction — not by tolerance. (tests/test_mdct.py asserts NumPy==JAX
bitwise; scripts/tpu_mdct_probe.py asserts CPU==TPU bitwise.)

The functions take the array namespace `xp` (numpy or jax.numpy) so the
normative spec codec and the TPU engine literally share this code. Data
movement (slices, concats, stacks, reshapes) carries no rounding and may
be lowered freely by each backend.

Derivation of the O(M log M) DCT-IV (orthonormal, matching
tables.dct_iv_matrix):  with H = M/2, W = exp(-i*pi/M),

    z[m] = (u[2m] + i*u[M-1-2m]) * W^(m + 1/4)        m = 0..H-1
    A    = FFT_H(z)
    B[r] = A[r] * W^r
    X[2r] = Re B[r],   X[M-1-2r] = -Im B[r]

then X * sqrt(2/M). Verified against the dense matrix to 1e-13 relative
(f64) during development; the checked-in tables are the f32 roundings of
the f64 twiddles.
"""
from __future__ import annotations

import functools

import numpy as np

F32 = np.float32


@functools.lru_cache(maxsize=None)
def _fft_stages(n: int):
    """Twiddle tables for the radix-2 Stockham FFT of size n.

    Stage with sub-transform length m uses w[j] = exp(-2*pi*i*j/m),
    j = 0..m/2-1, rounded to f32 from f64. Returns a tuple of
    (w_re[m/2], w_im[m/2]) pairs for m = n, n/2, ..., 2.
    """
    assert n >= 2 and (n & (n - 1)) == 0, f"size {n} not a power of two"
    stages = []
    m = n
    while m > 1:
        j = np.arange(m // 2, dtype=np.float64)
        ang = -2.0 * np.pi * j / m
        stages.append((np.cos(ang).astype(F32), np.sin(ang).astype(F32)))
        m //= 2
    return tuple(stages)


@functools.lru_cache(maxsize=None)
def _dct4_tables(m_size: int):
    """Pre/post twiddles + scale for the size-m DCT-IV (f32 from f64)."""
    h = m_size // 2
    mm = np.arange(h, dtype=np.float64)
    pre = -np.pi * (mm + 0.25) / m_size
    post = -np.pi * mm / m_size
    return {
        "pre_re": np.cos(pre).astype(F32),
        "pre_im": np.sin(pre).astype(F32),
        "post_re": np.cos(post).astype(F32),
        "post_im": np.sin(post).astype(F32),
        "scale": F32(np.sqrt(2.0 / m_size)),
    }


def _cmul(ar, ai, br, bi, xp):
    """(ar+i*ai)*(br+i*bi) as four multiplies, one subtract, one add —
    each a single correctly-rounded IEEE op (no FMA contraction: the
    products are materialized values in both NumPy and XLA HLO)."""
    return ar * br - ai * bi, ar * bi + ai * br


def fft_stockham(re, im, xp):
    """Complex FFT along the last axis (size = power of two), as a fixed
    sequence of f32 butterflies. Self-sorting (no bit-reversal): at each
    stage the [..., l, m] view splits m in half, and groups double.

    re/im: [..., n] float32. Returns (re, im) of the same shape, equal to
    FFT(re + i*im) with the e^{-2*pi*i*nk/n} sign convention.
    """
    n = re.shape[-1]
    lead = re.shape[:-1]
    re = re.reshape(lead + (1, n))
    im = im.reshape(lead + (1, n))
    for w_re, w_im in _fft_stages(n):
        half = re.shape[-1] // 2
        a_re, b_re = re[..., :half], re[..., half:]
        a_im, b_im = im[..., :half], im[..., half:]
        top_re = a_re + b_re
        top_im = a_im + b_im
        d_re = a_re - b_re
        d_im = a_im - b_im
        wr = xp.asarray(w_re)[None, :]
        wi = xp.asarray(w_im)[None, :]
        bot_re, bot_im = _cmul(d_re, d_im, wr, wi, xp)
        re = xp.concatenate([top_re, bot_re], axis=-2)
        im = xp.concatenate([top_im, bot_im], axis=-2)
    return re.reshape(lead + (n,)), im.reshape(lead + (n,))


def dct_iv(u, xp):
    """Orthonormal DCT-IV along the last axis (size 2^k), bit-exact
    across backends. u: [..., M] float32 -> [..., M] float32.

    Drop-in for `u @ tables.dct_iv_matrix(M).T.astype(f32)` up to ~1 ulp
    (the fast flow graph rounds differently from a GEMM — which is the
    point: THIS sequence is the normative one).
    """
    m_size = u.shape[-1]
    cst = _dct4_tables(m_size)
    ue = u[..., 0::2]
    uo = u[..., ::-1][..., 0::2]                    # u[M-1-2m]
    pre_re = xp.asarray(cst["pre_re"])
    pre_im = xp.asarray(cst["pre_im"])
    z_re, z_im = _cmul(ue, uo, pre_re, pre_im, xp)
    a_re, a_im = fft_stockham(z_re, z_im, xp)
    post_re = xp.asarray(cst["post_re"])
    post_im = xp.asarray(cst["post_im"])
    b_re, b_im = _cmul(a_re, a_im, post_re, post_im, xp)
    neg_rev = (-b_im)[..., ::-1]
    out = xp.stack([b_re, neg_rev], axis=-1).reshape(u.shape)
    return out * cst["scale"]


@functools.lru_cache(maxsize=None)
def ffi_table(m_size: int) -> np.ndarray:
    """All rounded constants of the size-m DCT-IV packed for the native
    CPU kernel (native/xmath_ffi.cpp), layout documented there: [pre_re,
    pre_im, stage_re flat, stage_im flat, post_re, post_im, scale],
    6*(m/2)-1 floats. The kernel computes no transcendentals — these f32
    roundings (from float64, by THIS module) are the single source of
    truth for every backend."""
    h = m_size // 2
    cst = _dct4_tables(m_size)
    st = _fft_stages(h)
    out = np.concatenate(
        [cst["pre_re"], cst["pre_im"],
         np.concatenate([s[0] for s in st]),
         np.concatenate([s[1] for s in st]),
         cst["post_re"], cst["post_im"],
         np.asarray([cst["scale"]], np.float32)]).astype(F32)
    assert out.size == 6 * h - 1
    return out


def fold(v, xp):
    """TDAC fold [..., 2M] -> [..., M] (mirror of spec.dsp._fold, concat
    form usable by both backends; negation/subtraction are single IEEE
    ops)."""
    m = v.shape[-1] // 2
    h = m // 2
    a = -v[..., 3 * h - 1:2 * h - 1:-1] - v[..., 3 * h:]
    b = v[..., :h] - v[..., 2 * h - 1:h - 1:-1]
    return xp.concatenate([a, b], axis=-1)


def unfold(u, xp):
    """Transpose of fold: [..., M] -> [..., 2M]."""
    m = u.shape[-1]
    h = m // 2
    return xp.concatenate([
        u[..., h:],
        -u[..., m - 1:h - 1:-1],
        -u[..., h - 1::-1],
        -u[..., :h],
    ], axis=-1)


# ---------------------------------------------------------------------------
# Layout-friendly "roll form" of the SAME normative arithmetic
# ---------------------------------------------------------------------------
#
# fft_stockham above keeps the live array as [..., G, m] with the minor
# dim m shrinking 512 -> 2 across stages. On TPU that is catastrophic:
# XLA pads the minor dim to 128 lanes, so the late stages allocate up to
# 64x-padded buffers and relayout between every stage — measured ~500 s
# of remote compile per process and +150 ms steady-state on the v5e.
#
# The functions below compute BIT-IDENTICAL values through a different
# storage schedule: the classic in-place radix-2 DIF FFT, which performs
# exactly the same butterflies ((a+b) and (a-b)*w with the same operand
# values and the same stage twiddle tables — only WHERE intermediates
# are stored differs), on a constant-shape [..., n] array. Each stage is
# two circular lane rotations + a masked select, and the classic
# variant's bit-reversed output order is undone by a reshape/transpose
# (pure data movement, exact for every value including signed zeros).
# tests/test_mdct.py asserts fast == reference BITWISE in NumPy; the
# TPU engine's use of the jnp instantiation is asserted bitwise against
# the spec on hardware (scripts/tpu_xmath_probe.py).


@functools.lru_cache(maxsize=None)
def _dif_tables(n: int):
    """Per-stage (mask, tw_re, tw_im, half) for the roll-form DIF FFT.

    Stage with block size m (m = n, n/2, ..., 2): position p belongs to
    block-local index l = p % m; l < m/2 computes a sum, l >= m/2 a
    twiddled difference with w[l - m/2] — the SAME f32 twiddle values as
    _fft_stages (top positions get 1+0i, discarded by the mask select).
    """
    out = []
    m = n
    for w_re, w_im in _fft_stages(n):
        half = m // 2
        reps = n // m
        mask = (np.arange(n) % m) < half
        twr = np.tile(np.concatenate([np.ones(half, F32), w_re]), reps)
        twi = np.tile(np.concatenate([np.zeros(half, F32), w_im]), reps)
        out.append((mask, twr.astype(F32), twi.astype(F32), half))
        m //= 2
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _dif_tables_grouped(lanes: int, fft_size: int):
    """_dif_tables for `lanes // fft_size` independent size-`fft_size`
    FFTs laid side by side on one `lanes`-wide axis (the short-block
    path runs its 8 sub-FFTs this way). Masks/twiddles tile exactly, and
    every butterfly's partner stays inside its own group (local index
    l < m/2 pairs with l + m/2 < m <= fft_size), so the shared
    lane-rotations of fft_dif_stages never mix groups at used positions.
    """
    groups = lanes // fft_size
    assert groups * fft_size == lanes
    out = []
    for mask, twr, twi, half in _dif_tables(fft_size):
        out.append((np.tile(mask, groups), np.tile(twr, groups),
                    np.tile(twi, groups), half))
    return tuple(out)


def _bitrev(x, xp):
    """Bit-reversal permutation along the last axis (size 2^k) as a
    reshape/transpose — exact data movement, no gather."""
    n = x.shape[-1]
    lg = n.bit_length() - 1
    lead = x.shape[:-1]
    nl = len(lead)
    y = x.reshape(lead + (2,) * lg)
    axes = tuple(range(nl)) + tuple(range(nl + lg - 1, nl - 1, -1))
    return xp.transpose(y, axes).reshape(lead + (n,))


def fft_dif_stages(re, im, xp, roll=None, tables=None):
    """The classic-DIF butterfly stages WITHOUT the final bit-reversal:
    output position p holds the natural-order FFT value at bitrev(p).

    Values are bit-identical to fft_stockham (same ops on the same
    operands); the array keeps its [..., n] shape at every stage. Rolls
    are circular; wrapped lanes land only where the mask discards them.
    `roll(v, s)` may be overridden (Pallas kernels pass pltpu.roll);
    `tables` may be overridden with _dif_tables_grouped for a lane axis
    holding several independent smaller FFTs side by side.
    """
    n = re.shape[-1]
    if roll is None:
        roll = lambda v, s: xp.roll(v, s, axis=-1)
    for mask, twr, twi, half in (tables or _dif_tables(n)):
        mask_b = xp.asarray(mask)
        rm_re, rm_im = roll(re, -half), roll(im, -half)
        rp_re, rp_im = roll(re, half), roll(im, half)
        top_re = re + rm_re
        top_im = im + rm_im
        d_re = rp_re - re
        d_im = rp_im - im
        bot_re, bot_im = _cmul(d_re, d_im, xp.asarray(twr), xp.asarray(twi),
                               xp)
        re = xp.where(mask_b, top_re, bot_re)
        im = xp.where(mask_b, top_im, bot_im)
    return re, im


def fft_dif(re, im, xp, roll=None):
    """Classic-DIF instantiation of fft_stockham's butterfly graph,
    natural output order (bit-reversal undone by pure data movement)."""
    re, im = fft_dif_stages(re, im, xp, roll)
    return _bitrev(re, xp), _bitrev(im, xp)


def dct_iv_fast(u, xp, roll=None, fft=None):
    """dct_iv with the FFT evaluated in roll form: bit-identical outputs,
    TPU-friendly layouts (every intermediate keeps a large minor dim).
    `fft(z_re, z_im) -> (a_re, a_im)` (natural order) may be overridden
    with a fused Pallas implementation of the same butterfly graph."""
    m_size = u.shape[-1]
    cst = _dct4_tables(m_size)
    ue = u[..., 0::2]
    uo = u[..., ::-1][..., 0::2]
    z_re, z_im = _cmul(ue, uo, xp.asarray(cst["pre_re"]),
                       xp.asarray(cst["pre_im"]), xp)
    if fft is None:
        a_re, a_im = fft_dif(z_re, z_im, xp, roll)
    else:
        a_re, a_im = fft(z_re, z_im)
    b_re, b_im = _cmul(a_re, a_im, xp.asarray(cst["post_re"]),
                       xp.asarray(cst["post_im"]), xp)
    neg_rev = (-b_im)[..., ::-1]
    out = xp.stack([b_re, neg_rev], axis=-1).reshape(u.shape)
    return out * cst["scale"]


def mdct_windowed_fast(fr, w, xp, roll=None, fft=None):
    """mdct_windowed evaluated through dct_iv_fast (bit-identical)."""
    return dct_iv_fast(fold(fr * w, xp), xp, roll, fft)


def imdct_windowed_fast(x, w, xp, roll=None, fft=None):
    """imdct_windowed evaluated through dct_iv_fast (bit-identical)."""
    return unfold(dct_iv_fast(x, xp, roll, fft), xp) * w


def mdct_windowed(fr, w, xp):
    """The full normative analysis arithmetic for one window family:
    window multiply -> TDAC fold -> DCT-IV, every float op a pinned
    single-IEEE-op (the window products feed the fold's add/subtract, so
    on backends that contract mul+add the WHOLE chain must run through
    one implementation — ops.dsp dispatches accordingly).

    fr: [..., 2M] frames, w: window broadcastable to fr. -> [..., M]."""
    return dct_iv(fold(fr * w, xp), xp)


def imdct_windowed(x, w, xp):
    """Inverse: DCT-IV -> unfold -> window multiply. [..., M] -> [..., 2M].

    The windowed output feeds overlap-add (two-term sums downstream), so
    the window product is materialized inside this normative chain."""
    return unfold(dct_iv(x, xp), xp) * w
