// Strict-IEEE CPU implementation of the normative MDCT arithmetic
// (mrcaudiocodec_tpu/xmath.py), exposed as an XLA FFI custom call.
//
// Why this exists: the normative spec defines the MDCT as a FIXED SEQUENCE
// of single correctly-rounded IEEE-754 float32 ops (see xmath.py). XLA:TPU
// executes that sequence faithfully (measured: scripts/tpu_fma_probe.py),
// but XLA:CPU's LLVM backend contracts mul+add chains into FMAs — through
// optimization_barriers, bitcasts and fpext/fptrunc round-trips alike
// (measured this round) — so a pure-jnp CPU path CANNOT reproduce the
// sequence. This kernel runs the exact op DAG in C++ compiled with
// -ffp-contract=off: every add/sub/mul below is one correctly-rounded
// IEEE f32 op, bit-identical to the NumPy spec by construction.
//
// All rounded constants (FFT stage twiddles, DCT-IV pre/post twiddles,
// scale) are PASSED IN from Python, rounded once from float64 by the same
// xmath tables the spec uses — the C++ computes no transcendentals, so
// there is no libm-mismatch risk.
//
// Table layout (single f32 operand), H = M/2:
//   [0          , H)      pre_re
//   [H          , 2H)     pre_im
//   [2H         , 3H-1)   FFT stage twiddles re, stages m=H,H/2,...,2 flat
//   [3H-1       , 4H-2)   FFT stage twiddles im
//   [4H-2       , 5H-2)   post_re
//   [5H-2       , 6H-2)   post_im
//   [6H-2]                scale
// total 6H-1 floats.
//
// Modes: 0 = dct_iv            in  [B, M]        -> out [B, M]
//        1 = mdct_windowed     in  [B, 2M] x2    -> out [B, M]
//        2 = imdct_windowed    in  [B, M],[B,2M] -> out [B, 2M]
//
// Build: g++ -O2 -std=c++17 -shared -fPIC -ffp-contract=off -fopenmp
// (native/__init__.py drives the build; no pybind11 — the handler is
// exported as a plain symbol and wrapped with jax.ffi.pycapsule).

#include <cstdint>
#include <vector>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

struct Tables {
  const float* pre_re;
  const float* pre_im;
  const float* st_re;   // H-1 flat stage twiddles
  const float* st_im;
  const float* post_re;
  const float* post_im;
  float scale;
  int64_t h;
};

inline Tables split_tables(const float* t, int64_t len) {
  // len == 6H - 1
  const int64_t h = (len + 1) / 6;
  Tables tb;
  tb.pre_re = t;
  tb.pre_im = t + h;
  tb.st_re = t + 2 * h;
  tb.st_im = t + 3 * h - 1;
  tb.post_re = t + 4 * h - 2;
  tb.post_im = t + 5 * h - 2;
  tb.scale = t[6 * h - 2];
  tb.h = h;
  return tb;
}

// One complex multiply, four mul + one sub + one add, each single-rounded
// (-ffp-contract=off). Mirrors xmath._cmul.
inline void cmul(float ar, float ai, float br, float bi, float* outr,
                 float* outi) {
  *outr = ar * br - ai * bi;
  *outi = ar * bi + ai * br;
}

// Radix-2 Stockham FFT of size n (= H), exact dataflow mirror of
// xmath.fft_stockham: view [l, m] starting [1, n]; per stage split m in
// half, top = a + b, bot = cmul(a - b, w), concat along l.
void fft_stockham(float* re, float* im, float* tre, float* tim, int64_t n,
                  const float* st_re, const float* st_im) {
  int64_t l = 1, m = n;
  const float* wr = st_re;
  const float* wi = st_im;
  float* sre = re;
  float* sim = im;
  float* dre = tre;
  float* dim = tim;
  while (m > 1) {
    const int64_t half = m / 2;
    for (int64_t i = 0; i < l; ++i) {
      const float* ar = sre + i * m;
      const float* ai = sim + i * m;
      float* t_r = dre + i * half;          // row i of top
      float* t_i = dim + i * half;
      float* b_r = dre + (l + i) * half;    // row l+i of bot
      float* b_i = dim + (l + i) * half;
      for (int64_t j = 0; j < half; ++j) {
        const float a_r = ar[j], a_i = ai[j];
        const float bb_r = ar[half + j], bb_i = ai[half + j];
        t_r[j] = a_r + bb_r;
        t_i[j] = a_i + bb_i;
        const float d_r = a_r - bb_r;
        const float d_i = a_i - bb_i;
        cmul(d_r, d_i, wr[j], wi[j], &b_r[j], &b_i[j]);
      }
    }
    wr += half;
    wi += half;
    l *= 2;
    m = half;
    float* tmp = sre; sre = dre; dre = tmp;
    tmp = sim; sim = dim; dim = tmp;
  }
  if (sre != re) {
    for (int64_t k = 0; k < n; ++k) { re[k] = sre[k]; im[k] = sim[k]; }
  }
}

// DCT-IV of one row u[M] -> out[M]; scratch: 4 buffers of H floats.
void dct_iv_row(const float* u, float* out, const Tables& tb, float* zr,
                float* zi, float* tr, float* ti) {
  const int64_t h = tb.h;
  const int64_t m = 2 * h;
  for (int64_t k = 0; k < h; ++k) {
    const float ue = u[2 * k];
    const float uo = u[m - 1 - 2 * k];
    cmul(ue, uo, tb.pre_re[k], tb.pre_im[k], &zr[k], &zi[k]);
  }
  fft_stockham(zr, zi, tr, ti, h, tb.st_re, tb.st_im);
  for (int64_t r = 0; r < h; ++r) {
    float br, bi;
    cmul(zr[r], zi[r], tb.post_re[r], tb.post_im[r], &br, &bi);
    tr[r] = br;   // reuse scratch: b_re
    ti[r] = bi;   // b_im
  }
  // out[2r] = b_re[r]; out[2r+1] = -b_im[h-1-r]; then * scale
  for (int64_t r = 0; r < h; ++r) {
    out[2 * r] = tr[r] * tb.scale;
    out[2 * r + 1] = (-ti[h - 1 - r]) * tb.scale;
  }
}

// TDAC fold: v[2M] -> f[M] (mirror of xmath.fold), h = M/2.
void fold_row(const float* v, float* f, int64_t m_out) {
  const int64_t h = m_out / 2;
  for (int64_t i = 0; i < h; ++i)
    f[i] = -v[3 * h - 1 - i] - v[3 * h + i];
  for (int64_t i = 0; i < h; ++i)
    f[h + i] = v[i] - v[2 * h - 1 - i];
}

// Transpose of fold: u[M] -> v[2M] (mirror of xmath.unfold).
void unfold_row(const float* u, float* v, int64_t m_in) {
  const int64_t h = m_in / 2;
  for (int64_t i = 0; i < h; ++i) v[i] = u[h + i];
  for (int64_t i = 0; i < h; ++i) v[h + i] = -u[m_in - 1 - i];
  for (int64_t i = 0; i < h; ++i) v[m_in + i] = -u[h - 1 - i];
  for (int64_t i = 0; i < h; ++i) v[m_in + h + i] = -u[i];
}

ffi::Error XmathImpl(int64_t mode, ffi::Buffer<ffi::F32> in,
                     ffi::Buffer<ffi::F32> win, ffi::Buffer<ffi::F32> table,
                     ffi::ResultBuffer<ffi::F32> out) {
  const float* tptr = table.typed_data();
  const Tables tb = split_tables(tptr, table.element_count());
  const int64_t m = 2 * tb.h;
  const int64_t in_last = (mode == 1) ? 2 * m : m;
  const int64_t rows = in.element_count() / in_last;
  const float* src = in.typed_data();
  const float* w = win.typed_data();
  float* dst = out->typed_data();

#pragma omp parallel
  {
    std::vector<float> zr(tb.h), zi(tb.h), tr(tb.h), ti(tb.h);
    std::vector<float> folded(m), windowed(2 * m), dct(m);
#pragma omp for
    for (int64_t b = 0; b < rows; ++b) {
      if (mode == 0) {
        dct_iv_row(src + b * m, dst + b * m, tb, zr.data(), zi.data(),
                   tr.data(), ti.data());
      } else if (mode == 1) {
        const float* fr = src + b * 2 * m;
        const float* wb = w + b * 2 * m;
        for (int64_t k = 0; k < 2 * m; ++k) windowed[k] = fr[k] * wb[k];
        fold_row(windowed.data(), folded.data(), m);
        dct_iv_row(folded.data(), dst + b * m, tb, zr.data(), zi.data(),
                   tr.data(), ti.data());
      } else {
        dct_iv_row(src + b * m, dct.data(), tb, zr.data(), zi.data(),
                   tr.data(), ti.data());
        unfold_row(dct.data(), windowed.data(), m);
        const float* wb = w + b * 2 * m;
        float* ob = dst + b * 2 * m;
        for (int64_t k = 0; k < 2 * m; ++k) ob[k] = windowed[k] * wb[k];
      }
    }
  }
  return ffi::Error::Success();
}

}  // namespace

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    MrcXmath, XmathImpl,
    ffi::Ffi::Bind()
        .Attr<int64_t>("mode")
        .Arg<ffi::Buffer<ffi::F32>>()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::F32>>());
