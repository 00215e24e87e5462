// Strict-IEEE CPU implementation of the normative psychoacoustic chain
// (mrcaudiocodec_tpu/xpsy.py), exposed as an XLA FFI custom call.
//
// Why this exists: normative arithmetic rev 4 defines the psycho model as
// a FIXED SEQUENCE of single correctly-rounded IEEE-754 f32 ops (xpsy.py)
// shared by the NumPy spec and the TPU engine. XLA:TPU executes that
// sequence faithfully (scripts/tpu_fma_probe.py), but XLA:CPU's LLVM
// backend contracts mul+add chains into FMAs through every barrier
// (measured round 3), so the CPU engine runs the identical op DAG here,
// compiled with -ffp-contract=off. Every constant (window, twiddles,
// spreading rows, polynomial coefficients) is either PASSED IN from
// xpsy.py's f64->f32 roundings or written below as the identical literal.
//
// Modes (attr "mode"):
//   0  psy family, long:  frames [R, n]    -> band_t [R, nb], band_e, pe
//   1  psy family, short: frames [R, 2048] -> band_t [R, 8*nb], ..., pe
//      (the kernel extracts the 8 sub-blocks at short_offset itself)
//   2  band energy:       coeffs [R, n]    -> e [R, nb] (outputs 2,3 zero)
//
// i32 blob (modes 0/1):
//   [0] n   frame/sub-block length (2048 long / 256 short)
//   [1] h   = n/2: FFT size and bin count
//   [2] npart  [3] nb  [4] part scan stages  [5] band scan stages
//   [6] n_groups (1 or 8)   [7] short_offset
//   then: part_seg_start[h], part_ends[npart],
//         band_seg_start[h], band_ends[nb], pb_mask[npart*nb]
// f32 blob (modes 0/1):
//   hann[n], fft st_re[h-1], st_im[h-1], untwist cr[h], ci[h],
//   spread[npart*npart], inv_counts[npart], ath[npart], width[nb]
// i32 blob (mode 2): [0]=n, [1]=nb, [2]=stages, then seg_start[n],
//   ends[nb] (clamped), width_pos[nb]; f32 blob unused.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

// f32 roundings identical to xpsy.py's module constants
const float kLN2 = 0.6931471805599453f;
const float kSQRT2 = 1.4142135623730951f;
const float kTINY = 1e-20f;
const float kSFM_FLOOR_REL = 1e-12f;
const float kTMN = 18.0f;
const float kNMT = 6.0f;
const float kSIMPLE = 0.06309573444801933f;   // 10^(-12/10) f32 (xpsy)
const float kRN_MAGIC = 12582912.0f;
const float kBIG = 1e30f;
// divide-free chain constants (xpsy.py)
const float kTEN_LOG10_2 = float(10.0 * 0.3010299956639812);
const float kINV_NEG60 = float(-1.0 / 60.0);
const float kNEG_L210_10 = float(-3.321928094887362 / 10.0);
const float kHALF = 0.5f;
// log2(1+t) Chebyshev-LSQ deg 12 (xpsy._LOG2_P), c0 pinned to 0
const float kLP[13] = {
    0.0f,
    1.4426950216293335f, -0.7213475704193115f, 0.48089826107025146f,
    -0.36067137122154236f, 0.28854310512542725f, -0.24054786562919617f,
    0.2060815393924713f, -0.17848600447177887f, 0.15869304537773132f,
    -0.15966284275054932f, 0.15780037641525269f, -0.08521182835102081f};
// exp Taylor 1/k!, k = 7..0 order as xpsy._EXP_K
const float kE[8] = {float(1.0 / 5040.0), float(1.0 / 720.0),
                     float(1.0 / 120.0),  float(1.0 / 24.0),
                     float(1.0 / 6.0),    float(1.0 / 2.0),
                     1.0f,                1.0f};

inline float bitf(int32_t i) { float f; std::memcpy(&f, &i, 4); return f; }
inline int32_t biti(float f) { int32_t i; std::memcpy(&i, &f, 4); return i; }

inline float xlog2f(float x) {
  int32_t bits = biti(x);
  int32_t e = (bits >> 23) - 127;
  float m = bitf((bits & 0x007FFFFF) | 0x3F800000);
  if (m >= kSQRT2) { m = m * 0.5f; e += 1; }
  const float t = m - 1.0f;
  float p = kLP[12];
  for (int i = 11; i >= 0; --i) p = p * t + kLP[i];
  return float(e) + p;
}

inline float xexp2f(float x) {
  // roundToNearestEven — exactly defined, matches np.rint / lax.round
  const float rn = std::nearbyintf(x);
  int32_t k = int32_t(rn);
  if (k < -126) k = -126;
  if (k > 126) k = 126;
  float f = x - float(k);
  float c = f * kLN2;
  float p = kE[0];
  for (int i = 1; i < 8; ++i) p = p * c + kE[i];
  return p * bitf((k + 127) << 23);
}

const float kLOG2_INV_SMR_CEIL = float(-39.86313713864835);  // log2(1e-12)
const float kLOG2_INV_SMR_FLOOR = float(9.965784284662087);  // log2(1e3)

// 1/sqrt(m) start poly on [1,4) (xpsy._RSQRT_P) + quantizer constants
const float kRS[6] = {1.9494401216506958f, -1.6151533126831055f,
                      0.911236047744751f,  -0.2903306782245636f,
                      0.04800727963447571f, -0.003200492588803172f};
const float kMIN_NORMAL = 1.17549435e-38f;       // 2^-126
const float kFRAC[4] = {float(1.0), float(1.1892071150027210667),
                        float(1.4142135623730951), float(1.6817928305074290861)};
const float kINV_FRAC[4] = {float(1.0), float(0.84089641525371454303),
                            float(0.70710678118654752440),
                            float(0.59460355750136053336)};
const float kQUANT_MAGIC = 0.4054f;
const float kQMAX = 4095.0f;
const float kC43 = float(4.0 / 3.0);
const int kGAIN_BIAS = 128;

// Pinned Newton sqrt, mirror of xpsy.xsqrt (multiplies/adds only)
inline float xsqrtf(float x) {
  if (x < kMIN_NORMAL) return 0.0f;
  int32_t bits = biti(x);
  int32_t eb = (bits >> 23) - 127;
  int32_t odd = eb & 1;
  float m = bitf((bits & 0x007FFFFF) | 0x3F800000);
  if (odd == 1) m = m * 2.0f;
  int32_t e2 = (eb - odd) >> 1;
  float r = kRS[5];
  for (int i = 4; i >= 0; --i) r = r * m + kRS[i];
  for (int it = 0; it < 2; ++it) {
    const float mr = m * r;
    const float h = mr * r;
    const float w = 1.5f - 0.5f * h;
    r = r * w;
  }
  const float s = m * r;
  return s * bitf((e2 + 127) << 23);
}

// Radix-2 Stockham FFT — same routine as xmath_ffi.cpp (same dataflow as
// xmath.fft_stockham; values bit-identical to the roll-form fft_dif).
inline void cmulf(float ar, float ai, float br, float bi, float* outr,
                  float* outi) {
  *outr = ar * br - ai * bi;
  *outi = ar * bi + ai * br;
}

void fft_stockham(float* re, float* im, float* tre, float* tim, int64_t n,
                  const float* st_re, const float* st_im) {
  int64_t l = 1, m = n;
  const float* wr = st_re;
  const float* wi = st_im;
  float* sre = re; float* sim = im;
  float* dre = tre; float* dim = tim;
  while (m > 1) {
    const int64_t half = m / 2;
    for (int64_t i = 0; i < l; ++i) {
      const float* ar = sre + i * m;
      const float* ai = sim + i * m;
      float* t_r = dre + i * half;
      float* t_i = dim + i * half;
      float* b_r = dre + (l + i) * half;
      float* b_i = dim + (l + i) * half;
      for (int64_t j = 0; j < half; ++j) {
        const float a_r = ar[j], a_i = ai[j];
        const float bb_r = ar[half + j], bb_i = ai[half + j];
        t_r[j] = a_r + bb_r;
        t_i[j] = a_i + bb_i;
        const float d_r = a_r - bb_r;
        const float d_i = a_i - bb_i;
        cmulf(d_r, d_i, wr[j], wi[j], &b_r[j], &b_i[j]);
      }
    }
    wr += half; wi += half;
    l *= 2; m = half;
    float* tmp = sre; sre = dre; dre = tmp;
    tmp = sim; sim = dim; dim = tmp;
  }
  if (sre != re)
    for (int64_t k = 0; k < n; ++k) { re[k] = sre[k]; im[k] = sim[k]; }
}

// Segmented Hillis-Steele scan: EXACT mirror of xpsy.seg_scan's op DAG
// (stage d adds the d-shifted value where (i-d) >= seg_start[i];
// descending i keeps the pre-stage values live, matching the functional
// update).
void seg_scan(float* s, int64_t n, const int32_t* seg_start, int stages) {
  int64_t d = 1;
  for (int st = 0; st < stages; ++st) {
    for (int64_t i = n - 1; i >= d; --i)
      if (i - d >= seg_start[i]) s[i] = s[i] + s[i - d];
    d *= 2;
  }
}

// Fixed pairwise-tree sum, mirror of xpsy.tree_sum (pad to power of two
// with exact zeros, halve with elementwise adds).
float tree_sum(const float* v, int64_t n, float* scratch) {
  int64_t m = 1;
  while (m < n) m *= 2;
  for (int64_t i = 0; i < m; ++i) scratch[i] = i < n ? v[i] : 0.0f;
  while (m > 1) {
    int64_t h = m / 2;
    for (int64_t i = 0; i < h; ++i) scratch[i] = scratch[i] + scratch[i + h];
    m = h;
  }
  return scratch[0];
}

struct PsyTables {
  int64_t n, h, npart, nb;
  int part_stages, band_stages, n_groups, short_offset;
  const int32_t *part_start, *part_ends, *band_start, *band_ends, *pb;
  const float *hann, *st_re, *st_im, *cr, *ci, *spread, *inv_counts,
      *ath, *width;
};

PsyTables parse_tables(const int32_t* ib, const float* fb) {
  PsyTables t;
  t.n = ib[0]; t.h = ib[1]; t.npart = ib[2]; t.nb = ib[3];
  t.part_stages = ib[4]; t.band_stages = ib[5];
  t.n_groups = ib[6]; t.short_offset = ib[7];
  const int32_t* p = ib + 8;
  t.part_start = p; p += t.h;
  t.part_ends = p; p += t.npart;
  t.band_start = p; p += t.h;
  t.band_ends = p; p += t.nb;
  t.pb = p;
  const float* f = fb;
  t.hann = f; f += t.n;
  t.st_re = f; f += t.h - 1;
  t.st_im = f; f += t.h - 1;
  t.cr = f; f += t.h;
  t.ci = f; f += t.h;
  t.spread = f; f += t.npart * t.npart;
  t.inv_counts = f; f += t.npart;
  t.ath = f; f += t.npart;
  t.width = f;
  return t;
}

// One sub-block: frame [n] -> band_t [nb], band_e [nb], pe (returned).
// Mirrors xpsy.rfft_power + block_thresholds + band_pe op-for-op.
float psy_block(const float* frame, const PsyTables& t, bool full,
                float* band_t, float* band_e, std::vector<float>& ws) {
  const int64_t n = t.n, h = t.h, npart = t.npart, nb = t.nb;
  float* w = ws.data();                  // n
  float* zr = w + n;                     // h
  float* zi = zr + h;
  float* tr = zi + h;
  float* ti = tr + h;
  float* p = ti + h;                     // h
  float* ep = p + h;                     // npart (e_part)
  float* sp = ep + npart;                // npart (spread_e)
  float* lg = sp + npart;                // h then npart reuse
  float* tp = lg + h;                    // npart (t_part)
  float* scratch = tp + npart;           // max(h, 2*npart, nb pow2)

  for (int64_t k = 0; k < n; ++k) w[k] = frame[k] * t.hann[k];
  for (int64_t m = 0; m < h; ++m) { zr[m] = w[2 * m]; zi[m] = w[2 * m + 1]; }
  fft_stockham(zr, zi, tr, ti, h, t.st_re, t.st_im);
  // untwist + power, mirror of xpsy.rfft_power
  for (int64_t k = 0; k < h; ++k) {
    const int64_t rk = k == 0 ? 0 : h - k;
    const float br = zr[rk], bi = zi[rk];
    const float a_re = (zr[k] + br) * 0.5f;
    const float a_im = (zi[k] - bi) * 0.5f;
    const float b_re = (zi[k] + bi) * 0.5f;
    const float b_im = (br - zr[k]) * 0.5f;
    const float x_re = a_re + (b_re * t.cr[k] - b_im * t.ci[k]);
    const float x_im = a_im + (b_re * t.ci[k] + b_im * t.cr[k]);
    p[k] = x_re * x_re + x_im * x_im;
  }
  float pmax = p[0];
  for (int64_t k = 1; k < h; ++k) pmax = p[k] > pmax ? p[k] : pmax;
  const float fl = kSFM_FLOOR_REL * pmax;
  for (int64_t k = 0; k < h; ++k) p[k] = p[k] > fl ? p[k] : fl;

  // e_part = segmented scan of p over partitions
  for (int64_t k = 0; k < h; ++k) scratch[k] = p[k];
  seg_scan(scratch, h, t.part_start, t.part_stages);
  for (int64_t i = 0; i < npart; ++i) ep[i] = scratch[t.part_ends[i]];

  if (full) {
    // spreading: fixed-order masker sum (mirror of xpsy.spread_apply)
    for (int64_t j = 0; j < npart; ++j) sp[j] = ep[0] * t.spread[j];
    for (int64_t i = 1; i < npart; ++i) {
      const float* row = t.spread + i * npart;
      const float ei = ep[i];
      for (int64_t j = 0; j < npart; ++j) sp[j] = sp[j] + ei * row[j];
    }
    // spectral flatness in the log2 domain (divide-free)
    for (int64_t k = 0; k < h; ++k) lg[k] = xlog2f(p[k] + kTINY);
    seg_scan(lg, h, t.part_start, t.part_stages);
    for (int64_t i = 0; i < npart; ++i) {
      const float lg_geo = lg[t.part_ends[i]] * t.inv_counts[i];
      const float lg_arith = xlog2f(ep[i] * t.inv_counts[i] + kTINY);
      float sfm_db = kTEN_LOG10_2 * (lg_geo - lg_arith);
      if (sfm_db > 0.0f) sfm_db = 0.0f;
      float alpha = sfm_db * kINV_NEG60;
      if (alpha > 1.0f) alpha = 1.0f;
      const float t1 = alpha * kTMN;
      const float t2 = 1.0f - alpha;
      const float off = t1 + t2 * kNMT;
      tp[i] = sp[i] * xexp2f(off * kNEG_L210_10);
    }
  } else {
    for (int64_t i = 0; i < npart; ++i) tp[i] = ep[i] * kSIMPLE;
  }
  for (int64_t i = 0; i < npart; ++i)
    tp[i] = tp[i] > t.ath[i] ? tp[i] : t.ath[i];

  // per-band conservative min of the partition threshold density
  for (int64_t b = 0; b < nb; ++b) {
    float mn = kBIG;
    for (int64_t i = 0; i < npart; ++i) {
      if (t.pb[i * nb + b]) {
        const float dens = tp[i] * t.inv_counts[i];
        mn = dens < mn ? dens : mn;
      }
    }
    band_t[b] = mn * t.width[b];
  }
  // band_e = segmented scan of p over bands
  for (int64_t k = 0; k < h; ++k) scratch[k] = p[k];
  seg_scan(scratch, h, t.band_start, t.band_stages);
  for (int64_t b = 0; b < nb; ++b) band_e[b] = scratch[t.band_ends[b]];

  // pe = tree sum of width * log2(1 + s), s in the log2 domain
  for (int64_t b = 0; b < nb; ++b) {
    const float s = xexp2f(kHALF * (xlog2f(band_e[b] + kTINY)
                                    - xlog2f(band_t[b] + kTINY)));
    scratch[nb + b] = t.width[b] * xlog2f(1.0f + s);
  }
  return tree_sum(scratch + nb, nb, scratch + 2 * nb);
}

ffi::Error XpsyImpl(int64_t mode, int64_t full_psycho,
                    ffi::Buffer<ffi::F32> in, ffi::Buffer<ffi::F32> ftab,
                    ffi::Buffer<ffi::S32> itab,
                    ffi::ResultBuffer<ffi::F32> out_t,
                    ffi::ResultBuffer<ffi::F32> out_e,
                    ffi::ResultBuffer<ffi::F32> out_pe) {
  const float* src = in.typed_data();
  const int32_t* ib = itab.typed_data();
  float* dt = out_t->typed_data();
  float* de = out_e->typed_data();
  float* dp = out_pe->typed_data();

  if (mode == 4 || mode == 5) {
    // elementwise pinned quantize (4) / dequantize (5): in = x or q
    // (f32), itab = e_bin (i32, same shape); out_t = q or xhat
    const int64_t total = in.element_count();
    const int32_t* e = ib;
#pragma omp parallel for
    for (int64_t k = 0; k < total; ++k) {
      const int32_t d = e[k] - kGAIN_BIAS;
      const int32_t rr = d & 3;
      const int32_t kk = d >> 2;
      if (mode == 4) {
        const float x = src[k];
        const float ax = x < 0.0f ? -x : x;
        const float inv_step = kINV_FRAC[rr] * bitf((127 - kk) << 23);
        const float a = ax * inv_step;
        const float p = xsqrtf(a * xsqrtf(a));
        float mag = std::floor(p + kQUANT_MAGIC);
        if (mag > kQMAX) mag = kQMAX;
        dt[k] = x < 0.0f ? -mag : mag;
      } else {
        const float q = src[k];
        const float magf = q < 0.0f ? -q : q;
        const float mg = magf < 1.0f ? 1.0f : magf;
        float p43 = xexp2f(kC43 * xlog2f(mg));
        if (magf == 0.0f) p43 = 0.0f;
        const float step = kFRAC[rr] * bitf((kk + 127) << 23);
        const float val = p43 * step;
        dt[k] = q < 0.0f ? -val : val;
      }
    }
    const int64_t pe_n = out_pe->element_count();
    for (int64_t k = 0; k < out_e->element_count(); ++k) de[k] = 0.0f;
    for (int64_t k = 0; k < pe_n; ++k) dp[k] = 0.0f;
    return ffi::Error::Success();
  }

  if (mode == 3) {
    // allowed_noise: in = stacked [3, R, NB] (e_mdct, e_full, t_full);
    // out_t = allowed [R, NB] (divide-free log2-domain SMR inverse)
    const int64_t total = in.element_count() / 3;
    const float* e_mdct = src;
    const float* e_full = src + total;
    const float* t_full = src + 2 * total;
#pragma omp parallel for
    for (int64_t k = 0; k < total; ++k) {
      float il = xlog2f(t_full[k] + kTINY) - xlog2f(e_full[k] + kTINY);
      if (il < kLOG2_INV_SMR_CEIL) il = kLOG2_INV_SMR_CEIL;
      if (il > kLOG2_INV_SMR_FLOOR) il = kLOG2_INV_SMR_FLOOR;
      dt[k] = e_mdct[k] * xexp2f(il);
    }
    const int64_t pe_n = out_pe->element_count();
    for (int64_t k = 0; k < total && k < out_e->element_count(); ++k)
      de[k] = 0.0f;
    for (int64_t k = 0; k < pe_n; ++k) dp[k] = 0.0f;
    return ffi::Error::Success();
  }

  if (mode == 2) {
    // band energy of squared coeffs over (possibly zero-width) segments
    const int64_t n = ib[0], nb = ib[1];
    const int stages = ib[2];
    const int32_t* seg_start = ib + 3;
    const int32_t* ends = seg_start + n;
    const int32_t* wpos = ends + nb;
    const int64_t rows = in.element_count() / n;
#pragma omp parallel
    {
      std::vector<float> s(n);
#pragma omp for
      for (int64_t r = 0; r < rows; ++r) {
        const float* c = src + r * n;
        for (int64_t k = 0; k < n; ++k) s[k] = c[k] * c[k];
        seg_scan(s.data(), n, seg_start, stages);
        float* er = dt + r * nb;
        for (int64_t b = 0; b < nb; ++b)
          er[b] = wpos[b] ? s[ends[b]] : 0.0f;
        float* e2 = de + r * nb;
        for (int64_t b = 0; b < nb; ++b) e2[b] = 0.0f;
        dp[r] = 0.0f;
      }
    }
    return ffi::Error::Success();
  }

  const PsyTables t = parse_tables(ib, ftab.typed_data());
  const bool full = full_psycho != 0;
  const int64_t in_row = (mode == 0) ? t.n : 2048;
  const int64_t rows = in.element_count() / in_row;
  const int64_t out_nb = t.nb * t.n_groups;
  int64_t pow2 = 1;
  while (pow2 < t.nb) pow2 *= 2;
  // w(n) + zr/zi/tr/ti/p(5h) + ep/sp/tp(3 npart) + lg(h) +
  // scratch(max(h, 2nb + pow2)) + slack
  const int64_t ws_len = t.n + 6 * t.h + 4 * t.npart
      + (t.h > 2 * t.nb + pow2 ? t.h : 2 * t.nb + pow2) + 64;
#pragma omp parallel
  {
    std::vector<float> ws(ws_len);
#pragma omp for
    for (int64_t r = 0; r < rows; ++r) {
      float* bt_r = dt + r * out_nb;
      float* be_r = de + r * out_nb;
      if (mode == 0) {
        dp[r] = psy_block(src + r * in_row, t, full, bt_r, be_r, ws);
      } else {
        // EIGHT_SHORT: per-group chain, pe folded in group order
        float pe = 0.0f;
        for (int g = 0; g < t.n_groups; ++g) {
          const float* sub = src + r * in_row + t.short_offset
              + int64_t(g) * (t.n / 2);
          const float pg = psy_block(sub, t, full, bt_r + g * t.nb,
                                     be_r + g * t.nb, ws);
          pe = g == 0 ? pg : pe + pg;
        }
        dp[r] = pe;
      }
    }
  }
  return ffi::Error::Success();
}

}  // namespace

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    MrcXpsy, XpsyImpl,
    ffi::Ffi::Bind()
        .Attr<int64_t>("mode")
        .Attr<int64_t>("full_psycho")
        .Arg<ffi::Buffer<ffi::F32>>()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Arg<ffi::Buffer<ffi::S32>>()
        .Ret<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::F32>>());
