// Native host-side bitstream runtime for the MRC1 codec.
//
// The TPU owns the numeric pipeline (JAX/XLA/Pallas); this module owns the
// serial-by-nature host work the reference genre keeps in Python
// (SURVEY.md §2a R12-R14): canonical-Huffman frame parsing and MSB-first
// bit packing. Exposed as a plain C ABI consumed via ctypes
// (mrcaudiocodec_tpu/native/__init__.py); every table is passed in from
// Python so the normative tables live in exactly one place (tables.py).
//
// Thread model: mrc_decode_records parallelizes over frame records with a
// simple thread pool — records are independent by format design (per-frame
// length prefixes, docs/FORMAT.md).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct BitCursor {
    const uint8_t* data;
    int64_t pos;   // bit position

    inline uint32_t take1() {
        uint32_t b = (data[pos >> 3] >> (7 - (pos & 7))) & 1u;
        ++pos;
        return b;
    }
    inline uint32_t take(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; ++i) v = (v << 1) | take1();
        return v;
    }
};

// Canonical Huffman decode tables (first_code/first_sym/order + counts).
struct DecTable {
    const int64_t* first_code;   // [max_len + 2]
    const int64_t* first_sym;    // [max_len + 2]
    const int64_t* order;        // [n_sym]
    const int64_t* counts;       // [max_len + 2]
    int32_t min_len;
    int32_t max_len;
};

inline int32_t decode_sym(BitCursor& cur, const DecTable& t) {
    uint32_t code = cur.take(t.min_len);
    for (int l = t.min_len; l <= t.max_len; ++l) {
        int64_t idx = (int64_t)code - t.first_code[l];
        if (idx >= 0 && idx < t.counts[l])
            return (int32_t)t.order[t.first_sym[l] + idx];
        code = (code << 1) | cur.take1();
    }
    return -1;   // invalid stream
}

struct Tables {
    DecTable sf, small, mid, esc;
    const int32_t* edges;     // [5][nb+1]
    const int32_t* width;     // [5][nb]
    int32_t nb;
    int32_t n_coeffs;         // 1024
    int32_t gain_bias;        // unused here; e_bin computed in Python/JAX
};

// Decode one record's content (after the length prefix).
// Returns 0 on success.
int decode_one(const uint8_t* bits, int64_t bit_off, const Tables& tb,
               int32_t* q, int32_t* e_band, int32_t* bt_out,
               int32_t* gain_out) {
    BitCursor cur{bits, bit_off};
    const int32_t bt = (int32_t)cur.take(3);
    const int32_t gain = (int32_t)cur.take(8);
    if (bt < 0 || bt > 4) return 1;
    *bt_out = bt;
    *gain_out = gain;
    const int32_t* edges = tb.edges + bt * (tb.nb + 1);
    const int32_t* width = tb.width + bt * tb.nb;

    int32_t cb[128];
    for (int b = 0; b < tb.nb; ++b)
        cb[b] = (width[b] > 0) ? (int32_t)cur.take(2) : 0;

    int32_t prev = 0;
    for (int b = 0; b < tb.nb; ++b) {
        e_band[b] = gain;   // default for empty bands
        if (width[b] <= 0) continue;
        int32_t sym = decode_sym(cur, tb.sf);
        if (sym < 0) return 2;
        int32_t delta = sym - 60;
        int32_t a = prev - delta;
        prev = a;
        int32_t e = gain - a;
        e_band[b] = e < 0 ? 0 : (e > 255 ? 255 : e);
    }

    std::memset(q, 0, sizeof(int32_t) * tb.n_coeffs);
    for (int b = 0; b < tb.nb; ++b) {
        if (width[b] <= 0 || cb[b] == 0) continue;
        const int lo = edges[b], hi = edges[b + 1];
        if (cb[b] == 1) {                       // CB_SMALL 4-tuples
            for (int t = lo; t < hi; t += 4) {
                int32_t sym = decode_sym(cur, tb.small);
                if (sym < 0) return 3;
                for (int d = 3; d >= 0; --d) {
                    q[t + d] = sym % 3 - 1;
                    sym /= 3;
                }
            }
        } else if (cb[b] == 2) {                // CB_MID pairs
            for (int t = lo; t < hi; t += 2) {
                int32_t sym = decode_sym(cur, tb.mid);
                if (sym < 0) return 4;
                q[t] = sym / 9 - 4;
                q[t + 1] = sym % 9 - 4;
            }
        } else {                                // CB_ESC pairs
            for (int t = lo; t < hi; t += 2) {
                int32_t sym = decode_sym(cur, tb.esc);
                if (sym < 0) return 5;
                int64_t m0 = sym / 17, m1 = sym % 17;
                uint32_t s0 = m0 ? cur.take1() : 0;
                uint32_t s1 = m1 ? cur.take1() : 0;
                if (m0 >= 16) {
                    int e = 4;
                    while (cur.take1()) ++e;
                    m0 = ((int64_t)1 << e) + cur.take(e);
                }
                if (m1 >= 16) {
                    int e = 4;
                    while (cur.take1()) ++e;
                    m1 = ((int64_t)1 << e) + cur.take(e);
                }
                q[t] = (int32_t)(s0 ? -m0 : m0);
                q[t + 1] = (int32_t)(s1 ? -m1 : m1);
            }
        }
    }
    return 0;
}

}  // namespace

extern "C" {

// Decode n_records frame records in parallel.
//   bits:        the whole file buffer
//   bit_offsets: [n] start bit of each record's CONTENT (after the prefix)
//   q:           [n][n_coeffs] out
//   e_band:      [n][nb] out (clipped exponent per band)
//   bt, gain:    [n] out
// Returns 0 on success, else 100 + first failing record's error code.
int mrc_decode_records(
    const uint8_t* bits, const int64_t* bit_offsets, int64_t n_records,
    // sf table
    const int64_t* sf_fc, const int64_t* sf_fs, const int64_t* sf_ord,
    const int64_t* sf_cnt, int32_t sf_min, int32_t sf_max,
    // small
    const int64_t* sm_fc, const int64_t* sm_fs, const int64_t* sm_ord,
    const int64_t* sm_cnt, int32_t sm_min, int32_t sm_max,
    // mid
    const int64_t* md_fc, const int64_t* md_fs, const int64_t* md_ord,
    const int64_t* md_cnt, int32_t md_min, int32_t md_max,
    // esc
    const int64_t* es_fc, const int64_t* es_fs, const int64_t* es_ord,
    const int64_t* es_cnt, int32_t es_min, int32_t es_max,
    const int32_t* edges, const int32_t* width, int32_t nb, int32_t n_coeffs,
    int32_t n_threads,
    int32_t* q, int32_t* e_band, int32_t* bt, int32_t* gain) {
    Tables tb;
    tb.sf = {sf_fc, sf_fs, sf_ord, sf_cnt, sf_min, sf_max};
    tb.small = {sm_fc, sm_fs, sm_ord, sm_cnt, sm_min, sm_max};
    tb.mid = {md_fc, md_fs, md_ord, md_cnt, md_min, md_max};
    tb.esc = {es_fc, es_fs, es_ord, es_cnt, es_min, es_max};
    tb.edges = edges;
    tb.width = width;
    tb.nb = nb;
    tb.n_coeffs = n_coeffs;
    if (nb > 128) return 99;

    std::atomic<int64_t> next(0);
    std::atomic<int> err(0);
    int nt = n_threads > 0 ? n_threads
                           : (int)std::thread::hardware_concurrency();
    if (nt < 1) nt = 1;
    if (nt > n_records) nt = (int)n_records;

    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n_records || err.load()) break;
            int rc = decode_one(bits, bit_offsets[i], tb,
                                q + i * n_coeffs, e_band + i * nb,
                                bt + i, gain + i);
            if (rc) err.store(100 + rc);
        }
    };
    if (nt == 1) {
        worker();
    } else {
        std::vector<std::thread> th;
        for (int t = 0; t < nt; ++t) th.emplace_back(worker);
        for (auto& t : th) t.join();
    }
    return err.load();
}

// MSB-first pack of (code, len) pairs into out (caller sizes it).
// Returns total bits written.
int64_t mrc_pack_codes(const uint64_t* codes, const int64_t* lens,
                       int64_t n, uint8_t* out) {
    int64_t bitpos = 0;
    uint64_t acc = 0;      // bit accumulator, MSB-aligned fill
    int accbits = 0;
    int64_t bytepos = 0;
    for (int64_t i = 0; i < n; ++i) {
        int l = (int)lens[i];
        if (!l) continue;
        acc = (acc << l) | (codes[i] & ((l >= 64) ? ~0ull : ((1ull << l) - 1)));
        accbits += l;
        while (accbits >= 8) {
            out[bytepos++] = (uint8_t)(acc >> (accbits - 8));
            accbits -= 8;
        }
        bitpos += l;
    }
    if (accbits > 0) out[bytepos++] = (uint8_t)(acc << (8 - accbits));
    return bitpos;
}

}  // extern "C"
