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
    int64_t pos;     // bit position
    int64_t limit;   // total bits available (bounds check on every read)

    inline uint32_t take1() {
        if (pos >= limit) { pos = limit + 1; return 0; }
        uint32_t b = (data[pos >> 3] >> (7 - (pos & 7))) & 1u;
        ++pos;
        return b;
    }
    inline uint32_t take(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; ++i) v = (v << 1) | take1();
        return v;
    }
    inline bool overrun() const { return pos > limit; }
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
int decode_one(const uint8_t* bits, int64_t bit_off, int64_t bit_limit,
               const Tables& tb,
               int32_t* q, int32_t* e_band, int32_t* bt_out,
               int32_t* gain_out) {
    BitCursor cur{bits, bit_off, bit_limit};
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

    if (cur.overrun()) return 6;
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
                    while (cur.take1() && e < 31) ++e;
                    m0 = ((int64_t)1 << e) + cur.take(e);
                }
                if (m1 >= 16) {
                    int e = 4;
                    while (cur.take1() && e < 31) ++e;
                    m1 = ((int64_t)1 << e) + cur.take(e);
                }
                if (cur.overrun()) return 6;
                q[t] = (int32_t)(s0 ? -m0 : m0);
                q[t + 1] = (int32_t)(s1 ? -m1 : m1);
            }
        }
    }
    return cur.overrun() ? 6 : 0;
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
    const uint8_t* bits, int64_t total_bits,
    const int64_t* bit_offsets, int64_t n_records,
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
            if (bit_offsets[i] < 0 || bit_offsets[i] >= total_bits) {
                err.store(107);
                continue;
            }
            int rc = decode_one(bits, bit_offsets[i], total_bits, tb,
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

namespace {

struct BitEmitter {
    uint8_t* buf;
    int64_t bitpos = 0;

    inline void put(uint64_t code, int len) {
        int64_t p = bitpos;
        bitpos += len;
        for (int i = len - 1; i >= 0; --i, ++p) {
            uint8_t bit = (code >> i) & 1u;
            buf[p >> 3] = (uint8_t)((buf[p >> 3] & ~(1u << (7 - (p & 7))))
                                    | (bit << (7 - (p & 7))));
        }
    }
};

struct EncTables {
    const uint32_t *codes_small, *codes_mid, *codes_esc, *codes_sf;
    const int32_t *len_small, *len_mid, *len_esc, *len_sf;
    const int32_t *edges, *width;   // [5][nb+1], [5][nb]
    int32_t nb, n_coeffs;
};

// Emit one record (prefix + content + byte pad) into rec_buf.
// Returns total bytes used.
int64_t emit_record(const int16_t* q, const int8_t* amp, int16_t gain,
                    int8_t bt, const int8_t* cb, const EncTables& t,
                    uint8_t* rec_buf, int64_t cap_bytes) {
    std::memset(rec_buf, 0, cap_bytes);
    BitEmitter be{rec_buf, 20};                 // leave room for the prefix
    const int32_t* edges = t.edges + bt * (t.nb + 1);
    const int32_t* width = t.width + bt * t.nb;
    be.put((uint32_t)bt, 3);
    be.put((uint32_t)gain, 8);
    for (int b = 0; b < t.nb; ++b)
        if (width[b] > 0) be.put((uint32_t)cb[b], 2);
    int prev = 0;
    for (int b = 0; b < t.nb; ++b) {
        if (width[b] <= 0) continue;
        int a = amp[b];
        int delta = prev - a + 60;
        be.put(t.codes_sf[delta], t.len_sf[delta]);
        prev = a;
    }
    for (int b = 0; b < t.nb; ++b) {
        if (width[b] <= 0 || cb[b] == 0) continue;
        const int lo = edges[b], hi = edges[b + 1];
        if (cb[b] == 1) {
            for (int i = lo; i < hi; i += 4) {
                int s = 0;
                for (int d = 0; d < 4; ++d) {
                    int v = q[i + d];
                    v = v < -1 ? -1 : (v > 1 ? 1 : v);
                    s = s * 3 + (v + 1);
                }
                be.put(t.codes_small[s], t.len_small[s]);
            }
        } else if (cb[b] == 2) {
            for (int i = lo; i < hi; i += 2) {
                int a0 = q[i] + 4, a1 = q[i + 1] + 4;
                int s = a0 * 9 + a1;
                be.put(t.codes_mid[s], t.len_mid[s]);
            }
        } else {
            for (int i = lo; i < hi; i += 2) {
                int v0 = q[i], v1 = q[i + 1];
                int m0 = v0 < 0 ? -v0 : v0, m1 = v1 < 0 ? -v1 : v1;
                int c0 = m0 > 16 ? 16 : m0, c1 = m1 > 16 ? 16 : m1;
                int s = c0 * 17 + c1;
                be.put(t.codes_esc[s], t.len_esc[s]);
                if (m0) be.put(v0 < 0 ? 1u : 0u, 1);
                if (m1) be.put(v1 < 0 ? 1u : 0u, 1);
                for (int m : {m0, m1}) {
                    if (m >= 16) {
                        int e = 31 - __builtin_clz((unsigned)m);
                        be.put(((1u << (e - 4)) - 1) << 1, e - 3);
                        be.put((uint32_t)(m - (1 << e)), e);
                    }
                }
            }
        }
    }
    int64_t content = be.bitpos - 20;
    // patch the 20-bit length prefix at the front
    for (int i = 0; i < 20; ++i) {
        int64_t p = i;
        uint8_t bit = (uint8_t)((content >> (19 - i)) & 1);
        rec_buf[p >> 3] = (uint8_t)((rec_buf[p >> 3]
                                     & ~(1u << (7 - (p & 7))))
                                    | (bit << (7 - (p & 7))));
    }
    return (be.bitpos + 7) / 8;
}

}  // namespace

// Pack all records into out. rec_cap = per-record scratch bytes.
// out must hold n_records * rec_cap bytes; out_sizes[i] = record bytes.
// Returns 0, or 1 if any record overflowed rec_cap.
int mrc_pack_records(
    const int16_t* q, const int8_t* amp, const int16_t* gain,
    const int8_t* bt, const int8_t* cb, int64_t n_records,
    const uint32_t* codes_small, const int32_t* len_small,
    const uint32_t* codes_mid, const int32_t* len_mid,
    const uint32_t* codes_esc, const int32_t* len_esc,
    const uint32_t* codes_sf, const int32_t* len_sf,
    const int32_t* edges, const int32_t* width, int32_t nb, int32_t n_coeffs,
    int32_t n_threads, int64_t rec_cap,
    uint8_t* out, int64_t* out_sizes) {
    EncTables t{codes_small, codes_mid, codes_esc, codes_sf,
                len_small, len_mid, len_esc, len_sf,
                edges, width, nb, n_coeffs};
    // worst-case content check: QMAX escapes ~ 45 bits/pair
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
            int64_t sz = emit_record(q + i * n_coeffs, amp + i * nb,
                                     gain[i], bt[i], cb + i * nb, t,
                                     out + i * rec_cap, rec_cap);
            if (sz > rec_cap) { err.store(1); break; }
            out_sizes[i] = sz;
        }
    };
    if (nt == 1) {
        worker();
    } else {
        std::vector<std::thread> th;
        for (int k = 0; k < nt; ++k) th.emplace_back(worker);
        for (auto& th1 : th) th1.join();
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
