// Native serial adaptive range coder — host-side codec for small streams.
//
// Role parity with the reference's per-symbol coder (SURVEY.md §2.1,
// srcfile:EncapFqzComp.cpp: 64-bit-low range coder + SIMPLE_MODEL<N>
// adaptive frequency tables).  In the TPU rebuild the *large* streams
// (sequence / quality) are coded by the wave-synchronized interleaved rANS
// on device; the many *small* per-block streams (flags, lengths, ID bytes,
// mismatch metadata) would each pay a ~36 ms device round-trip, so they are
// coded here instead: a classic carry-propagating range coder (LZMA-style
// shift-low) with adaptive per-context symbol counts.
//
// The bitstream is its own format (marker 0x02 at the Python layer); a pure
// Python mirror (ops/host_rans.py) produces bit-identical output for
// environments without the native library.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kTop = 1u << 24;

struct REnc {
    uint64_t low = 0;
    uint32_t range = 0xFFFFFFFFu;
    uint8_t cache = 0;
    uint64_t cache_size = 1;
    uint8_t* out;
    int64_t cap;
    int64_t n = 0;
    bool overflow = false;

    explicit REnc(uint8_t* o, int64_t c) : out(o), cap(c) {}

    inline void put(uint8_t b) {
        if (n >= cap) { overflow = true; return; }
        out[n++] = b;
    }

    inline void shift_low() {
        if ((uint32_t)low < 0xFF000000u || (low >> 32)) {
            uint8_t carry = (uint8_t)(low >> 32);
            put((uint8_t)(cache + carry));
            while (--cache_size) put((uint8_t)(0xFF + carry));
            cache = (uint8_t)(low >> 24);
        }
        cache_size++;
        low = (uint32_t)low << 8;
    }

    inline void encode(uint32_t start, uint32_t size, uint32_t total) {
        uint32_t r = range / total;
        low += (uint64_t)start * r;
        range = size * r;
        while (range < kTop) { shift_low(); range <<= 8; }
    }

    void flush() { for (int i = 0; i < 5; ++i) shift_low(); }
};

struct RDec {
    uint32_t range = 0xFFFFFFFFu;
    uint32_t code = 0;
    const uint8_t* in;
    int64_t len;
    int64_t pos = 0;

    RDec(const uint8_t* i, int64_t l) : in(i), len(l) {
        pos = 1;  // first byte emitted by encoder is always 0 (cache init)
        for (int k = 0; k < 4; ++k) code = (code << 8) | get();
    }

    inline uint8_t get() { return pos < len ? in[pos++] : 0; }

    inline uint32_t decode_freq(uint32_t total, uint32_t& r) {
        r = range / total;
        uint32_t v = code / r;
        return v >= total ? total - 1 : v;
    }

    inline void decode_update(uint32_t start, uint32_t size, uint32_t r) {
        code -= start * r;
        range = size * r;
        while (range < kTop) {
            code = (code << 8) | get();
            range <<= 8;
        }
    }
};

// Adaptive per-context model: counts[n_ctx][alphabet] uint32, start at
// `init`, +`inc` per coded symbol, halve (keeping >= 1) when the row total
// exceeds `cap` — the same update rule as the device models so ratios match.
struct Model {
    std::vector<uint32_t> counts;
    std::vector<uint32_t> totals;
    int32_t A;
    int32_t inc, cap;

    Model(int32_t n_ctx, int32_t alphabet, int32_t init_, int32_t inc_,
          int32_t cap_)
        : counts((size_t)n_ctx * alphabet, (uint32_t)init_),
          totals((size_t)n_ctx, (uint32_t)init_ * alphabet),
          A(alphabet), inc(inc_), cap(cap_) {}

    inline uint32_t* row(uint32_t ctx) { return counts.data() + (size_t)ctx * A; }

    inline void update(uint32_t ctx, uint32_t sym) {
        uint32_t* c = row(ctx);
        c[sym] += inc;
        uint32_t t = totals[ctx] + inc;
        if ((int64_t)t > cap) {
            t = 0;
            for (int32_t i = 0; i < A; ++i) { c[i] = (c[i] + 1) >> 1; t += c[i]; }
        }
        totals[ctx] = t;
    }
};

}  // namespace

extern "C" {

// Encode n symbols (alphabet <= 256) with caller-supplied context ids.
// Returns bytes written, or -1 on overflow / bad args.
int64_t rc_encode_ctx(const uint8_t* syms, const uint32_t* ctx, int64_t n,
                      int32_t n_ctx, int32_t alphabet, int32_t init,
                      int32_t inc, int32_t cap, uint8_t* out,
                      int64_t out_cap) {
    if (alphabet < 1 || alphabet > 256 || n_ctx < 1 || init < 1) return -1;
    Model m(n_ctx, alphabet, init, inc, cap);
    REnc enc(out, out_cap);
    for (int64_t i = 0; i < n; ++i) {
        uint32_t cx = ctx ? ctx[i] : 0;
        uint32_t s = syms[i];
        const uint32_t* c = m.row(cx);
        uint32_t start = 0;
        for (uint32_t k = 0; k < s; ++k) start += c[k];
        enc.encode(start, c[s], m.totals[cx]);
        m.update(cx, s);
        if (enc.overflow) return -1;
    }
    enc.flush();
    return enc.overflow ? -1 : enc.n;
}

int64_t rc_decode_ctx(const uint8_t* in, int64_t in_len, const uint32_t* ctx,
                      int64_t n, int32_t n_ctx, int32_t alphabet,
                      int32_t init, int32_t inc, int32_t cap,
                      uint8_t* syms_out) {
    if (alphabet < 1 || alphabet > 256 || n_ctx < 1 || init < 1) return -1;
    Model m(n_ctx, alphabet, init, inc, cap);
    RDec dec(in, in_len);
    for (int64_t i = 0; i < n; ++i) {
        uint32_t cx = ctx ? ctx[i] : 0;
        const uint32_t* c = m.row(cx);
        uint32_t r;
        uint32_t f = dec.decode_freq(m.totals[cx], r);
        uint32_t start = 0, s = 0;
        while (start + c[s] <= f) { start += c[s]; ++s; }
        dec.decode_update(start, c[s], r);
        syms_out[i] = (uint8_t)s;
        m.update(cx, s);
    }
    return n;
}

// Order-1 byte codec: context = previous symbol (0 for the first).
int64_t rc_encode_o1(const uint8_t* syms, int64_t n, int32_t alphabet,
                     int32_t init, int32_t inc, int32_t cap, uint8_t* out,
                     int64_t out_cap) {
    if (alphabet < 1 || alphabet > 256 || init < 1) return -1;
    Model m(alphabet, alphabet, init, inc, cap);
    REnc enc(out, out_cap);
    uint32_t prev = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t s = syms[i];
        const uint32_t* c = m.row(prev);
        uint32_t start = 0;
        for (uint32_t k = 0; k < s; ++k) start += c[k];
        enc.encode(start, c[s], m.totals[prev]);
        m.update(prev, s);
        prev = s;
        if (enc.overflow) return -1;
    }
    enc.flush();
    return enc.overflow ? -1 : enc.n;
}

int64_t rc_decode_o1(const uint8_t* in, int64_t in_len, int64_t n,
                     int32_t alphabet, int32_t init, int32_t inc,
                     int32_t cap, uint8_t* syms_out) {
    if (alphabet < 1 || alphabet > 256 || init < 1) return -1;
    Model m(alphabet, alphabet, init, inc, cap);
    RDec dec(in, in_len);
    uint32_t prev = 0;
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t* c = m.row(prev);
        uint32_t r;
        uint32_t f = dec.decode_freq(m.totals[prev], r);
        uint32_t start = 0, s = 0;
        while (start + c[s] <= f) { start += c[s]; ++s; }
        dec.decode_update(start, c[s], r);
        syms_out[i] = (uint8_t)s;
        m.update(prev, s);
        prev = s;
    }
    return n;
}

}  // extern "C"
