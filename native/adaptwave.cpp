// Host-native execution backend for the ADAPTIVE wave-rANS engine.
//
// Mirrors fastqueeze_tpu/ops/engine.py's per-wave adaptive coding path
// BIT-IDENTICALLY: the payload bytes produced/consumed here are exactly
// the device kernels' (_encode_fused_adapt / _decode_fused_adapt with
// chunk = 0 over the round-robin lane layout of ops/lanes.py).  Which
// backend runs a stream is a pure execution choice (ops/host_adapt.py
// routes on link economics, like ops/host_frozen.py does for the frozen
// path); the archive cannot tell them apart.
//
// Adaptive semantics recap (engine._pass1 / _decode):
//   * wave t codes symbol t of every active lane; the count tables are
//     SHARED across lanes — every lane's (start, freq) for wave t is
//     quantized from the table state after wave t-1's update;
//   * after each wave, counts[ctx][sym] += inc for every (valid) lane,
//     duplicates accumulating additively; then every touched row whose
//     total exceeds `cap` is halved elementwise ((v + 1) >> 1) until it
//     fits (the device applies a fixed n_halve conditional passes, which
//     converges to the same fixed point);
//   * quantization is engine._quant: F_s = floor(cum_s * M / C), with
//     M = 2^14; row totals stay <= cap <= M, so every count >= 1 keeps
//     freq >= 1;
//   * decode inverts the quantization without materializing F: the
//     decoded symbol is the largest s with F[s] <= low, i.e. with
//     cum_s <= floor(((low + 1) * C - 1) / M).
//
// The rANS arithmetic, lane layout, canonical (wave, lane) word order and
// serialized stream layout are identical to frozenwave.cpp.

#include <cstdint>
#include <cstring>
#include <vector>

#include "wavemodels.h"

namespace {

using fqwave::SeqM;
using fqwave::QualM;
using fqwave::make_seq;
using fqwave::make_qual;

constexpr uint32_t kRansL = 1u << 16;
constexpr uint32_t kProbBits = 14;
constexpr uint32_t kRansM = 1u << kProbBits;
constexpr uint32_t kMaskM = kRansM - 1;

// Shared adaptive count table + the per-wave update queue.
//
// Quantization divides by the row total C on every coded symbol
// (engine._quant: F_s = floor(cum_s * M / C)).  C only changes when a
// row is touched, so each row caches m = ceil(2^42 / C) and the coders
// divide by multiply-shift instead: floor(n / C) == (n * m) >> 42
// EXACTLY for this domain — with e = m*C - 2^42 in [0, C), the error
// term is n*e / (C * 2^42) < 1/C because n <= C*M and e < C <= M = 2^14
// give n*e < C^2 * M <= 2^42 — so one integer division per row-touch
// replaces two per symbol.
struct Table {
    std::vector<int32_t> counts;   // (n_ctx, A)
    std::vector<int32_t> tot;      // row totals
    std::vector<uint64_t> inv;     // ceil(2^42 / tot) per row
    std::vector<uint32_t> stamp;   // last wave that queued a fix per row
    std::vector<int64_t> pend_ctx; // this wave's (ctx, sym) adds
    std::vector<int32_t> pend_sym;
    std::vector<int64_t> fix;      // distinct touched rows this wave
    int64_t n_ctx;
    int32_t A, inc, cap;

    static inline uint64_t recip(int64_t c) {
        return ((uint64_t(1) << 42) + c - 1) / c;
    }
    // exact floor(n / tot[ctx]) for 0 <= n <= tot[ctx] << 14
    inline uint32_t divq(int64_t n, int64_t ctx) const {
        return static_cast<uint32_t>(
            (static_cast<uint64_t>(n) * inv[ctx]) >> 42);
    }

    void init(int64_t n_ctx_, int32_t A_, int32_t init_, int32_t inc_,
              int32_t cap_, int64_t L) {
        n_ctx = n_ctx_; A = A_; inc = inc_; cap = cap_;
        counts.assign(n_ctx * A, init_);
        tot.assign(n_ctx, init_ * A);
        inv.assign(n_ctx, recip(int64_t(init_) * A));
        stamp.assign(n_ctx, 0xFFFFFFFFu);
        pend_ctx.reserve(L);
        pend_sym.reserve(L);
        fix.reserve(L);
    }
    inline void queue(int64_t ctx, int32_t sym, uint32_t wave) {
        pend_ctx.push_back(ctx);
        pend_sym.push_back(sym);
        if (stamp[ctx] != wave) {
            stamp[ctx] = wave;
            fix.push_back(ctx);
        }
    }
    // apply the wave's adds, then rescale over-cap touched rows
    // (engine._wave_update_tot's fixed point)
    inline void flush() {
        for (size_t i = 0; i < pend_ctx.size(); ++i) {
            counts[pend_ctx[i] * A + pend_sym[i]] += inc;
            tot[pend_ctx[i]] += inc;
        }
        pend_ctx.clear();
        pend_sym.clear();
        for (int64_t ctx : fix) {
            int32_t t = tot[ctx];
            if (t > cap) {
                int32_t* row = counts.data() + ctx * A;
                while (t > cap) {
                    const int32_t prev = t;
                    t = 0;
                    for (int32_t a = 0; a < A; ++a) {
                        row[a] = (row[a] + 1) >> 1;
                        t += row[a];
                    }
                    // all-ones fixed point: cap < A can never rescale
                    // below A — stop instead of spinning forever
                    if (t == prev) break;
                }
                tot[ctx] = t;
            }
            inv[ctx] = recip(t);
        }
        fix.clear();
    }
};

// Lane machinery (LaneSt, advance_lane, LaneLayout, init_lanes,
// reverse_rans_merge) is shared with frozenwave.cpp via wavemodels.h.
using fqwave::LaneLayout;
using fqwave::LaneSt;
using fqwave::advance_lane;
using fqwave::init_lanes;
using fqwave::reverse_rans_merge;

// --- encode: wave-major forward model walk -> (start, freq) lane-major,
//     then per-lane reverse rANS; words merged canonically ---

template <class Model>
int64_t encode_impl(Table& tab, const uint8_t* syms, const int64_t* counts,
                    int64_t R, int64_t L, const Model& m,
                    uint16_t* words_out, int64_t words_cap,
                    uint32_t* states_out) {
    const int32_t A = tab.A;
    const LaneLayout lay(counts, R, L);
    std::vector<uint16_t> ts(lay.nsym), tf(lay.nsym);
    auto ls = init_lanes(L, m, nullptr);

    for (int64_t t = 0; t < lay.tmax; ++t) {
        // pass A: read advance + context + row prefetch (ctx depends only
        // on the lane's own symbol history, never on this wave's table)
        for (int64_t l = 0; l < L; ++l) {
            if (t >= lay.lane_len[l]) continue;
            LaneSt<Model>& s = ls[l];
            advance_lane(s, m, counts, lay.roff.data(), R, L, l);
            s.ctx = m.ctx(s.st, s.pos);
            __builtin_prefetch(tab.counts.data() + s.ctx * A);
        }
        // pass B: quantize + record (start, freq) + queue the update
        for (int64_t l = 0; l < L; ++l) {
            if (t >= lay.lane_len[l]) continue;
            LaneSt<Model>& s = ls[l];
            const int32_t sym = syms[s.off + s.pos];
            const int32_t* row = tab.counts.data() + s.ctx * A;
            int64_t cum = 0;
            for (int32_t a = 0; a < sym; ++a) cum += row[a];
            const int64_t start = tab.divq(cum << kProbBits, s.ctx);
            const int64_t end =
                tab.divq((cum + row[sym]) << kProbBits, s.ctx);
            const int64_t idx = lay.seg[l] + t;
            ts[idx] = static_cast<uint16_t>(start);
            tf[idx] = static_cast<uint16_t>(end - start);
            tab.queue(s.ctx, sym, static_cast<uint32_t>(t));
            m.update(s.st, sym);
            ++s.pos;
        }
        tab.flush();
    }
    return reverse_rans_merge(ts.data(), tf.data(), lay, words_out,
                              words_cap, states_out);
}

// --- decode: wave-major forward pass; symbol search inverts the
//     quantization directly on the count rows ---

template <class Model>
void decode_impl(Table& tab, const uint32_t* states, const uint16_t* words,
                 int64_t n_words, const int64_t* counts, int64_t R,
                 int64_t L, const Model& m, uint8_t* out) {
    const int32_t A = tab.A;
    const LaneLayout lay(counts, R, L);
    const std::vector<int64_t>& lane_len = lay.lane_len;
    auto ls = init_lanes(L, m, states);
    int64_t wp = 0;
    for (int64_t t = 0; t < lay.tmax; ++t) {
        for (int64_t l = 0; l < L; ++l) {
            if (t >= lane_len[l]) continue;
            LaneSt<Model>& s = ls[l];
            advance_lane(s, m, counts, lay.roff.data(), R, L, l);
            s.ctx = m.ctx(s.st, s.pos);
            __builtin_prefetch(tab.counts.data() + s.ctx * A);
        }
        for (int64_t l = 0; l < L; ++l) {
            if (t >= lane_len[l]) continue;
            LaneSt<Model>& s = ls[l];
            const int32_t* row = tab.counts.data() + s.ctx * A;
            const int64_t C = tab.tot[s.ctx];
            const uint32_t low = s.x & kMaskM;
            // largest sym with F[sym] <= low  <=>  cum_sym <= th
            const int64_t th = ((static_cast<int64_t>(low) + 1) * C - 1)
                               >> kProbBits;
            int32_t sym = 0;
            int64_t cum = 0;                 // cum_sym
            int64_t nxt = row[0];            // cum_{sym+1}
            while (sym < A - 1 && nxt <= th) {
                cum = nxt;
                ++sym;
                nxt += row[sym];
            }
            const uint32_t start = tab.divq(cum << kProbBits, s.ctx);
            const uint32_t end = tab.divq(nxt << kProbBits, s.ctx);
            const uint32_t f = end - start;
            uint32_t xn = f * (s.x >> kProbBits) + low - start;
            if (xn < kRansL) {
                // past-the-end reads mirror the device's zero padding
                // (only reachable on corrupt streams; MD5 reports those)
                const uint32_t w = wp < n_words ? words[wp] : 0;
                xn = (xn << 16) | w;
                ++wp;
            }
            s.x = xn;
            out[s.off + s.pos] = static_cast<uint8_t>(sym);
            tab.queue(s.ctx, sym, static_cast<uint32_t>(t));
            m.update(s.st, sym);
            ++s.pos;
        }
        tab.flush();
    }
}

}  // namespace

extern "C" {

// Returns n_words, or -1 (bad kind/spec or words_cap overflow).
// kind 0 = seq (spec: mask, magic); kind 1 = qual (spec: k, base,
// hash_bits, drop_bits, pos_bits, qlevel, drop_init).
int64_t fq_adapt_encode(int32_t A, int64_t n_ctx, int32_t init, int32_t inc,
                        int32_t cap, const uint8_t* syms,
                        const int64_t* counts, int64_t R, int64_t L,
                        int32_t kind, const int64_t* spec,
                        uint16_t* words_out, int64_t words_cap,
                        uint32_t* states_out) {
    Table tab;
    tab.init(n_ctx, A, init, inc, cap, L);
    if (kind == 0) {
        SeqM m;
        if (!make_seq(spec, &m)) return -1;
        return encode_impl(tab, syms, counts, R, L, m, words_out,
                           words_cap, states_out);
    }
    if (kind == 1) {
        QualM m;
        if (!make_qual(spec, &m)) return -1;
        return encode_impl(tab, syms, counts, R, L, m, words_out,
                           words_cap, states_out);
    }
    return -1;
}

// Returns 0, or -1 (bad kind/spec).
int64_t fq_adapt_decode(int32_t A, int64_t n_ctx, int32_t init, int32_t inc,
                        int32_t cap, const uint32_t* states,
                        const uint16_t* words, int64_t n_words,
                        const int64_t* counts, int64_t R, int64_t L,
                        int32_t kind, const int64_t* spec, uint8_t* out) {
    Table tab;
    tab.init(n_ctx, A, init, inc, cap, L);
    if (kind == 0) {
        SeqM m;
        if (!make_seq(spec, &m)) return -1;
        decode_impl(tab, states, words, n_words, counts, R, L, m, out);
        return 0;
    }
    if (kind == 1) {
        QualM m;
        if (!make_qual(spec, &m)) return -1;
        decode_impl(tab, states, words, n_words, counts, R, L, m, out);
        return 0;
    }
    return -1;
}

}  // extern "C"
