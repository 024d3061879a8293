// Context-model walks shared by the host wave-rANS coders
// (frozenwave.cpp, adaptwave.cpp).  Mirrors fastqueeze_tpu/models/base.py
// SeqModel / QualModel bit-for-bit (the same formulas as the trainer in
// trainhist.cpp); reset at every read start; qual ctx consumes the
// within-read position.
#ifndef FQ_WAVEMODELS_H_
#define FQ_WAVEMODELS_H_

#include <cstdint>
#include <vector>

namespace fqwave {

// Reciprocals of every possible quantized frequency f in [1, fmax]
// (fmax = M = 2^14 for both wave coders): with m = ceil(2^47 / f),
// e = m*f - 2^47 in [0, f) and x < 2^32, the error term
// x*e / (f*2^47) < 1/f because x*e < 2^32 * 2^14 = 2^46 < 2^47 — so
// floor(x / f) == (x * m) >> 47 EXACTLY, one mulx instead of the
// reverse-rANS division per encoded symbol.
struct RcpTable {
    std::vector<uint64_t> m;
    explicit RcpTable(uint32_t fmax) : m(fmax + 1) {
        for (uint64_t f = 1; f <= fmax; ++f)
            m[f] = ((uint64_t(1) << 47) + f - 1) / f;
        m[0] = m[1];   // pass2's f_safe: f == 0 divides by 1
    }
};

static inline uint32_t rcp_div(uint32_t x, uint32_t f, const uint64_t* m) {
    return static_cast<uint32_t>(
        (static_cast<unsigned __int128>(x) * m[f]) >> 47);
}

struct SeqM {
    uint32_t mask, magic;
    struct State { uint32_t h; };
    inline void reset(State& s) const { s.h = magic & mask; }
    inline int64_t ctx(const State& s, int64_t) const {
        return static_cast<int64_t>(s.h);
    }
    inline void update(State& s, int32_t sym) const {
        s.h = ((s.h << 2) | static_cast<uint32_t>(sym)) & mask;
    }
};

struct QualM {
    int32_t k, base, hash_bits, drop_bits, pos_bits, qlevel, drop_init;
    struct State { int32_t q[8]; int32_t drops; };
    inline void reset(State& s) const {
        for (int j = 0; j < 8; ++j) s.q[j] = 0;
        s.drops = drop_init;
    }
    inline int64_t ctx(const State& s, int64_t pos) const {
        if (k >= 2) {
            const int32_t qcap = base - 1;
            int64_t c = s.q[0] < qcap ? s.q[0] : qcap;
            for (int32_t j = 1; j < k; ++j) {
                const int32_t qc = s.q[j] < qcap ? s.q[j] : qcap;
                c = c * base + qc;
            }
            if (hash_bits)
                c = (static_cast<uint32_t>(c) * 2654435761u)
                    & ((1u << hash_bits) - 1);
            if (drop_bits) {
                const int32_t m = (1 << drop_bits) - 1;
                const int32_t d = s.drops >> 3;
                c = (c << drop_bits) | (d < m ? d : m);
            }
            if (pos_bits) {
                const int32_t m = (1 << pos_bits) - 1;
                const int32_t pp = static_cast<int32_t>(pos >> 4);
                c = (c << pos_bits) | (pp < m ? pp : m);
            }
            return c;
        }
        const int32_t q1 = s.q[0], q2 = s.q[1];
        int64_t c = (((q1 > q2 ? q1 : q2) << 6) + q1) & 0xFFF;
        if (qlevel >= 2) {
            if (q1 == q2) c += 0x1000;
            c += ((s.drops < 56 ? s.drops : 56) & ~7) << 10;
        }
        if (qlevel >= 3) {
            const int32_t p3 = static_cast<int32_t>(pos >> 3);
            c += static_cast<int64_t>(p3 < 15 ? p3 : 15) << 16;
        }
        return c;
    }
    inline void update(State& s, int32_t sym) const {
        s.drops += (s.q[0] > sym) ? (s.q[0] - sym) : 0;
        for (int j = 7; j > 0; --j) s.q[j] = s.q[j - 1];
        s.q[0] = sym;
    }
};

inline bool make_seq(const int64_t* spec, SeqM* m) {
    m->mask = static_cast<uint32_t>(spec[0]);
    m->magic = static_cast<uint32_t>(spec[1]);
    return true;
}

inline bool make_qual(const int64_t* spec, QualM* m) {
    m->k = static_cast<int32_t>(spec[0]);
    m->base = static_cast<int32_t>(spec[1]);
    m->hash_bits = static_cast<int32_t>(spec[2]);
    m->drop_bits = static_cast<int32_t>(spec[3]);
    m->pos_bits = static_cast<int32_t>(spec[4]);
    m->qlevel = static_cast<int32_t>(spec[5]);
    m->drop_init = static_cast<int32_t>(spec[6]);
    return m->k <= 8 && (m->k < 2 || m->base >= 2);
}

// --- shared wave-rANS lane machinery (frozenwave.cpp + adaptwave.cpp):
//     round-robin lane layout, per-lane read-walk state, and the
//     reverse-rANS emit + canonical (wave, lane) merge.  One definition
//     so a fix can never silently break bit-parity between the two
//     host coders. ---

constexpr uint32_t kRansL = 1u << 16;
constexpr uint32_t kProbBits = 14;
constexpr uint32_t kRansM = 1u << kProbBits;

// Per-lane read-walk state (round-robin layout: lane l codes reads
// l, l + L, l + 2L, ...), shared by encode and decode.
template <class Model>
struct LaneSt {
    typename Model::State st;
    uint32_t x;
    int64_t cur;      // current read (global index); < 0 = before first
    int64_t pos;      // position within the current read
    int64_t len;      // current read's length
    int64_t off;      // flat offset of the current read
    int64_t ctx;      // this wave's context (filled by the prefetch pass)
};

template <class Model>
inline void advance_lane(LaneSt<Model>& s, const Model& m,
                         const int64_t* counts, const int64_t* roff,
                         int64_t R, int64_t L, int64_t l) {
    if (s.pos == s.len) {   // advance to the next non-empty read
        int64_t r = s.cur < 0 ? l : s.cur + L;
        while (r < R && counts[r] == 0) r += L;
        s.cur = r;
        s.len = counts[r];
        s.off = roff[r];
        s.pos = 0;
        m.reset(s.st);
    }
}

// Flat read offsets, per-lane symbol counts, per-lane segment starts
// (wave-time order), longest lane, total symbols.
struct LaneLayout {
    std::vector<int64_t> roff, lane_len, seg;
    int64_t tmax, nsym;
    LaneLayout(const int64_t* counts, int64_t R, int64_t L)
        : roff(R), lane_len(L, 0), seg(L + 1, 0), tmax(0), nsym(0) {
        int64_t off = 0;
        for (int64_t r = 0; r < R; ++r) {
            roff[r] = off;
            off += counts[r];
            lane_len[r % L] += counts[r];
        }
        for (int64_t l = 0; l < L; ++l) {
            seg[l + 1] = seg[l] + lane_len[l];
            if (lane_len[l] > tmax) tmax = lane_len[l];
        }
        nsym = off;
    }
};

template <class Model>
inline std::vector<LaneSt<Model>> init_lanes(int64_t L, const Model& m,
                                             const uint32_t* states) {
    std::vector<LaneSt<Model>> ls(L);
    for (int64_t l = 0; l < L; ++l) {
        ls[l].x = states ? states[l] : 0;
        ls[l].cur = -1;
        ls[l].pos = 0;
        ls[l].len = 0;
        ls[l].off = 0;
        m.reset(ls[l].st);
    }
    return ls;
}

// Per-lane reverse rANS over the recorded (start, freq) stream
// (engine._pass2: emit one 16-bit word when (x >> 18) >= f, then
// x = (x/f) << 14 + x%f + start), merged into canonical (wave asc,
// lane asc) word order by counting sort — a lane emits at most one word
// per wave, so iterating lanes ascending keeps lanes ascending within a
// wave.  Returns the word count, or -1 when words_cap would overflow.
inline int64_t reverse_rans_merge(const uint16_t* ts, const uint16_t* tf,
                                  const LaneLayout& lay,
                                  uint16_t* words_out, int64_t words_cap,
                                  uint32_t* states_out) {
    const int64_t L = static_cast<int64_t>(lay.lane_len.size());
    const int64_t tmax = lay.tmax;
    std::vector<int32_t> wv_t;     // wave index per emitted word
    std::vector<uint16_t> wv_w;
    std::vector<int64_t> lane_w0(L + 1, 0);
    std::vector<int64_t> wcnt(tmax + 1, 0);
    wv_t.reserve(lay.nsym / 2 + 16);
    wv_w.reserve(lay.nsym / 2 + 16);
    static const RcpTable rcp(kRansM);   // thread-safe magic-static init
    const uint64_t* rm = rcp.m.data();
    for (int64_t l = 0; l < L; ++l) {
        uint32_t x = kRansL;
        for (int64_t i = lay.lane_len[l] - 1; i >= 0; --i) {
            const int64_t idx = lay.seg[l] + i;
            const uint32_t f = tf[idx];
            if ((x >> 18) >= f) {
                wv_t.push_back(static_cast<int32_t>(i));
                wv_w.push_back(static_cast<uint16_t>(x & 0xFFFF));
                ++wcnt[i];
                x >>= 16;
            }
            const uint32_t fs = f ? f : 1;   // engine pass2's f_safe
            const uint32_t q = rcp_div(x, f, rm);   // == x / fs
            x = (q << kProbBits) + (x - q * fs) + ts[idx];
        }
        states_out[l] = x;
        lane_w0[l + 1] = static_cast<int64_t>(wv_w.size());
    }
    const int64_t W = static_cast<int64_t>(wv_w.size());
    if (W > words_cap) return -1;
    std::vector<int64_t> cur(tmax + 1, 0);
    int64_t acc = 0;
    for (int64_t t = 0; t < tmax; ++t) {
        cur[t] = acc;
        acc += wcnt[t];
    }
    for (int64_t l = 0; l < L; ++l)
        for (int64_t kk = lane_w0[l]; kk < lane_w0[l + 1]; ++kk)
            words_out[cur[wv_t[kk]]++] = wv_w[kk];
    return W;
}

}  // namespace fqwave

#endif  // FQ_WAVEMODELS_H_
