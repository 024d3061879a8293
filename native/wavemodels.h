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

}  // namespace fqwave

#endif  // FQ_WAVEMODELS_H_
