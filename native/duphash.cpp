// Duplicate-read detection: one pass over a block's concatenated reads.
//
// For each read, find the index of the FIRST earlier read with identical
// length and bytes (the duplicate tier's back-reference target), or -1.
// Semantics are bit-identical to the numpy mirror in
// fastqueeze_tpu/pipeline/blockcodec.py (_dup_sources_np): group reads by
// (length, 64-bit weighted-sum hash), take the minimum index of each group
// as the candidate source, and verify content equality against it —
// a hash collision can only lose a duplicate, never fabricate one.
//
// The weights are splitmix64(i + 1) | 1 — pure function of the byte
// position, identical in C++ and numpy.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

static inline uint64_t sm64(uint64_t i) {
    uint64_t z = i * 0x9E3779B97F4A7C15ULL;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return (z ^ (z >> 31)) | 1ULL;
}

extern "C" int64_t fq_dup_sources(const uint8_t* flat, const int64_t* offs,
                                  const int64_t* lens, int64_t R,
                                  int64_t* src) {
    int64_t maxlen = 0;
    for (int64_t r = 0; r < R; ++r)
        if (lens[r] > maxlen) maxlen = lens[r];
    std::vector<uint64_t> w((size_t)maxlen);
    for (int64_t i = 0; i < maxlen; ++i)
        w[(size_t)i] = sm64((uint64_t)(i + 1));

    std::vector<uint64_t> h((size_t)R);
    for (int64_t r = 0; r < R; ++r) {
        const uint8_t* p = flat + offs[r];
        const int64_t L = lens[r];
        uint64_t acc = 0;
        for (int64_t i = 0; i < L; ++i)
            acc += (uint64_t)p[i] * w[(size_t)i];
        h[(size_t)r] = acc;
    }

    std::vector<int64_t> idx((size_t)R);
    for (int64_t r = 0; r < R; ++r) idx[(size_t)r] = r;
    std::sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
        if (lens[a] != lens[b]) return lens[a] < lens[b];
        if (h[(size_t)a] != h[(size_t)b]) return h[(size_t)a] < h[(size_t)b];
        return a < b;  // ascending index => run head is the group minimum
    });

    for (int64_t r = 0; r < R; ++r) src[r] = -1;
    int64_t found = 0;
    size_t s = 0;
    while (s < (size_t)R) {
        size_t e = s + 1;
        const int64_t f = idx[s];
        while (e < (size_t)R && lens[idx[e]] == lens[f]
               && h[(size_t)idx[e]] == h[(size_t)f])
            ++e;
        if (e - s > 1 && lens[f] > 0) {
            const uint8_t* pf = flat + offs[f];
            for (size_t m = s + 1; m < e; ++m) {
                const int64_t r = idx[m];
                if (!std::memcmp(flat + offs[r], pf, (size_t)lens[f])) {
                    src[r] = f;
                    ++found;
                }
            }
        }
        s = e;
    }
    return found;
}
