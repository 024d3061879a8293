// Host-native gapless seed-and-extend aligner — a decision-for-decision
// mirror of the device kernels in fastqueeze_tpu/align/hash.py
// (_align_batch / _one_strand, narrow mode k <= 15, local index).
//
// Why it exists: on this environment the TPU sits behind a tunnel
// (~36 ms/dispatch, 14 MB/s h2d) and the aligner is gather-bound on
// device (~68 M gathers/s), so a 10k-read block costs seconds; the same
// work is a few hundred ms of tight scalar code on the host (the
// reference binary's HashAlignment runs host-side at ~40k reads/s,
// SURVEY.md §2.2).  Which backend aligns a block is a free execution
// choice ONLY because this mirror reproduces the device pass BIT-
// IDENTICALLY: same sampled seed set, same fixed-step bucket binary
// search, same first-occurrence argmin tie-breaks, same probe-prefilter
// ordering (stable by (mismatches, index)), same candidate bounds
// quirks (clipped CSR pointers, BIG-occ fallthrough).  tests/
// test_alignhost.py cross-checks every output array against the jitted
// kernels on the CPU backend.
//
// Anything this mirror does not cover (wide keys k > 15, the sharded
// index, the one-indel tier) stays on the device path.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr int32_t BIG = 1 << 28;

static inline int mis2bit(uint32_t x) {
    return __builtin_popcount((x | (x >> 1)) & 0x55555555u);
}

struct Index {
    const uint32_t* keys; int64_t nk;
    const int32_t* offsets;
    const int32_t* positions; int64_t npos;
    const uint32_t* packed; int64_t nw;
    const int32_t* l1; int32_t l1_shift; int32_t search_steps;
    int32_t ref_len;
};

struct Cfg {
    int32_t k, stride, n_cand, max_mis, n_seeds, excl_bp, probe_k;
    int32_t lp;
    int n_words() const { return lp / 16; }
};

// _read_in_ref_frame: word j of the read funnel-shifted into the
// candidate's ref frame.  sh = 2 * (cand & 15).
static inline uint32_t frame_word(const uint32_t* arr, int W, int j,
                                  uint32_t sh) {
    uint32_t a = (j >= 1 && j <= W) ? arr[j - 1] : 0u;
    uint32_t b = (j < W) ? arr[j] : 0u;
    uint32_t shl = 32u - (sh > 1u ? sh : 1u);
    uint32_t hi = (j >= 1 && sh > 0) ? (a << shl) : 0u;
    return hi | (b >> sh);
}

// mismatch count of read (rw/mw, W words) vs ref window starting at cand,
// over frame words j0..j1 inclusive (device: range(W + 1) or probes).
static inline int mis_aligned(const Index& ix, uint32_t cand,
                              const uint32_t* rw, const uint32_t* mw,
                              int W, const int* js, int njs) {
    int64_t w0 = (int64_t)(cand >> 4);
    uint32_t sh = 2u * (cand & 15u);
    int mis = 0;
    for (int t = 0; t < njs; t++) {
        int j = js[t];
        int64_t wi = w0 + j;
        if (wi < 0) wi = 0;
        if (wi > ix.nw - 1) wi = ix.nw - 1;
        uint32_t refw = ix.packed[wi];
        uint32_t rsel = frame_word(rw, W, j, sh);
        uint32_t msel = frame_word(mw, W, j, sh);
        mis += mis2bit((rsel ^ refw) & msel);
    }
    return mis;
}

// one_strand: per-read candidate search + verify on an effective-strand
// row.  Mirrors hash.py _one_strand (narrow, l1-bucketed fixed-step
// search).  Returns (mis_best, pos_best).
static void one_strand(const Index& ix, const Cfg& cfg,
                       const uint8_t* row, const uint8_t* drow,
                       int32_t len, int32_t* mis_out, int32_t* pos_out) {
    const int lp = cfg.lp, k = cfg.k, W = cfg.n_words();
    const int P = lp - k + 1;
    const int S = (P + cfg.stride - 1) / cfg.stride;

    // rolling k-mers + window validity at the sampled positions
    std::vector<uint32_t> kv(S);
    std::vector<int64_t> ii(S);
    std::vector<int32_t> occ(S);
    std::vector<int32_t> psv(S);
    // degenerate prefix sum over the padded row
    std::vector<int32_t> cs(lp + 1, 0);
    for (int i = 0; i < lp; i++) cs[i + 1] = cs[i] + (drow[i] ? 1 : 0);
    for (int s = 0; s < S; s++) {
        int q = s * cfg.stride;
        psv[s] = q;
        uint32_t v = 0;
        for (int j = 0; j < k; j++) v = (v << 2) | row[q + j];
        kv[s] = v;
        bool ok_s = (q <= len - k) && (cs[q + k] - cs[q]) == 0;
        // bucket-bounded lower_bound, fixed search_steps (exact mirror)
        int64_t bq = (int64_t)(v >> ix.l1_shift);
        int64_t lo = ix.l1[bq], hi = ix.l1[bq + 1];
        int64_t hi0 = hi;
        for (int t = 0; t < ix.search_steps; t++) {
            bool active = lo < hi;
            int64_t mid = (lo + hi) >> 1;
            int64_t m = mid < ix.nk - 1 ? mid : ix.nk - 1;
            bool less = ix.keys[m] < v;
            if (active && less) lo = mid + 1;
            if (active && !less) hi = mid;
        }
        int64_t i2 = lo < ix.nk - 1 ? lo : ix.nk - 1;
        ii[s] = i2;
        bool found = (ix.keys[i2] == v) && (lo < hi0) && ok_s;
        occ[s] = found ? (ix.offsets[i2 + 1] - ix.offsets[i2]) : BIG;
    }

    // candidates from the n_seeds least-frequent sampled seeds
    const int C = cfg.n_cand;
    const int NS = cfg.n_seeds;
    std::vector<uint32_t> cand((size_t)C * NS);
    std::vector<uint8_t> cok((size_t)C * NS);
    for (int it = 0; it < NS; it++) {
        int jb = 0;
        for (int s = 1; s < S; s++) if (occ[s] < occ[jb]) jb = s;
        int32_t occ_best = occ[jb];
        int32_t pb = psv[jb];
        if (cfg.excl_bp > 0) {
            for (int s = 0; s < S; s++)
                if (std::abs(psv[s] - pb) <= cfg.excl_bp) occ[s] = BIG;
        } else {
            occ[jb] = BIG;
        }
        int32_t base = ix.offsets[ii[jb]];
        int32_t lim = occ_best < C ? occ_best : C;
        for (int cj = 0; cj < C; cj++) {
            int64_t ptr = (int64_t)base + cj;
            if (ptr < 0) ptr = 0;
            if (ptr > ix.npos - 1) ptr = ix.npos - 1;
            int32_t cp = ix.positions[ptr] - pb;    // int32 frame, like device
            bool ok = (cj < lim) && cp >= 0 && cp + len <= ix.ref_len;
            cand[(size_t)it * C + cj] = (uint32_t)cp;
            cok[(size_t)it * C + cj] = ok ? 1 : 0;
        }
    }

    // pack the read row into MSB-first u32 words + validity mask words
    std::vector<uint32_t> rw(W, 0), mw(W, 0);
    for (int i = 0; i < lp; i++) {
        uint32_t shv = 2u * (15 - (i & 15));
        if (i < len) {
            rw[i >> 4] |= ((uint32_t)row[i]) << shv;
            mw[i >> 4] |= 3u << shv;
        }
    }

    int total = C * NS;
    std::vector<int> sel;
    sel.reserve(total);
    int32_t best_mis = BIG;
    uint32_t best_pos = 0;
    bool have_best = false;
    // two-probe-word prefilter (device: lax.top_k(-pmis, K) then mask
    // pmis > max_mis, stable — smaller pmis first, ties by lower index).
    // A candidate whose two probe words already mismatch > max_mis can
    // never be accepted (probe words are a subset of the full window),
    // so both backends drop it before the full verify; the survivors
    // are exactly the prefix of the device's top-K ordering, so the
    // first-occurrence argmin below still mirrors the device argmin.
    int K = cfg.probe_k;
    if (K > 0 && total > 2 * K && W > 3) {
        int probes[2] = {1, W / 2};
        std::vector<int32_t> pmis(total);
        int pm_min = BIG, pm_arg = 0;
        for (int c = 0; c < total; c++) {
            int32_t pm = cok[c]
                ? mis_aligned(ix, cand[c], rw.data(), mw.data(), W,
                              probes, 2)
                : BIG;
            pmis[c] = pm;
            if (pm < pm_min) { pm_min = pm; pm_arg = c; }
            if (pm <= cfg.max_mis) sel.push_back(c);
        }
        std::sort(sel.begin(), sel.end(), [&](int a, int b) {
            return pmis[a] != pmis[b] ? pmis[a] < pmis[b] : a < b;
        });
        if ((int)sel.size() > K) sel.resize(K);
        if (sel.empty()) {
            // all candidates pruned: the device argmin over an all-BIG
            // row returns its first selected candidate = min (pmis, idx)
            *mis_out = BIG;
            *pos_out = (int32_t)cand[pm_arg];
            return;
        }
    } else {
        for (int c = 0; c < total; c++) sel.push_back(c);
    }

    for (size_t t = 0; t < sel.size(); t++) {
        int c = sel[t];
        int32_t m;
        if (!cok[c]) {
            m = BIG;
        } else {
            // early-exit: once the running count reaches the current
            // best, this candidate can no longer become the strict
            // minimum — the argmin outcome is unchanged
            int64_t w0 = (int64_t)(cand[c] >> 4);
            uint32_t sh = 2u * (cand[c] & 15u);
            m = 0;
            int32_t bound = have_best ? best_mis : BIG;
            for (int j = 0; j <= W && m < bound; j++) {
                int64_t wi = w0 + j;
                if (wi < 0) wi = 0;
                if (wi > ix.nw - 1) wi = ix.nw - 1;
                uint32_t refw = ix.packed[wi];
                uint32_t rsel = frame_word(rw.data(), W, j, sh);
                uint32_t msel = frame_word(mw.data(), W, j, sh);
                m += mis2bit((rsel ^ refw) & msel);
            }
        }
        if (!have_best || m < best_mis) {      // first-occurrence argmin
            best_mis = m;
            best_pos = cand[c];
            have_best = true;
        }
    }
    *mis_out = best_mis;
    *pos_out = (int32_t)best_pos;
}

}  // namespace

// strand_mode: 0 = fwd only, 1 = rc only (fallback acceptance),
// 2 = both (use_rev by both_strands rule).  Mirrors _align_batch.
extern "C" void fq_align_batch(
    const uint32_t* keys, int64_t nk, const int32_t* offsets,
    const int32_t* positions, int64_t npos,
    const uint32_t* packed, int64_t nw,
    const int32_t* l1, int32_t l1_shift, int32_t search_steps,
    int32_t ref_len,
    const uint8_t* codes, const uint8_t* dege, const int32_t* lengths,
    int64_t R, int32_t lp,
    int32_t k, int32_t stride, int32_t n_cand, int32_t max_mis,
    int32_t n_seeds, int32_t excl_bp, int32_t probe_k,
    int32_t strand_mode, int32_t both_strands,
    uint8_t* mapped, int32_t* pos_out, uint8_t* rev_out,
    uint8_t* mis_mask) {
    Index ix{keys, nk, offsets, positions, npos, packed, nw,
             l1, l1_shift, search_steps, ref_len};
    Cfg cfg{k, stride, n_cand, max_mis, n_seeds, excl_bp, probe_k, lp};
    std::vector<uint8_t> rc(lp), rdege(lp);
    for (int64_t r = 0; r < R; r++) {
        const uint8_t* row = codes + r * lp;
        const uint8_t* drow = dege + r * lp;
        int32_t len = lengths[r];
        bool has_dege = false;
        for (int i = 0; i < len && !has_dege; i++) has_dege = drow[i];

        int32_t mis_f = BIG, pos_f = 0, mis_r = BIG, pos_r = 0;
        if (strand_mode != 1)
            one_strand(ix, cfg, row, drow, len, &mis_f, &pos_f);
        // RC is a *fallback* in the non-both-strands rule (use_rev =
        // mis_f > max_mis): when forward already mapped, the RC result
        // is provably unused — skip the whole RC search (the vectorized
        // device kernel cannot skip, but its RC outputs are discarded
        // by the same where())
        bool need_rc = strand_mode != 0 &&
            !(strand_mode == 2 && !both_strands && mis_f <= max_mis);
        if (need_rc) {
            for (int i = 0; i < lp; i++) {
                rc[i] = i < len ? (uint8_t)(3 - row[len - 1 - i]) : 0;
                rdege[i] = i < len ? drow[len - 1 - i] : 0;
            }
            one_strand(ix, cfg, rc.data(), rdege.data(), len,
                       &mis_r, &pos_r);
        }
        bool use_rev;
        int32_t mis, pos;
        if (strand_mode == 0) {
            use_rev = false; mis = mis_f; pos = pos_f;
        } else if (strand_mode == 1) {
            use_rev = mis_r <= max_mis; mis = mis_r; pos = pos_r;
        } else if (both_strands) {
            use_rev = mis_r < mis_f;
            mis = use_rev ? mis_r : mis_f;
            pos = use_rev ? pos_r : pos_f;
        } else {
            use_rev = mis_f > max_mis;
            mis = use_rev ? mis_r : mis_f;
            pos = use_rev ? pos_r : pos_f;
        }
        bool is_mapped = (mis <= max_mis) && !has_dege && len >= k;
        mapped[r] = is_mapped ? 1 : 0;
        pos_out[r] = pos;
        rev_out[r] = (use_rev && is_mapped) ? 1 : 0;
        uint8_t* mm = mis_mask + r * lp;
        std::memset(mm, 0, lp);
        if (is_mapped) {
            const uint8_t* eff =
                (strand_mode == 1 || (strand_mode == 2 && use_rev))
                    ? rc.data() : row;
            for (int i = 0; i < len; i++) {
                int64_t idx = (int64_t)(uint32_t)pos + i;
                int64_t wi = idx >> 4;
                if (wi > ix.nw - 1) wi = ix.nw - 1;
                uint32_t shv = 2u * (15 - (idx & 15));
                uint8_t refb = (uint8_t)((ix.packed[wi] >> shv) & 3u);
                mm[i] = eff[i] != refb ? 1 : 0;
            }
        }
    }
}
