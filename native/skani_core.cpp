// skani-tpu native core: per-pair ANI pipeline + seeding hot loop.
//
// This is the host-side runtime complement to the TPU kernels: the ragged,
// branchy bookkeeping (anchor join, fragment chunking, chain extraction,
// greedy overlap resolution, per-chunk ANI statistics) runs here at native
// speed, while the dense DP/hash math runs on the device.  Semantics
// transcribe the reference pipeline exactly (reference: src/chain.rs,
// src/seeding.rs); the Python reference path in skani_tpu/chain.py is the
// oracle this library is fuzz-validated against.
//
// C ABI only (consumed via ctypes).
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <ctime>
#include <limits>
#include <thread>
#include <vector>

static inline double now_ms() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec * 1e3 + ts.tv_nsec * 1e-6;
}
static bool profile_enabled() {
    static int v = -1;
    if (v < 0) v = getenv("SKANI_NATIVE_PROFILE") ? 1 : 0;
    return v;
}

extern "C" {

// ---------------------------------------------------------------------------
// Seeding (reference: src/seeding.rs:225-323)
// ---------------------------------------------------------------------------

// NOTE: the reference's Rust `!key.wrapping_add(key << 21)` parses as
// NOT(key + (key<<21)) — different from minimap2's classic
// `(~key) + (key << 21)`.  The reference's variant is the spec
// (validated against a skani-produced sketch fixture).
static inline uint64_t mm_hash64(uint64_t key) {
    key = ~(key + (key << 21));
    key = key ^ (key >> 24);
    key = (key + (key << 3)) + (key << 8);
    key = key ^ (key >> 14);
    key = (key + (key << 2)) + (key << 4);
    key = key ^ (key >> 28);
    key = key + (key << 31);
    return key;
}

// out arrays must hold up to len entries. returns number of seeds;
// n_markers receives the marker count (written to marker_out).
int64_t fmh_seeds(const uint8_t* seq, int64_t len, int64_t c, int64_t k,
                  int64_t marker_c,
                  uint32_t* kmer_out, uint32_t* pos_out, uint8_t* canon_out,
                  uint64_t* marker_out, int64_t* n_markers) {
    const int64_t mk = 21;
    *n_markers = 0;
    if (len < 2 * mk) return 0;
    static uint64_t B2S[256];
    static bool init = false;
    if (!init) {
        memset(B2S, 0, sizeof(B2S));
        B2S['C'] = 1; B2S['G'] = 2; B2S['T'] = 3; B2S['U'] = 3;
        B2S['c'] = 1; B2S['g'] = 2; B2S['t'] = 3; B2S['u'] = 3;
        init = true;
    }
    const uint64_t seed_mask = (~0ULL) >> (64 - 2 * k);
    const uint64_t marker_mask = (~0ULL) >> (64 - 2 * mk);
    const uint64_t marker_rev_mask = ~(3ULL << (2 * mk - 2));
    const int marker_shift = 2 * (mk - 1);
    const uint64_t thr = (~0ULL) / (uint64_t)c;
    const uint64_t thr_m = (~0ULL) / (uint64_t)marker_c;
    uint64_t f = 0, r = 0;
    for (int64_t i = 0; i < mk - 1; i++) {
        uint64_t nf = B2S[seq[i]];
        f = (f << 2) | nf;
        r = (r >> 2) | ((3 - nf) << marker_shift);
    }
    int64_t n = 0;
    int64_t resume_ind = 0;
    for (int64_t i = mk - 1; i < len; i++) {
        uint8_t b = seq[i];
        if (b == 'N' || b == 'n') resume_ind = i + k;
        uint64_t nf = B2S[b];
        f = ((f << 2) | nf) & marker_mask;
        r = ((r >> 2) & marker_rev_mask) | ((3 - nf) << marker_shift);
        uint64_t fs = f & seed_mask, rs = r & seed_mask;
        bool canon = fs < rs;
        uint64_t kmer = canon ? fs : rs;
        uint64_t h = mm_hash64(kmer);
        if (h < thr && resume_ind <= i) {
            kmer_out[n] = (uint32_t)kmer;
            pos_out[n] = (uint32_t)i;
            canon_out[n] = canon ? 1 : 0;
            n++;
            if (h < thr_m) {
                marker_out[(*n_markers)++] = f < r ? f : r;
            }
        }
    }
    return n;
}

// ---------------------------------------------------------------------------
// Per-pair pipeline (reference: src/chain.rs:144-171 and callees)
// ---------------------------------------------------------------------------

struct Anchor {
    uint32_t qc, qp, rc, rp;
    uint8_t rev;
    bool operator<(const Anchor& o) const {
        if (qc != o.qc) return qc < o.qc;
        if (qp != o.qp) return qp < o.qp;
        if (rc != o.rc) return rc < o.rc;
        if (rp != o.rp) return rp < o.rp;
        return rev < o.rev;
    }
};

struct Interval {
    double score;
    int64_t num_anchors;
    uint32_t q0, q1, r0, r1;
    int64_t rc, qc, chunk_id;
    uint8_t rev;
};

struct PairResult {
    std::vector<double> ani_est;
    std::vector<int64_t> weight;
    uint64_t total_query_bases = 0;
    uint64_t total_ref_range = 0;
    uint64_t avg_chain_int_len = 0;
    int64_t num_chains = 0;
    int64_t n_anchors = 0;
};

// Sorted-desc order matching the reference's derived PartialOrd on
// ChainInterval (score, num_anchors, q-interval, r-interval, ref_contig,
// query_contig, chunk_id, reverse, overlap) (reference: src/types.rs:508-519)
static bool interval_gt(const Interval& a, const Interval& b) {
    if (a.score != b.score) return a.score > b.score;
    if (a.num_anchors != b.num_anchors) return a.num_anchors > b.num_anchors;
    if (a.q0 != b.q0) return a.q0 > b.q0;
    if (a.q1 != b.q1) return a.q1 > b.q1;
    if (a.r0 != b.r0) return a.r0 > b.r0;
    if (a.r1 != b.r1) return a.r1 > b.r1;
    if (a.rc != b.rc) return a.rc > b.rc;
    if (a.qc != b.qc) return a.qc > b.qc;
    if (a.chunk_id != b.chunk_id) return a.chunk_id > b.chunk_id;
    return a.rev > b.rev;
}

// CSR sketch view
struct SketchView {
    const uint32_t* kmers;
    const int64_t* starts;  // len nk+1
    int64_t nk;
    const uint32_t* pos;
    const uint32_t* ctg;
    const uint8_t* canon;
};

static void build_anchors(const SketchView& q, const SketchView& r,
                          int64_t band, std::vector<Anchor>& anchors,
                          std::vector<std::vector<uint32_t>>& qpa,
                          int64_t n_q_contigs) {
    // Anchors packed into (u64, u64) keys so the lexicographic sort
    // (reference: src/types.rs:499-506 Ord) is a trivial 128-bit compare:
    // hi = qc<<32 | qp, lo = rc<<33 | rp<<1 | rev.
    std::vector<std::pair<uint64_t, uint64_t>> packed;
    packed.reserve(4096);
    std::vector<uint64_t> qpa_packed;  // ctg<<32 | pos
    qpa_packed.reserve(4096);
    int64_t i = 0, j = 0;
    while (i < q.nk) {
        uint32_t kq = q.kmers[i];
        while (j < r.nk && r.kmers[j] < kq) j++;
        int64_t qs = q.starts[i], qe = q.starts[i + 1];
        if (qe - qs > band) { i++; continue; }
        bool in_r = (j < r.nk && r.kmers[j] == kq);
        if (!in_r) {
            for (int64_t t = qs; t < qe; t++)
                qpa_packed.push_back(((uint64_t)q.ctg[t] << 32) | q.pos[t]);
        } else {
            int64_t rs = r.starts[j], re = r.starts[j + 1];
            if (re - rs > band) { i++; continue; }
            for (int64_t t = qs; t < qe; t++)
                qpa_packed.push_back(((uint64_t)q.ctg[t] << 32) | q.pos[t]);
            for (int64_t t = qs; t < qe; t++) {
                uint64_t hi = ((uint64_t)q.ctg[t] << 32) | q.pos[t];
                for (int64_t u = rs; u < re; u++) {
                    uint64_t lo = ((uint64_t)r.ctg[u] << 33)
                        | ((uint64_t)r.pos[u] << 1)
                        | (uint64_t)(q.canon[t] != r.canon[u]);
                    packed.push_back({hi, lo});
                }
            }
        }
        i++;
    }
    std::sort(packed.begin(), packed.end());
    anchors.resize(packed.size());
    for (size_t t = 0; t < packed.size(); t++) {
        anchors[t] = {(uint32_t)(packed[t].first >> 32),
                      (uint32_t)(packed[t].first & 0xFFFFFFFF),
                      (uint32_t)(packed[t].second >> 33),
                      (uint32_t)((packed[t].second >> 1) & 0xFFFFFFFF),
                      (uint8_t)(packed[t].second & 1)};
    }
    // one flat sort of (ctg, pos), then split per contig
    std::sort(qpa_packed.begin(), qpa_packed.end());
    qpa.assign((size_t)n_q_contigs, {});
    size_t s = 0;
    while (s < qpa_packed.size()) {
        uint32_t ctg = (uint32_t)(qpa_packed[s] >> 32);
        size_t e = s;
        while (e < qpa_packed.size() && (qpa_packed[e] >> 32) == ctg) e++;
        auto& v = qpa[ctg];
        v.resize(e - s);
        for (size_t t = s; t < e; t++)
            v[t - s] = (uint32_t)(qpa_packed[t] & 0xFFFFFFFF);
        s = e;
    }
}

// fragment chunking (reference: src/chain.rs:738-826). Returns chunk start
// indices (chunk i = anchors[cs[i], cs[i+1])) and per-chunk seed positions.
static void chunk_anchors(const std::vector<Anchor>& anchors,
                          const std::vector<std::vector<uint32_t>>& qpa,
                          int64_t fragment_length,
                          std::vector<int64_t>& chunk_starts,
                          std::vector<std::vector<uint32_t>>& seeds) {
    chunk_starts.clear();
    seeds.clear();
    if (anchors.empty()) { chunk_starts.push_back(0); return; }
    size_t n = anchors.size();
    uint32_t last_ctg = anchors[0].qc;
    uint64_t cep = (uint64_t)anchors[0].qp + fragment_length;
    size_t running = 0;
    chunk_starts.push_back(0);
    auto consume = [&](uint64_t limit) {
        const auto& v = qpa[last_ctg];
        std::vector<uint32_t> blk;
        while (running < v.size() && v[running] <= limit)
            blk.push_back(v[running++]);
        seeds.push_back(std::move(blk));
    };
    for (size_t a = 1; a < n; a++) {
        if (anchors[a].qc != last_ctg || anchors[a].qp > cep) {
            consume(cep);
            chunk_starts.push_back((int64_t)a);
            cep += fragment_length;
            if (anchors[a].qc != last_ctg) {
                cep = (uint64_t)anchors[a].qp + fragment_length;
                running = 0;
            }
            last_ctg = anchors[a].qc;
        }
    }
    // final chunk: seeds up to the last anchor's query pos
    consume(anchors[n - 1].qp);
    chunk_starts.push_back((int64_t)n);
}

// banded DP within one chunk (reference: src/chain.rs:838-896)
static void chain_dp(const Anchor* a, int64_t n, int64_t band,
                     int64_t past_chain_length, double max_gap,
                     double anchor_score, double* dp, int64_t* ptr) {
    for (int64_t i = 0; i < n; i++) {
        double best = 0.0;
        int64_t bi = i;
        for (int64_t j = i - 1; j >= 0; j--) {
            if (a[i].rc != a[j].rc) continue;
            if ((int64_t)a[i].qp - (int64_t)a[j].qp > past_chain_length ||
                i - j > band) break;
            if (a[i].rev != a[j].rev) continue;
            if (a[i].rp == a[j].rp || a[i].qp == a[j].qp) continue;
            double d_q = (double)a[i].qp - (double)a[j].qp;
            double d_r = a[i].rev ? (double)a[j].rp - (double)a[i].rp
                                  : (double)a[i].rp - (double)a[j].rp;
            if (d_q > 5000.0 || d_r > 5000.0) continue;
            if (d_r <= 0.0) continue;
            double gap = std::fabs(d_r - d_q);
            if (gap > max_gap) continue;
            double ns = anchor_score - gap + dp[j];
            if (ns > best) { best = ns; bi = j; }
        }
        dp[i] = best;
        ptr[i] = bi;
    }
}

// chain extraction (reference: src/chain.rs:939-1007)
static void extract_intervals(const Anchor* a, int64_t n, int64_t base,
                              const double* dp, const int64_t* ptr,
                              int64_t min_anchors, double min_score,
                              int64_t chunk_id,
                              std::vector<Interval>& out) {
    // component roots (ptr[i] <= i)
    std::vector<int64_t> root(n);
    for (int64_t i = 0; i < n; i++)
        root[i] = ptr[i] == i ? i : root[ptr[i]];
    // group members; component sizes
    std::vector<int64_t> size(n, 0);
    for (int64_t i = 0; i < n; i++) size[root[i]]++;
    // best member per root: max dp, smallest index on ties
    std::vector<int64_t> best(n, -1);
    for (int64_t i = 0; i < n; i++) {
        int64_t rt = root[i];
        if (best[rt] < 0 || dp[i] > dp[best[rt]]) best[rt] = i;
    }
    for (int64_t rt = 0; rt < n; rt++) {
        if (best[rt] < 0 || size[rt] < min_anchors) continue;
        int64_t b = best[rt];
        double max_score = dp[b];
        int64_t num = 1, idx = b;
        while (ptr[idx] != idx) { idx = ptr[idx]; num++; }
        if (num < min_anchors || max_score < min_score) continue;
        uint32_t q0 = a[idx].qp, q1 = a[b].qp;
        uint32_t e1 = a[idx].rp, e2 = a[b].rp;
        out.push_back({max_score, num, q0, q1,
                       std::min(e1, e2), std::max(e1, e2),
                       (int64_t)a[idx].rc, (int64_t)a[idx].qc,
                       chunk_id, a[idx].rev});
        (void)base;
    }
}

// greedy non-overlap (reference: src/chain.rs:1008-1099)
// Accepted-interval index for one contig: (start, end) pairs kept sorted
// by start, with the max accepted length as a scan bound.  An overlap
// query walks backward from the last start < e and stops once
// start + max_len <= s — every earlier interval ends at or before s.
// Same accepted set and overlap sums as a full linear scan (the sum is
// commutative), O(log n + overlap window) instead of O(n) per candidate.
struct AcceptedList {
    std::vector<std::pair<uint32_t, uint32_t>> by_start;  // (start, end)
    uint32_t max_len = 0;
    void insert(uint32_t s, uint32_t e) {
        auto it = std::upper_bound(
            by_start.begin(), by_start.end(),
            std::make_pair(s, (uint32_t)UINT32_MAX));
        by_start.insert(it, {s, e});
        if (e - s > max_len) max_len = e - s;
    }
    // total overlap credit vs [s, e): sum of min(e - o.s, o.e - s)
    // over every accepted o with o.s < e && o.e > s
    bool overlap(uint32_t s, uint32_t e, uint64_t& sum) const {
        bool any = false;
        auto it = std::lower_bound(
            by_start.begin(), by_start.end(),
            std::make_pair(e, (uint32_t)0));
        while (it != by_start.begin()) {
            --it;
            if ((uint64_t)it->first + max_len <= s) break;
            if (it->second > s) {
                any = true;
                sum += std::min((uint64_t)(e - it->first),
                                (uint64_t)(it->second - s));
            }
        }
        return any;
    }
};

static void nonoverlap(std::vector<Interval>& ivs, int64_t num_chunks,
                       std::vector<std::vector<Interval>>& good) {
    std::sort(ivs.begin(), ivs.end(), interval_gt);
    good.assign((size_t)num_chunks, {});
    // per-contig accepted interval indexes
    std::vector<std::pair<int64_t, AcceptedList>> tq, tr;
    auto find_list = [](std::vector<std::pair<int64_t, AcceptedList>>& t,
                        int64_t key) -> AcceptedList& {
        for (auto& p : t) if (p.first == key) return p.second;
        t.push_back({key, {}});
        return t.back().second;
    };
    for (auto& iv : ivs) {
        auto& lq = find_list(tq, iv.qc);
        auto& lr = find_list(tr, iv.rc);
        uint64_t sum_r = 0, sum_q = 0;
        bool any_r = lr.overlap(iv.r0, iv.r1, sum_r);
        bool any_q = lq.overlap(iv.q0, iv.q1, sum_q);
        bool ok_r = !any_r ||
            ((float)sum_r < (float)(iv.r1 - iv.r0) * 0.50f);
        bool ok_q = !any_q ||
            ((float)sum_q < (float)(iv.q1 - iv.q0) * 0.50f);
        if (ok_r && ok_q) {
            lq.insert(iv.q0, iv.q1);
            lr.insert(iv.r0, iv.r1);
            good[iv.chunk_id].push_back(iv);
        }
    }
}

// per-chunk ANI statistics (reference: src/chain.rs:173-555 loop body)
static void chunk_stats(const std::vector<std::vector<Interval>>& good,
                        const std::vector<std::vector<uint32_t>>& seeds,
                        int64_t k, int64_t c, bool switched, bool amino_acid,
                        int64_t min_length_cover, PairResult& res) {
    bool sensitive_af = c < 200;
    for (size_t ci = 0; ci < good.size(); ci++) {
        const auto& ivs = good[ci];
        int64_t total_anchors = 0;
        uint64_t tbc_query = 0;
        int64_t trq0 = INT64_MAX, trq1 = INT64_MIN;
        std::vector<std::pair<int64_t, int64_t>> unions;
        for (const auto& iv : ivs) {
            total_anchors += iv.num_anchors;
            if ((int64_t)iv.q0 < trq0) trq0 = iv.q0;
            if ((int64_t)iv.q1 > trq1) trq1 = iv.q1;
            if (!switched)
                tbc_query += (uint64_t)(iv.q1 - iv.q0) + k + 2 * c;
            else
                tbc_query += (uint64_t)(iv.r1 - iv.r0) + k + 2 * c;
            int64_t s = std::max((int64_t)iv.q0 - c, (int64_t)0);
            unions.push_back({s, (int64_t)iv.q1 + c});
            uint64_t add = (uint64_t)(iv.q1 - iv.q0) + 2 * c + k;
            if (sensitive_af) {
                res.total_query_bases += add;
                res.total_ref_range += add;
            }
            res.avg_chain_int_len += add;
            res.num_chains++;
        }
        if (total_anchors == 0) continue;
        if (trq1 - trq0 < min_length_cover) continue;
        if (!sensitive_af) {
            uint64_t add = (uint64_t)(trq1 - trq0) + 2 * c + k;
            res.total_query_bases += add;
            res.total_ref_range += add;
        }
        // merge closed intervals
        std::sort(unions.begin(), unions.end());
        std::vector<std::pair<int64_t, int64_t>> merged;
        for (auto& u : unions) {
            if (!merged.empty() && u.first <= merged.back().second)
                merged.back().second = std::max(merged.back().second,
                                                u.second);
            else merged.push_back(u);
        }
        int64_t in_union = 0, in_range = 0;
        const auto& sp = seeds[ci];
        for (uint32_t p : sp) {
            int64_t pp = p;
            // binary search merged
            size_t lo = 0, hi = merged.size();
            while (lo < hi) {
                size_t mid = (lo + hi) / 2;
                if (merged[mid].first <= pp) lo = mid + 1; else hi = mid;
            }
            if (lo > 0 && pp <= merged[lo - 1].second) in_union++;
            if (pp >= trq0 && pp <= trq1) in_range++;
        }
        int64_t considered = (int64_t)sp.size();
        double putative = std::pow((double)total_anchors / (double)in_union,
                                   1.0 / (double)k);
        if (putative > 0.950 && tbc_query > (uint64_t)(c * 4) &&
            !amino_acid && trq1 - trq0 < 18000 &&
            (double)considered > 1.05 * (double)in_range) {
            considered = in_range;
        }
        double ml;
        if (amino_acid)
            ml = std::min(1.0, (double)total_anchors / (double)considered
                                   * 6.0);
        else
            ml = std::min(1.0, (double)total_anchors / (double)considered);
        double est = std::pow(ml, 1.0 / (double)k);
        if (amino_acid) {
            res.ani_est.push_back(est);
            res.weight.push_back((int64_t)sp.size() / 6);
        } else {
            res.ani_est.push_back(est);
            res.weight.push_back(considered);
        }
    }
}

// ---------------------------------------------------------------------------
// Device-pipeline post-processing: greedy overlap resolution + per-chunk
// aggregation over intervals computed on the TPU, emitting seed-rank queries
// to be answered by the device (phase B).  Mirrors
// get_nonoverlapping_chains + the calculate_ani chunk loop
// (reference: src/chain.rs:1008-1099, 173-413).
// ---------------------------------------------------------------------------

struct ChunkRecord {
    int64_t chunk_idx;
    int64_t total_anchors;
    uint64_t tbc_query;
    int64_t trq0, trq1;
    int64_t ctg, lo, hi;
    int64_t union_off, n_union;  // into union query pairs
};

struct IvOutput {
    std::vector<ChunkRecord> recs;
    std::vector<int32_t> q_ctg;   // rank queries (ctg, v)
    std::vector<int32_t> q_val;
    uint64_t total_query_bases = 0;
    uint64_t total_ref_range = 0;
    uint64_t avg_chain_sum = 0;
    int64_t num_chains = 0;
};

struct IvOutputView {
    const int64_t* rec_data;      // flattened ChunkRecord as 10x int64
    int64_t n_recs;
    const int32_t* q_ctg;
    const int32_t* q_val;
    int64_t n_queries;
    uint64_t total_query_bases;
    uint64_t total_ref_range;
    uint64_t avg_chain_sum;
    int64_t num_chains;
    IvOutput* owner;
    std::vector<int64_t>* flat;
};

IvOutputView* process_intervals(
    const double* score, const int64_t* num, const uint32_t* q0,
    const uint32_t* q1, const uint32_t* r0, const uint32_t* r1,
    const int64_t* rcg, const int64_t* qcg, const int64_t* cid,
    const uint8_t* rev, int64_t n_iv,
    const int64_t* chunk_hi, const int64_t* chunk_ctg,
    const uint8_t* chunk_new_ctg, int64_t n_chunks,
    int64_t k, int64_t c, int32_t switched, int32_t amino_acid,
    int64_t min_length_cover) {
    std::vector<Interval> ivs;
    ivs.reserve(n_iv);
    for (int64_t i = 0; i < n_iv; i++) {
        ivs.push_back({score[i], num[i], q0[i], q1[i], r0[i], r1[i],
                       rcg[i], qcg[i], cid[i], rev[i]});
    }
    std::vector<std::vector<Interval>> good;
    nonoverlap(ivs, n_chunks, good);

    auto* out = new IvOutput();
    bool sensitive_af = c < 200;
    for (int64_t t = 0; t < n_chunks; t++) {
        const auto& g = good[t];
        int64_t total_anchors = 0;
        uint64_t tbc_query = 0;
        int64_t trq0 = INT64_MAX, trq1 = INT64_MIN;
        std::vector<std::pair<int64_t, int64_t>> unions;
        for (const auto& iv : g) {
            total_anchors += iv.num_anchors;
            if ((int64_t)iv.q0 < trq0) trq0 = iv.q0;
            if ((int64_t)iv.q1 > trq1) trq1 = iv.q1;
            if (!switched)
                tbc_query += (uint64_t)(iv.q1 - iv.q0) + k + 2 * c;
            else
                tbc_query += (uint64_t)(iv.r1 - iv.r0) + k + 2 * c;
            unions.push_back({std::max((int64_t)iv.q0 - c, (int64_t)0),
                              (int64_t)iv.q1 + c});
            uint64_t add = (uint64_t)(iv.q1 - iv.q0) + 2 * c + k;
            if (sensitive_af) {
                out->total_query_bases += add;
                out->total_ref_range += add;
            }
            out->avg_chain_sum += add;
            out->num_chains++;
        }
        if (total_anchors == 0) continue;
        if (trq1 - trq0 < min_length_cover) continue;
        if (!sensitive_af) {
            uint64_t add = (uint64_t)(trq1 - trq0) + 2 * c + k;
            out->total_query_bases += add;
            out->total_ref_range += add;
        }
        std::sort(unions.begin(), unions.end());
        std::vector<std::pair<int64_t, int64_t>> merged;
        for (auto& u : unions) {
            if (!merged.empty() && u.first <= merged.back().second)
                merged.back().second = std::max(merged.back().second,
                                                u.second);
            else merged.push_back(u);
        }
        int64_t lo = -1;
        if (t > 0 && !chunk_new_ctg[t]) lo = chunk_hi[t - 1];
        int64_t hi = chunk_hi[t];
        int64_t ctg = chunk_ctg[t];
        ChunkRecord rec{t, total_anchors, tbc_query, trq0, trq1, ctg, lo,
                        hi, (int64_t)out->q_ctg.size() / 1, 0};
        // query order: lo, hi, max(trq0-1, lo), min(trq1, hi), then unions
        auto push_q = [&](int64_t v) {
            out->q_ctg.push_back((int32_t)ctg);
            out->q_val.push_back((int32_t)v);
        };
        rec.union_off = (int64_t)out->q_ctg.size();
        push_q(lo);
        push_q(hi);
        push_q(std::max(trq0 - 1, lo));
        push_q(std::min(trq1, hi));
        for (auto& m : merged) {
            push_q(std::max(m.first - 1, lo));
            push_q(std::min(m.second, hi));
        }
        rec.n_union = (int64_t)merged.size();
        out->recs.push_back(rec);
    }
    auto* view = new IvOutputView();
    view->owner = out;
    auto* flat = new std::vector<int64_t>();
    flat->reserve(out->recs.size() * 10);
    for (auto& r : out->recs) {
        flat->push_back(r.chunk_idx);
        flat->push_back(r.total_anchors);
        flat->push_back((int64_t)r.tbc_query);
        flat->push_back(r.trq0);
        flat->push_back(r.trq1);
        flat->push_back(r.ctg);
        flat->push_back(r.lo);
        flat->push_back(r.hi);
        flat->push_back(r.union_off);
        flat->push_back(r.n_union);
    }
    view->flat = flat;
    view->rec_data = flat->data();
    view->n_recs = (int64_t)out->recs.size();
    view->q_ctg = out->q_ctg.data();
    view->q_val = out->q_val.data();
    view->n_queries = (int64_t)out->q_ctg.size();
    view->total_query_bases = out->total_query_bases;
    view->total_ref_range = out->total_ref_range;
    view->avg_chain_sum = out->avg_chain_sum;
    view->num_chains = out->num_chains;
    return view;
}

void free_iv_output(IvOutputView* v) {
    if (v) { delete v->owner; delete v->flat; delete v; }
}

// ---------- public entry points ----------

struct PairOutput {
    double* ani_est;
    int64_t* weight;
    int64_t n_ests;
    uint64_t total_query_bases;
    uint64_t total_ref_range;
    uint64_t avg_chain_int_len;  // already divided by num_chains
    int64_t num_chains;
    int64_t n_anchors;
    // scratch ownership
    PairResult* owner;
};

// Full per-pair pipeline from pre-switched CSR sketches.
// dp_scores/dp_ptr: optional precomputed DP (from the TPU) over anchors in
// sorted order; pass nullptr to compute on host.
PairOutput* run_pair(
    const uint32_t* q_kmers, const int64_t* q_starts, int64_t q_nk,
    const uint32_t* q_pos, const uint32_t* q_ctg, const uint8_t* q_canon,
    int64_t n_q_contigs,
    const uint32_t* r_kmers, const int64_t* r_starts, int64_t r_nk,
    const uint32_t* r_pos, const uint32_t* r_ctg, const uint8_t* r_canon,
    int64_t band, int64_t fragment_length, int64_t past_chain_length,
    double max_gap, double anchor_score, int64_t min_anchors,
    double min_score, int64_t k, int64_t c, int32_t switched,
    int32_t amino_acid, int64_t min_length_cover) {
    SketchView q{q_kmers, q_starts, q_nk, q_pos, q_ctg, q_canon};
    SketchView r{r_kmers, r_starts, r_nk, r_pos, r_ctg, r_canon};
    auto* pres = new PairResult();
    std::vector<Anchor> anchors;
    std::vector<std::vector<uint32_t>> qpa;
    double t0 = now_ms();
    build_anchors(q, r, band, anchors, qpa, n_q_contigs);
    double t1 = now_ms();
    pres->n_anchors = (int64_t)anchors.size();
    double t2 = t1, t3 = t1, t4 = t1, t5 = t1;
    if (!anchors.empty()) {
        std::vector<int64_t> cs;
        std::vector<std::vector<uint32_t>> seeds;
        chunk_anchors(anchors, qpa, fragment_length, cs, seeds);
        t2 = now_ms();
        int64_t n_chunks = (int64_t)cs.size() - 1;
        std::vector<double> dp(anchors.size());
        std::vector<int64_t> ptr(anchors.size());
        std::vector<Interval> ivs;
        for (int64_t t = 0; t < n_chunks; t++) {
            int64_t s = cs[t], e = cs[t + 1];
            chain_dp(anchors.data() + s, e - s, band, past_chain_length,
                     max_gap, anchor_score, dp.data() + s, ptr.data() + s);
        }
        t3 = now_ms();
        for (int64_t t = 0; t < n_chunks; t++) {
            int64_t s = cs[t], e = cs[t + 1];
            extract_intervals(anchors.data() + s, e - s, s, dp.data() + s,
                              ptr.data() + s, min_anchors, min_score, t,
                              ivs);
        }
        t4 = now_ms();
        std::vector<std::vector<Interval>> good;
        nonoverlap(ivs, n_chunks, good);
        t5 = now_ms();
        chunk_stats(good, seeds, k, c, switched != 0, amino_acid != 0,
                    min_length_cover, *pres);
    }
    if (profile_enabled()) {
        fprintf(stderr,
                "[native] join %.2f chunk %.2f dp %.2f extract %.2f "
                "overlap %.2f stats %.2f ms (%lld anchors)\n",
                t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4,
                now_ms() - t5, (long long)pres->n_anchors);
    }
    auto* out = new PairOutput();
    out->owner = pres;
    out->ani_est = pres->ani_est.data();
    out->weight = pres->weight.data();
    out->n_ests = (int64_t)pres->ani_est.size();
    out->total_query_bases = pres->total_query_bases;
    out->total_ref_range = pres->total_ref_range;
    out->avg_chain_int_len =
        pres->num_chains ? pres->avg_chain_int_len / pres->num_chains : 0;
    out->num_chains = pres->num_chains;
    out->n_anchors = pres->n_anchors;
    return out;
}

void free_pair_output(PairOutput* o) {
    if (o) { delete o->owner; delete o; }
}

// Bootstrap resample sums (reference: src/chain.rs:57-86): fastrand 1.9's
// wyrand PRNG from `seed`, usize(..n_mult) via Lemire's debiased
// multiply-high reduction with the rejection loop, consumed row-major as
// (iters, num_samp).  Bit-identical to skani_tpu/hashing.py's batch form
// (which stays as the spec / no-native fallback).
static inline uint64_t wyrand_next(uint64_t& s) {
    s += 0xa0761d6478bd642fULL;
    unsigned __int128 p = (unsigned __int128)s *
        (uint64_t)(s ^ 0xe7037ed1a0b428dbULL);
    return (uint64_t)p ^ (uint64_t)(p >> 64);
}

static void fastrand_indices_impl(int64_t n_calls, uint64_t below,
                                  uint64_t seed, uint64_t* out);

// Percentile-bootstrap CI + std over (ani_est, weight) pairs IN THEIR
// FINAL SORTED ORDER (reference: src/chain.rs:57-86).  This is the single
// shared implementation for every execution tier (NumPy spec, native
// per-pair, device batch): the draw stream is wyrand(seed 7) and the
// resample sums accumulate sequentially in double, so CI bits never
// depend on which tier produced the estimates.  out = {lo, hi, std}.
void bootstrap_ci(const double* anis, const int64_t* weights, int64_t n,
                  double* out) {
    double std = 0.0;
    if (n > 0) {
        double s = 0.0;
        for (int64_t i = 0; i < n; i++) s += anis[i];
        double mean = s / (double)n;
        double s2 = 0.0;
        for (int64_t i = 0; i < n; i++) {
            double d = mean - anis[i];
            s2 += d * d;
        }
        std = std::sqrt(s2 / (double)n);
    }
    out[0] = 0.0; out[1] = 1.0; out[2] = std;
    if (n < 10) return;
    std::vector<double> mult;
    int64_t tot = 0;
    for (int64_t i = 0; i < n; i++) tot += weights[i];
    mult.reserve((size_t)std::max(tot, (int64_t)0));
    for (int64_t i = 0; i < n; i++)
        for (int64_t m = 0; m < weights[i]; m++) mult.push_back(anis[i]);
    if (mult.empty()) return;
    const int64_t iters = 100;
    std::vector<uint64_t> idx((size_t)(iters * n));
    fastrand_indices_impl(iters * n, (uint64_t)mult.size(), 7, idx.data());
    std::vector<double> res((size_t)iters);
    for (int64_t it = 0; it < iters; it++) {
        double s = 0.0;
        for (int64_t j = 0; j < n; j++)
            s += mult[(size_t)idx[(size_t)(it * n + j)]];
        res[(size_t)it] = s / (double)n;
    }
    std::sort(res.begin(), res.end());
    out[0] = res[(size_t)(iters * 5 / 100 - 1)];
    out[1] = res[(size_t)(iters * 95 / 100 - 1)];
}

// ---------------------------------------------------------------------------
// Batched finalize for the device engine: for each pair in a readback
// batch, unpack the phase-A output row, resolve interval overlaps, answer
// the seed-rank queries from the host rank tables
// (skani_tpu/kernels/rank_host.py), run the per-chunk estimator tail
// (reference: src/chain.rs:326-396) and the calculate_ani tail (trimmed
// weighted mean + bootstrap + AF gates, reference: src/chain.rs:414-517)
// — one C call per batch instead of ~10 Python/ctypes hops per pair.
//
// layout 1 = sorted_packed rows [wm1|wm2|q0|q1|r0|r1|meta|3 scalars],
// layout 0 = the 10-field unpacked rows + 3 chunk blocks + 3 scalars.
// Rank tables arrive as raw pointers (int64 addresses of the cached,
// sorted packed-position arrays); rank(g, v) = ub(all) - ub(own) - ub(ban)
// at key g*2^32 + v.
//
// out_f per pair: {ani (AF-gated, pre-f32-cast), covered_query,
// covered_ref, ci_lo, ci_hi, std}; out_i per pair: {status (0 ok, 1 empty
// result, 2 overflow -> caller falls back to the exact per-pair path),
// avg_chain_int_len, num_chains, total_query_bases}.
static void finalize_device_range(
    const int32_t* packed, int64_t row_stride,
    int64_t w_begin, int64_t w_end, int64_t n_step,
    int64_t i_cap, int64_t c_cap, int32_t layout,
    const int64_t* k_a, const int64_t* c_a, const uint8_t* switched_a,
    const uint8_t* amino_a, const int64_t* mlc_a,
    const uint8_t* robust_a, const uint8_t* median_a,
    const double* bothcut_a, const double* fraccut_a,
    const int64_t* qlen_a, const int64_t* rlen_a,
    const int64_t* all_addr, const int64_t* all_len,
    const int64_t* own_addr, const int64_t* own_len,
    const int64_t* ban_addr, const int64_t* ban_len,
    double* out_f, int64_t* out_i) {
    const int64_t I = i_cap, C = c_cap;
    // env-gated phase accumulators (SKANI_NATIVE_PROFILE): shared across
    // threads without locking — profiling runs are single-threaded
    static double pf_unpack = 0, pf_nonov = 0, pf_stats = 0, pf_tail = 0;
    static int64_t pf_pairs = 0;
    const bool prof = profile_enabled();
    double pt0 = 0;
    for (int64_t w = w_begin; w < w_end; w += n_step) {
        if (prof) pt0 = now_ms();
        const int32_t* row = packed + w * row_stride;
        double* of = out_f + w * 6;
        int64_t* oi = out_i + w * 4;
        const int64_t k = k_a[w], c = c_a[w];
        const bool switched = switched_a[w], amino = amino_a[w];
        int64_t n_chunks, overflow;
        if (layout == 1) {
            n_chunks = row[6 * I + C];
            overflow = row[6 * I + C + 2];
        } else {
            n_chunks = row[10 * I + 3 * C];
            overflow = row[10 * I + 3 * C + 2];
        }
        if (overflow) { oi[0] = 2; continue; }

        // --- unpack intervals + chunk metadata ---
        std::vector<Interval> ivs;
        std::vector<int64_t> chunk_hi(n_chunks), chunk_ctg(n_chunks);
        std::vector<uint8_t> chunk_new(n_chunks);
        if (layout == 1) {
            const int32_t* meta = row + 6 * I;
            for (int64_t t = 0; t < n_chunks; t++) {
                int32_t m = meta[t];
                if (m < 0) { chunk_hi[t] = -1; chunk_ctg[t] = -1;
                             chunk_new[t] = 0; }
                else { chunk_hi[t] = m >> 7; chunk_ctg[t] = (m >> 1) & 0x3F;
                       chunk_new[t] = (uint8_t)(m & 1); }
            }
            for (int64_t i = 0; i < I; i++) {
                int32_t wm1 = row[i], wm2 = row[I + i];
                if (!(wm1 & 1)) continue;
                int64_t cid = wm2 >> 7;
                ivs.push_back({(double)(wm1 >> 11), (int64_t)((wm1 >> 1) & 0x3FF),
                               (uint32_t)row[2 * I + i], (uint32_t)row[3 * I + i],
                               (uint32_t)row[4 * I + i], (uint32_t)row[5 * I + i],
                               (wm2 >> 1) & 0x3F, chunk_ctg[(size_t)cid], cid,
                               (uint8_t)(wm2 & 1)});
            }
        } else {
            const int32_t* hi_b = row + 10 * I;
            const int32_t* ctg_b = hi_b + C;
            const int32_t* new_b = ctg_b + C;
            for (int64_t t = 0; t < n_chunks; t++) {
                chunk_hi[t] = hi_b[t]; chunk_ctg[t] = ctg_b[t];
                chunk_new[t] = (uint8_t)new_b[t];
            }
            for (int64_t i = 0; i < I; i++) {
                if (!row[i]) continue;   // valid block
                int64_t cid = row[8 * I + i];
                ivs.push_back({(double)row[I + i], (int64_t)row[2 * I + i],
                               (uint32_t)row[3 * I + i], (uint32_t)row[4 * I + i],
                               (uint32_t)row[5 * I + i], (uint32_t)row[6 * I + i],
                               (int64_t)row[7 * I + i], chunk_ctg[(size_t)cid],
                               cid, (uint8_t)row[9 * I + i]});
            }
        }
        if (prof) { pf_unpack += now_ms() - pt0; pt0 = now_ms(); }
        std::vector<std::vector<Interval>> good;
        nonoverlap(ivs, n_chunks, good);
        if (prof) { pf_nonov += now_ms() - pt0; pt0 = now_ms(); }

        // --- rank tables for this pair ---
        const int64_t* t_all = (const int64_t*)(uintptr_t)all_addr[w];
        const int64_t* t_own = (const int64_t*)(uintptr_t)own_addr[w];
        const int64_t* t_ban = (const int64_t*)(uintptr_t)ban_addr[w];
        const int64_t n_all = all_len[w], n_own = own_len[w],
            n_ban = ban_len[w];
        const int64_t* tabs[3] = {t_all, t_own, t_ban};
        const int64_t lens[3] = {n_all, n_own, n_ban};
        // Every rank the estimator consumes is a DIFFERENCE of ranks at
        // keys inside one chunk's (lo, hi] window, so the full-table
        // upper_bounds are needed only at the window edges; the inner
        // queries then search the ~window-sized subrange (L1-resident)
        // instead of the whole table.  Chunks tile the contig, so the
        // next chunk's lo-edge bounds are this chunk's hi-edge bounds.
        int64_t carry_ctg = -1, carry_hi = 0;
        int64_t carry_at[3] = {0, 0, 0};

        // --- per-chunk aggregation + estimator tail ---
        std::vector<double> ests;
        std::vector<int64_t> wts;
        uint64_t total_query_bases = 0, total_ref_range = 0, avg_sum = 0;
        int64_t num_chains = 0;
        bool sensitive_af = c < 200;
        for (int64_t t = 0; t < n_chunks; t++) {
            const auto& g = good[(size_t)t];
            int64_t total_anchors = 0;
            uint64_t tbc_query = 0;
            int64_t trq0 = INT64_MAX, trq1 = INT64_MIN;
            std::vector<std::pair<int64_t, int64_t>> unions;
            for (const auto& iv : g) {
                total_anchors += iv.num_anchors;
                if ((int64_t)iv.q0 < trq0) trq0 = iv.q0;
                if ((int64_t)iv.q1 > trq1) trq1 = iv.q1;
                if (!switched)
                    tbc_query += (uint64_t)(iv.q1 - iv.q0) + k + 2 * c;
                else
                    tbc_query += (uint64_t)(iv.r1 - iv.r0) + k + 2 * c;
                unions.push_back({std::max((int64_t)iv.q0 - c, (int64_t)0),
                                  (int64_t)iv.q1 + c});
                uint64_t add = (uint64_t)(iv.q1 - iv.q0) + 2 * c + k;
                if (sensitive_af) {
                    total_query_bases += add;
                    total_ref_range += add;
                }
                avg_sum += add;
                num_chains++;
            }
            if (total_anchors == 0) continue;
            if (trq1 - trq0 < mlc_a[w]) continue;
            if (!sensitive_af) {
                uint64_t add = (uint64_t)(trq1 - trq0) + 2 * c + k;
                total_query_bases += add;
                total_ref_range += add;
            }
            std::sort(unions.begin(), unions.end());
            std::vector<std::pair<int64_t, int64_t>> merged;
            for (auto& u : unions) {
                if (!merged.empty() && u.first <= merged.back().second)
                    merged.back().second = std::max(merged.back().second,
                                                    u.second);
                else merged.push_back(u);
            }
            // rank-query window (matches process_intervals' emission):
            // seeds counted within (lo, hi] of the chunk's query contig
            int64_t lo = -1;
            if (t > 0 && !chunk_new[(size_t)t]) lo = chunk_hi[(size_t)(t - 1)];
            int64_t hi = chunk_hi[(size_t)t];
            int64_t ctg = chunk_ctg[(size_t)t];
            const int64_t key_lo = ctg * (int64_t)4294967296LL + lo;
            const int64_t key_hi = ctg * (int64_t)4294967296LL + hi;
            int64_t wlo[3], whi[3];
            for (int s = 0; s < 3; s++) {
                if (!lens[s]) { wlo[s] = whi[s] = 0; continue; }
                wlo[s] = (ctg == carry_ctg && lo == carry_hi)
                    ? carry_at[s]
                    : std::upper_bound(tabs[s], tabs[s] + lens[s],
                                       key_lo) - tabs[s];
                whi[s] = std::upper_bound(tabs[s] + wlo[s],
                                          tabs[s] + lens[s],
                                          key_hi) - tabs[s];
            }
            carry_ctg = ctg;
            carry_hi = hi;
            for (int s = 0; s < 3; s++) carry_at[s] = whi[s];
            auto rank_in = [&](int64_t v) -> int64_t {   // lo <= v <= hi
                int64_t key = ctg * (int64_t)4294967296LL + v;
                int64_t r = std::upper_bound(tabs[0] + wlo[0],
                                             tabs[0] + whi[0], key)
                    - tabs[0];
                for (int s = 1; s < 3; s++)
                    if (lens[s])
                        r -= std::upper_bound(tabs[s] + wlo[s],
                                              tabs[s] + whi[s], key)
                            - tabs[s];
                return r;
            };
            int64_t total_seeds = (whi[0] - wlo[0]) - (whi[1] - wlo[1])
                - (whi[2] - wlo[2]);
            int64_t in_range = rank_in(std::min(trq1, hi))
                - rank_in(std::max(trq0 - 1, lo));
            double in_union = 0.0;
            for (auto& m : merged)
                in_union += (double)(rank_in(std::min(m.second, hi))
                                     - rank_in(std::max(m.first - 1, lo)));
            // estimator tail (reference: src/chain.rs:326-396; mirrors
            // device_pipeline._finalize_chunks bit for bit)
            double putative = std::pow((double)total_anchors / in_union,
                                       1.0 / (double)k);
            int64_t considered = total_seeds;
            if (putative > 0.950 && tbc_query > (uint64_t)(c * 4) && !amino
                && trq1 - trq0 < 18000
                && (double)considered > 1.05 * (double)in_range)
                considered = in_range;
            double ml;
            if (amino)
                ml = (double)total_anchors / (double)considered * 6.0;
            else
                ml = (double)total_anchors / (double)considered;
            if (!(ml < 1.0)) ml = 1.0;   // np.minimum(1.0, ml)
            ests.push_back(std::pow(ml, 1.0 / (double)k));
            wts.push_back(amino ? total_seeds / 6 : considered);
        }

        if (prof) { pf_stats += now_ms() - pt0; pt0 = now_ms(); }
        // --- calculate_ani tail (reference: src/chain.rs:414-517) ---
        if (ests.empty() || num_chains == 0) { oi[0] = 1; continue; }
        int64_t n_est = (int64_t)ests.size();
        std::vector<int64_t> ord((size_t)n_est);
        for (int64_t i = 0; i < n_est; i++) ord[(size_t)i] = i;
        std::stable_sort(ord.begin(), ord.end(),
                         [&](int64_t a, int64_t b) {
                             if (ests[(size_t)a] != ests[(size_t)b])
                                 return ests[(size_t)a] < ests[(size_t)b];
                             return wts[(size_t)a] < wts[(size_t)b];
                         });
        std::vector<double> s_est((size_t)n_est);
        std::vector<int64_t> s_wt((size_t)n_est);
        for (int64_t i = 0; i < n_est; i++) {
            s_est[(size_t)i] = ests[(size_t)ord[(size_t)i]];
            s_wt[(size_t)i] = wts[(size_t)ord[(size_t)i]];
        }
        int64_t total_mult = 0;
        for (int64_t i = 0; i < n_est; i++) total_mult += s_wt[(size_t)i];
        double lower = 0.0, upper = 1.0;
        if (median_a[w]) { lower = 0.499; upper = 0.501; }
        else if (robust_a[w]) { lower = 0.10; upper = 0.90; }
        int64_t lower_i = 0, upper_i = n_est - 1;
        bool changed_l = false;
        int64_t curr = 0;
        for (int64_t i = 0; i < n_est; i++) {
            curr += s_wt[(size_t)i];
            if (curr >= (int64_t)((double)total_mult * lower) && !changed_l) {
                lower_i = i; changed_l = true;
            }
            if (curr >= (int64_t)((double)total_mult * upper)) {
                upper_i = i + 1; break;
            }
        }
        double w_avg = 0.0;
        int64_t w_total = 0;
        for (int64_t i = lower_i; i < upper_i; i++) {
            w_avg += s_est[(size_t)i] * (double)s_wt[(size_t)i];
            w_total += s_wt[(size_t)i];
        }
        double final_ani = w_total
            ? w_avg / (double)w_total
            : std::numeric_limits<double>::quiet_NaN();
        double ci[3];
        bootstrap_ci(s_est.data(), s_wt.data(), n_est, ci);
        double covered_query = (double)total_query_bases / (double)qlen_a[w];
        if (!(covered_query < 1.0)) covered_query = 1.0;
        double covered_ref = (double)total_ref_range / (double)rlen_a[w];
        if (!(covered_ref < 1.0)) covered_ref = 1.0;
        if (bothcut_a[w] > 0.0) {
            if (covered_query < bothcut_a[w] || covered_ref < bothcut_a[w])
                final_ani = -1.0;
        } else if (amino) {
            if (covered_query < fraccut_a[w] || covered_ref < fraccut_a[w])
                final_ani = -1.0;
        } else if (covered_query < fraccut_a[w]
                   && covered_ref < fraccut_a[w]) {
            final_ani = -1.0;
        }
        of[0] = final_ani;
        of[1] = covered_query;
        of[2] = covered_ref;
        of[3] = ci[0];
        of[4] = ci[1];
        of[5] = ci[2];
        oi[0] = 0;
        oi[1] = num_chains ? (int64_t)(avg_sum / (uint64_t)num_chains) : 0;
        oi[2] = num_chains;
        oi[3] = (int64_t)total_query_bases;
        if (prof) pf_tail += now_ms() - pt0;
    }
    if (prof) {
        pf_pairs += (w_end - w_begin + n_step - 1) / n_step;
        fprintf(stderr,
                "[finalize] unpack %.2f nonoverlap %.2f rank+stats %.2f "
                "tail+ci %.2f ms cumulative over %lld pairs\n",
                pf_unpack, pf_nonov, pf_stats, pf_tail,
                (long long)pf_pairs);
    }
}

// Public entry: fans the per-pair loop across `n_threads` host threads
// (the reference's rayon pair loop analog, reference: src/dist.rs:98-143)
// — pairs are independent (rank tables are read-only, outputs disjoint),
// strided so heavy and light pairs interleave across threads.  ctypes
// releases the GIL for the whole call, so Python-side work overlaps too.
void finalize_device_batch(
    const int32_t* packed, int64_t row_stride, int64_t n_pairs,
    int64_t i_cap, int64_t c_cap, int32_t layout,
    const int64_t* k_a, const int64_t* c_a, const uint8_t* switched_a,
    const uint8_t* amino_a, const int64_t* mlc_a,
    const uint8_t* robust_a, const uint8_t* median_a,
    const double* bothcut_a, const double* fraccut_a,
    const int64_t* qlen_a, const int64_t* rlen_a,
    const int64_t* all_addr, const int64_t* all_len,
    const int64_t* own_addr, const int64_t* own_len,
    const int64_t* ban_addr, const int64_t* ban_len,
    double* out_f, int64_t* out_i, int64_t n_threads) {
    auto run = [&](int64_t begin, int64_t step) {
        finalize_device_range(packed, row_stride, begin, n_pairs, step,
                              i_cap, c_cap, layout, k_a, c_a, switched_a,
                              amino_a, mlc_a, robust_a, median_a,
                              bothcut_a, fraccut_a, qlen_a, rlen_a,
                              all_addr, all_len, own_addr, own_len,
                              ban_addr, ban_len, out_f, out_i);
    };
    if (n_threads <= 1 || n_pairs < 4) {
        run(0, 1);
        return;
    }
    int64_t nt = std::min(n_threads, n_pairs);
    std::vector<std::thread> threads;
    threads.reserve((size_t)nt);
    for (int64_t t = 0; t < nt; t++)
        threads.emplace_back(run, t, nt);
    for (auto& th : threads) th.join();
}

static void fastrand_indices_impl(int64_t n_calls, uint64_t below,
                                  uint64_t seed, uint64_t* out) {
    uint64_t s = seed;
    const uint64_t t = below ? (uint64_t)(-(int64_t)below) % below : 0;
    for (int64_t j = 0; j < n_calls; j++) {
        uint64_t r = wyrand_next(s);
        unsigned __int128 m = (unsigned __int128)r * below;
        uint64_t lo = (uint64_t)m, hi = (uint64_t)(m >> 64);
        if (lo < below) {
            while (lo < t) {
                r = wyrand_next(s);
                m = (unsigned __int128)r * below;
                lo = (uint64_t)m;
                hi = (uint64_t)(m >> 64);
            }
        }
        out[j] = hi;
    }
}

void fastrand_indices(int64_t n_calls, uint64_t below, uint64_t seed,
                      uint64_t* out) {
    fastrand_indices_impl(n_calls, below, seed, out);
}

}  // extern "C"
