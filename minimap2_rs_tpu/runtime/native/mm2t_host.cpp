// Native host runtime for minimap2_rs_tpu.
//
// The device (TPU) owns the heavy compute (sketch, lookup, anchor
// expansion, chaining DP scores); this library owns the irregular
// pointer-chasing host work the reference does in Rust:
//
//  - exact minimizer scan (reference semantics incl. emission order,
//    /root/reference/src/sketch.rs:29-100) — used for the dv estimate
//    (paf.rs:156), even-k sketching, and CPU fallbacks;
//  - chain backtracking over (f, v, prev) from the device DP
//    (lchain.rs:92-176 semantics, incl. the degenerate bk_end walk and
//    the greedy fallback);
//  - chain merge / primary-secondary selection (lchain.rs:220-314);
//  - exact reference chaining DP (lchain.rs:59-91, with the
//    max_chain_skip pruning) for CPU fallback and parity validation;
//  - PAF numeric-field construction incl. the dv estimate
//    (paf.rs:130-222).
//
// Plain C ABI; Python binds with ctypes (runtime/host.py). All 64-bit
// packed encodings match the reference bit layouts.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <sys/mman.h>
#include <cstdlib>
#include <thread>
#include <utility>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// exact minimizer scan (sketch.rs:29-100)
// ---------------------------------------------------------------------

static inline uint64_t hash64(uint64_t key, uint64_t mask) {
  key = (~key + (key << 21)) & mask;
  key = key ^ (key >> 24);
  key = (key + (key << 3) + (key << 8)) & mask;
  key = key ^ (key >> 14);
  key = (key + (key << 2) + (key << 4)) & mask;
  key = key ^ (key >> 28);
  key = (key + (key << 31)) & mask;
  return key;
}

static const uint8_t NT4[256] = {
    // 'A'/'a'->0 'C'/'c'->1 'G'/'g'->2 'T'/'t'->3 else 4
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 0, 4, 1, 4, 4, 4, 2,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 3, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 0, 4, 1, 4, 4, 4, 2, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 3, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4};

// identity table for pre-encoded nt4 codes (0..4; anything else -> 4)
static const uint8_t CODE5[256] = {
    0, 1, 2, 3, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4};

// Emits (key_span, rid_pos_strand) pairs into out (capacity cap).
// Returns the number of records (may exceed cap; caller re-calls with a
// bigger buffer — records beyond cap are discarded, not written).
// `tbl` maps input bytes to nt4 codes (NT4 for ASCII, CODE5 for codes).
static int64_t sketch_impl(const uint8_t* tbl, const uint8_t* seq,
                           int64_t n, int32_t w, int32_t k, uint32_t rid,
                           int32_t is_hpc, uint64_t* out, int64_t cap,
                           int emit_final);

int64_t mm2t_sketch(const uint8_t* seq, int64_t n, int32_t w, int32_t k,
                    uint32_t rid, int32_t is_hpc, uint64_t* out,
                    int64_t cap) {
  return sketch_impl(NT4, seq, n, w, k, rid, is_hpc, out, cap, 1);
}

// Core scan with a compile-time emitter: emit(x, y) is called for every
// record in exact reference emission order (sketch.rs:29-100). The
// index build emits straight into its output arena (no staging buffer);
// sketch_impl wraps this with a capacity-counting writer.
// (extern "C++": templates cannot carry C language linkage.)
extern "C++" {
template <class Emit>
static void sketch_scan(const uint8_t* tbl, const uint8_t* seq,
                        int64_t n, int32_t w, int32_t k, uint32_t rid,
                        int32_t is_hpc, int emit_final, Emit&& emit) {
  const uint64_t shift1 = 2 * (uint64_t)(k - 1);
  const uint64_t mask = (~0ULL) >> (64 - 2 * k);
  uint64_t kmer[2] = {0, 0};
  int32_t l = 0, buf_pos = 0, min_pos = 0, kmer_span = 0;
  struct Info {
    uint64_t x, y;
  };
  std::vector<Info> buf(w, {~0ULL, ~0ULL});
  Info mn = {~0ULL, ~0ULL};
  int32_t tq[32];
  int tq_front = 0, tq_count = 0;
  auto push = [&](Info v) { emit(v.x, v.y); };
  for (int64_t i = 0; i < n; ++i) {
    int c = tbl[seq[i]];
    Info info = {~0ULL, ~0ULL};
    if (c < 4) {
      if (is_hpc) {
        int64_t skip_len = 1;
        if (i + 1 < n && tbl[seq[i + 1]] == c) {
          int64_t t = i + 2;
          while (t < n && tbl[seq[t]] == c) t++;
          skip_len = t - i;
        }
        tq[(tq_count + tq_front) & 0x1f] = (int32_t)skip_len;
        tq_count++;
        kmer_span += (int32_t)skip_len;
        if (tq_count > k) {
          kmer_span -= tq[tq_front];
          tq_front = (tq_front + 1) & 0x1f;
          tq_count--;
        }
      } else {
        kmer_span = l + 1 < k ? l + 1 : k;
      }
      kmer[0] = ((kmer[0] << 2) | (uint64_t)c) & mask;
      kmer[1] = (kmer[1] >> 2) | (((uint64_t)(3 ^ c)) << shift1);
      if (kmer[0] != kmer[1]) {
        int z = kmer[0] < kmer[1] ? 0 : 1;
        ++l;
        if (l >= k && kmer_span < 256) {
          info.x = (hash64(kmer[z], mask) << 8) | (uint64_t)kmer_span;
          info.y = ((uint64_t)rid << 32) | ((uint64_t)i << 1) | (uint64_t)z;
        }
      }
    } else {
      l = 0;
      tq_front = tq_count = 0;
      kmer_span = 0;
    }
    buf[buf_pos] = info;
    if (l == w + k - 1 && mn.x != ~0ULL) {
      for (int j = buf_pos + 1; j < w; ++j)
        if (mn.x == buf[j].x && buf[j].y != mn.y) push(buf[j]);
      for (int j = 0; j < buf_pos; ++j)
        if (mn.x == buf[j].x && buf[j].y != mn.y) push(buf[j]);
    }
    if (info.x <= mn.x) {
      if (l >= w + k && mn.x != ~0ULL) push(mn);
      mn = info;
      min_pos = buf_pos;
    } else if (buf_pos == min_pos) {
      if (l >= w + k - 1 && mn.x != ~0ULL) push(mn);
      mn = {~0ULL, ~0ULL};
      for (int j = buf_pos + 1; j < w; ++j)
        if (mn.x >= buf[j].x) { mn = buf[j]; min_pos = j; }
      for (int j = 0; j <= buf_pos; ++j)
        if (mn.x >= buf[j].x) { mn = buf[j]; min_pos = j; }
      if (l >= w + k - 1 && mn.x != ~0ULL) {
        for (int j = buf_pos + 1; j < w; ++j)
          if (mn.x == buf[j].x && mn.y != buf[j].y) push(buf[j]);
        for (int j = 0; j <= buf_pos; ++j)
          if (mn.x == buf[j].x && mn.y != buf[j].y) push(buf[j]);
      }
    }
    if (++buf_pos == w) buf_pos = 0;
  }
  // the sequence-end flush (sketch.rs:99) — suppressed for interior
  // chunks of the threaded index build (mm2t_build_pairs below)
  if (emit_final && mn.x != ~0ULL) push(mn);
}
}  // extern "C++"

static int64_t sketch_impl(const uint8_t* tbl, const uint8_t* seq,
                           int64_t n, int32_t w, int32_t k, uint32_t rid,
                           int32_t is_hpc, uint64_t* out, int64_t cap,
                           int emit_final) {
  if (n <= 0 || w <= 0 || w >= 256 || k <= 0 || k > 28) return -1;
  int64_t n_out = 0;
  sketch_scan(tbl, seq, n, w, k, rid, is_hpc, emit_final,
              [&](uint64_t x, uint64_t y) {
                if (n_out < cap) {
                  out[2 * n_out] = x;
                  out[2 * n_out + 1] = y;
                }
                n_out++;
              });
  return n_out;
}

// ---------------------------------------------------------------------
// chaining: exact reference DP (lchain.rs:59-91) — CPU fallback path
// ---------------------------------------------------------------------

struct ChainParamsC {
  int32_t max_dist_x, max_dist_y, bw, max_chain_iter, min_chain_score,
      min_cnt, max_chain_skip, max_drop;
  float chn_pen_gap, chn_pen_skip;
  int32_t rmq_rescue_size;  // lchain.rs:50
  float rmq_rescue_ratio;   // lchain.rs:51
};

static inline int32_t qpos_of(uint64_t y) { return (int32_t)(y & 0xffffffff); }
static inline int32_t qspan_of(uint64_t y) {
  return (int32_t)((y >> 32) & 0xff);
}
static inline int32_t rpos_of(uint64_t x) { return (int32_t)(x & 0xffffffff); }
static inline int rev_of(uint64_t x) { return (int)(x >> 63); }
static inline int32_t rid_of(uint64_t x) {
  return (int32_t)((x >> 32) & 0x7fffffff);
}

static inline float mg_log2f(int32_t x) {
  return x <= 1 ? 0.0f : logf((float)x) / 0.6931472f;
}

// returns INT32_MIN when unchainable
static inline int32_t comput_sc(uint64_t xi, uint64_t yi, uint64_t xj,
                                uint64_t yj, int32_t mdx, int32_t mdy,
                                int32_t bw, float pg, float ps) {
  int32_t dq = qpos_of(yi) - qpos_of(yj);
  if (dq <= 0 || dq > mdx) return INT32_MIN;
  int32_t dr = rpos_of(xi) - rpos_of(xj);
  if (dr == 0 || dq > mdy) return INT32_MIN;
  int32_t dd = dr > dq ? dr - dq : dq - dr;
  if (dd > bw) return INT32_MIN;
  int32_t dg = dr < dq ? dr : dq;
  int32_t q_span = qspan_of(yj);
  int32_t sc = q_span < dg ? q_span : dg;
  if (dd != 0 || dg > q_span) {
    float lin = pg * (float)dd + ps * (float)dg;
    float logp = dd >= 1 ? mg_log2f(dd + 1) : 0.0f;
    sc -= (int32_t)(lin + 0.5f * logp);
  }
  return sc;
}

// Exact DP with the max_chain_skip heuristic. f/v/prev are outputs (n).
void mm2t_chain_dp(const uint64_t* ax, const uint64_t* ay, int64_t n,
                   const ChainParamsC* p, int32_t* f, int32_t* v,
                   int64_t* prev) {
  int32_t mdx = p->max_dist_x > p->bw ? p->max_dist_x : p->bw;
  int32_t mdy = p->max_dist_y > p->bw ? p->max_dist_y : p->bw;
  std::vector<int64_t> t(n, 0);
  int64_t st = 0;
  for (int64_t i = 0; i < n; ++i) {
    while (st < i && (rid_of(ax[st]) != rid_of(ax[i]) ||
                      rev_of(ax[st]) != rev_of(ax[i]) ||
                      rpos_of(ax[i]) > rpos_of(ax[st]) + mdx))
      ++st;
    int64_t max_j = -1;
    int32_t max_f = qspan_of(ay[i]);
    int64_t start_j = i - p->max_chain_iter > st ? i - p->max_chain_iter : st;
    int32_t n_skip = 0;
    for (int64_t j = i - 1; j >= start_j; --j) {
      if (rid_of(ax[j]) != rid_of(ax[i]) || rev_of(ax[j]) != rev_of(ax[i]))
        continue;
      int32_t sc0 = comput_sc(ax[i], ay[i], ax[j], ay[j], mdx, mdy, p->bw,
                              p->chn_pen_gap, p->chn_pen_skip);
      if (sc0 == INT32_MIN) continue;
      int32_t sc = sc0 + f[j];
      if (sc > max_f) {
        max_f = sc;
        max_j = j;
        if (n_skip > 0) --n_skip;
      } else if (t[j] == i) {
        if (++n_skip > p->max_chain_skip) break;
      }
      if (prev[j] >= 0) t[prev[j]] = i;
    }
    f[i] = max_f;
    prev[i] = max_j;
    v[i] = (max_j >= 0 && v[max_j] > max_f) ? v[max_j] : max_f;
  }
}

// ---------------------------------------------------------------------
// backtracking (lchain.rs:92-176) from (f, v, prev)
// ---------------------------------------------------------------------

struct Chain {
  std::vector<int64_t> idx;
  int32_t score;
};

// Backtracking core (lchain.rs:92-176): returns chains sorted by
// (score desc, qstart, tstart).
static std::vector<Chain> backtrack_chains(const uint64_t* ax,
                                           const uint64_t* ay, int64_t n,
                                           const int32_t* f, const int32_t* v,
                                           const int64_t* prev,
                                           const ChainParamsC* p);

// Chains are emitted as a flat index list plus (start, len, score) per
// chain, already sorted by (score desc, qstart, tstart).
// Returns the number of chains; flat/starts/lens/scores have caller
// capacities cap_flat / cap_chains.
int64_t mm2t_backtrack(const uint64_t* ax, const uint64_t* ay, int64_t n,
                       const int32_t* f, const int32_t* v,
                       const int64_t* prev, const ChainParamsC* p,
                       int64_t* flat, int64_t cap_flat, int64_t* starts,
                       int64_t* lens, int64_t* scores, int64_t cap_chains) {
  if (n == 0) return 0;
  std::vector<Chain> chains = backtrack_chains(ax, ay, n, f, v, prev, p);
  int64_t n_chains = 0, off = 0;
  for (const Chain& c : chains) {
    if (n_chains >= cap_chains || off + (int64_t)c.idx.size() > cap_flat) break;
    starts[n_chains] = off;
    lens[n_chains] = (int64_t)c.idx.size();
    scores[n_chains] = c.score;
    for (int64_t i : c.idx) flat[off++] = i;
    ++n_chains;
  }
  return n_chains;
}

static std::vector<Chain> backtrack_chains(const uint64_t* ax,
                                           const uint64_t* ay, int64_t n,
                                           const int32_t* f, const int32_t* v,
                                           const int64_t* prev,
                                           const ChainParamsC* p) {
  std::vector<std::pair<int32_t, int64_t>> z;
  z.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    if (f[i] > 0) z.emplace_back(f[i], i);
  if (z.empty()) return {};
  std::stable_sort(z.begin(), z.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  std::vector<int64_t> t(n, 0);
  // bk_end: the reference walk always stops after one step (it marks
  // t[i]=2 then tests t[i]==0) — see oracle/lchain.py bk_end.
  auto bk_end = [&](int64_t i0, int32_t zscore) -> int64_t {
    int64_t i = i0, end_i = -1, max_i = i0;
    int32_t max_s = 0;
    if (t[i] == 0) {
      for (;;) {
        t[i] = 2;
        end_i = prev[i];
        int32_t s = end_i < 0 ? zscore : zscore - f[end_i];
        if (s > max_s) {
          max_s = s;
          max_i = end_i;
        } else if (max_s - s > p->max_drop) {
          break;
        }
        if (!(i >= 0 && t[i] == 0 && end_i >= 0)) break;
        i = end_i;
      }
      int64_t ii = i0;
      while (ii >= 0 && ii != end_i) {
        t[ii] = 0;
        ii = prev[ii];
      }
    }
    return max_i;
  };

  std::vector<Chain> chains;
  // the reference runs a counting pass then a fill pass with identical
  // logic (lchain.rs:100-160); a single pass is equivalent
  for (int64_t kk = (int64_t)z.size() - 1; kk >= 0; --kk) {
    int64_t i0 = z[kk].second;
    if (t[i0] != 0) continue;
    int64_t end_i = bk_end(i0, z[kk].first);
    std::vector<int64_t> idxs;
    int64_t i = i0;
    while (i >= 0 && i != end_i) {
      idxs.push_back(i);
      t[i] = 1;
      i = prev[i];
    }
    int32_t sc = i < 0 ? z[kk].first : z[kk].first - f[i];
    if (sc >= p->min_chain_score && (int64_t)idxs.size() >= p->min_cnt) {
      std::reverse(idxs.begin(), idxs.end());
      chains.push_back({std::move(idxs), sc});
    }
  }
  if (chains.empty()) {
    // greedy fallback (lchain.rs:161-173); Rust's max_by_key returns the
    // LAST maximal element on ties, and v[best] == max f along the path
    // (lchain.rs:90), so v is not needed at all.
    int64_t best_i = 0;
    for (int64_t i = 1; i < n; ++i)
      if (f[i] >= f[best_i]) best_i = i;
    std::vector<int64_t> idxs;
    int32_t vmax = INT32_MIN;
    int64_t i = best_i;
    while (i >= 0) {
      idxs.push_back(i);
      if (f[i] > vmax) vmax = f[i];
      i = prev[i];
    }
    std::reverse(idxs.begin(), idxs.end());
    if (!idxs.empty()) chains.push_back({std::move(idxs), vmax});
  }
  // stable sort by (score desc, qstart, tstart) (lchain.rs:202-218)
  auto qstart = [&](const Chain& c) {
    int32_t qs = INT32_MAX;
    for (int64_t i : c.idx) {
      int32_t s = qpos_of(ay[i]) - (qspan_of(ay[i]) - 1);
      if (s < qs) qs = s;
    }
    return qs < 0 ? 0 : qs;
  };
  auto tstart = [&](const Chain& c) {
    int32_t ts = INT32_MAX;
    for (int64_t i : c.idx) {
      int32_t s = rpos_of(ax[i]) - (qspan_of(ay[i]) - 1);
      if (s < ts) ts = s;
    }
    return ts < 0 ? 0 : ts;
  };
  std::vector<int64_t> ord(chains.size());
  for (size_t i = 0; i < ord.size(); ++i) ord[i] = (int64_t)i;
  std::stable_sort(ord.begin(), ord.end(), [&](int64_t a, int64_t b) {
    if (chains[a].score != chains[b].score)
      return chains[a].score > chains[b].score;
    int32_t qa = qstart(chains[a]), qb = qstart(chains[b]);
    if (qa != qb) return qa < qb;
    return tstart(chains[a]) < tstart(chains[b]);
  });
  std::vector<Chain> sorted;
  sorted.reserve(chains.size());
  for (int64_t oi : ord) sorted.push_back(std::move(chains[oi]));
  return sorted;
}

// ---------------------------------------------------------------------
// full host postprocess: backtrack + merge + select + PAF fields + dv
// (main.rs:209-218 pipeline tail, paf.rs:130-222)
// ---------------------------------------------------------------------

static void chain_qrange(const uint64_t* ay, const Chain& c, int32_t* qs,
                         int32_t* qe) {
  int32_t s = INT32_MAX, e = -1;
  for (int64_t i : c.idx) {
    int32_t a = qpos_of(ay[i]) - (qspan_of(ay[i]) - 1);
    int32_t b = qpos_of(ay[i]) + 1;
    if (a < s) s = a;
    if (b > e) e = b;
  }
  *qs = s < 0 ? 0 : s;
  *qe = e;
}

static void chain_trange(const uint64_t* ax, const uint64_t* ay,
                         const Chain& c, int32_t* ts, int32_t* te) {
  int32_t s = INT32_MAX, e = -1;
  for (int64_t i : c.idx) {
    int32_t a = rpos_of(ax[i]) - (qspan_of(ay[i]) - 1);
    int32_t b = rpos_of(ax[i]) + 1;
    if (a < s) s = a;
    if (b > e) e = b;
  }
  *ts = s < 0 ? 0 : s;
  *te = e;
}

// Rust core::slice::binary_search_by on a possibly imperfectly sorted
// array (the reference calls it on emission-order positions, paf.rs:178).
static int64_t rust_binary_search(const int32_t* arr, int64_t n,
                                  int32_t target) {
  int64_t size = n, left = 0, right = n;
  while (left < right) {
    int64_t mid = left + size / 2;
    int32_t vv = arr[mid];
    if (vv < target)
      left = mid + 1;
    else if (vv > target)
      right = mid;
    else
      return mid;
    size = right - left;
  }
  return -1;
}

// Per-record output fields (int64): qs,qe,ts,te,cm,rid,strand(0/1),
// is_primary(0/1),score ; dv in out_dv (double holding the f32 value).
// Returns record count; sets *rescue_flag (lchain.rs:321-326).
// If skip_output is nonzero only the rescue flag is computed.
int64_t mm2t_postprocess(
    const uint64_t* ax, const uint64_t* ay, int64_t n,
    const int32_t* f, const int32_t* v, const int64_t* prev,
    const ChainParamsC* p, int32_t qlen,
    float mask_level, float pri_ratio, int64_t best_n,
    const int32_t* mini_pos, const int32_t* mini_span, int64_t n_mini,
    const int32_t* tlens, int64_t n_seq,
    int32_t skip_output, int32_t* rescue_flag,
    int64_t* out_fields, double* out_dv, int64_t max_records) {
  *rescue_flag = 0;
  if (n == 0) return 0;
  std::vector<Chain> chains = backtrack_chains(ax, ay, n, f, v, prev, p);
  if (chains.empty()) return 0;
  // rescue decision on the best chain (lchain.rs:321-326)
  {
    int32_t qs, qe;
    chain_qrange(ay, chains[0], &qs, &qe);
    int32_t cov = qe - qs > 0 ? qe - qs : 0;
    int32_t uncovered = qlen - cov > 0 ? qlen - cov : 0;
    if (uncovered > p->rmq_rescue_size ||
        (float)cov < (float)qlen * (1.0f - p->rmq_rescue_ratio))
      *rescue_flag = 1;
  }
  if (skip_output) return 0;

  // merge_adjacent_chains_with_gap(max_dist_y, max_dist_y) (main.rs:216)
  {
    std::vector<std::pair<int32_t, int64_t>> items;
    items.reserve(chains.size());
    for (size_t i = 0; i < chains.size(); ++i) {
      int32_t qs, qe;
      chain_qrange(ay, chains[i], &qs, &qe);
      items.emplace_back(qs, (int64_t)i);
    }
    std::stable_sort(items.begin(), items.end(),
                     [](const auto& a, const auto& b) { return a.first < b.first; });
    std::vector<Chain> merged;
    std::vector<int32_t> morder;  // original position of each merged head
    for (auto& it : items) {
      Chain& ch = chains[it.second];
      bool did = false;
      if (!merged.empty()) {
        Chain& last = merged.back();
        uint64_t a_last = ax[last.idx.back()];
        uint64_t a_first = ax[ch.idx.front()];
        bool same = rid_of(a_last) == rid_of(a_first) &&
                    rev_of(a_last) == rev_of(a_first);
        int32_t lqs, lqe, cqs, cqe, lts, lte, cts, cte;
        chain_qrange(ay, last, &lqs, &lqe);
        chain_qrange(ay, ch, &cqs, &cqe);
        chain_trange(ax, ay, last, &lts, &lte);
        chain_trange(ax, ay, ch, &cts, &cte);
        int32_t q_gap = cqs - lqe, t_gap = cts - lte;
        int32_t mg = p->max_dist_y;
        if (same && q_gap >= 0 && t_gap >= 0 && q_gap <= mg && t_gap <= mg) {
          last.idx.insert(last.idx.end(), ch.idx.begin(), ch.idx.end());
          did = true;
        }
      }
      if (!did) merged.push_back(ch);
    }
    // reference pairs merged chains with the pre-merge scores by list
    // position (main.rs:217, sort_chains_stable)
    for (size_t i = 0; i < merged.size(); ++i) merged[i].score = chains[i].score;
    (void)morder;
    chains = std::move(merged);
  }

  // sort_chains_stable + select_and_filter (lchain.rs:202-260)
  {
    std::vector<int64_t> ord(chains.size());
    for (size_t i = 0; i < ord.size(); ++i) ord[i] = (int64_t)i;
    auto qstart2 = [&](const Chain& c) {
      int32_t qs, qe;
      chain_qrange(ay, c, &qs, &qe);
      return qs;
    };
    auto tstart2 = [&](const Chain& c) {
      int32_t ts, te;
      chain_trange(ax, ay, c, &ts, &te);
      return ts;
    };
    std::stable_sort(ord.begin(), ord.end(), [&](int64_t a, int64_t b) {
      if (chains[a].score != chains[b].score)
        return chains[a].score > chains[b].score;
      int32_t qa = qstart2(chains[a]), qb = qstart2(chains[b]);
      if (qa != qb) return qa < qb;
      return tstart2(chains[a]) < tstart2(chains[b]);
    });
    std::vector<Chain> sorted;
    sorted.reserve(chains.size());
    for (int64_t oi : ord) sorted.push_back(std::move(chains[oi]));
    chains = std::move(sorted);
  }
  std::vector<char> is_primary(chains.size(), 1);
  {
    std::vector<std::pair<int32_t, int32_t>> primaries;
    for (size_t ci = 0; ci < chains.size(); ++ci) {
      int32_t qs, qe;
      chain_qrange(ay, chains[ci], &qs, &qe);
      bool overlapped = false;
      for (auto& pr : primaries) {
        int32_t ov_i = std::min(qe, pr.second) - std::max(qs, pr.first);
        float ov = (float)(ov_i > 0 ? ov_i : 0);
        float len = (float)std::max(qe - qs, 1);
        if (ov / len >= mask_level) {
          overlapped = true;
          break;
        }
      }
      if (overlapped)
        is_primary[ci] = 0;
      else
        primaries.emplace_back(qs, qe);
    }
  }
  std::vector<int64_t> keep;
  int32_t s1 = chains[0].score, s2 = 0;
  {
    int64_t sec_kept = 0;
    for (size_t i = 0; i < chains.size(); ++i) {
      if (i == 0) {
        keep.push_back(0);
        continue;
      }
      if (!is_primary[i]) continue;
      if ((float)chains[i].score >= pri_ratio * (float)s1) {
        if (sec_kept < best_n) {
          keep.push_back((int64_t)i);
          sec_kept++;
        }
      }
      if (s2 == 0) s2 = chains[i].score;
    }
  }

  // dv prep (paf.rs:156-163)
  float avg_k;
  {
    int64_t sum_k = 0;
    for (int64_t i = 0; i < n_mini; ++i) sum_k += mini_span[i];
    avg_k = n_mini ? (float)sum_k / (float)n_mini : 0.0f;
  }

  int64_t n_rec = 0;
  for (size_t oi = 0; oi < keep.size() && n_rec < max_records; ++oi) {
    const Chain& c = chains[keep[oi]];
    if (c.idx.empty()) continue;
    int strand_rev = rev_of(ax[c.idx.front()]);
    int32_t qs, qe, ts, te;
    chain_qrange(ay, c, &qs, &qe);
    chain_trange(ax, ay, c, &ts, &te);
    int32_t rid = rid_of(ax[c.idx.front()]);
    int32_t tlen = (rid >= 0 && rid < n_seq) ? tlens[rid] : 0;

    // dv estimate (paf.rs:156-199) — uses raw emission-order mini_pos
    float dv = 0.0f;
    if (n_mini > 0) {
      int64_t nch = (int64_t)c.idx.size();
      auto qpos_fwd = [&](int64_t ci) {
        int64_t i = c.idx[strand_rev ? (nch - 1 - ci) : ci];
        int32_t qp = qpos_of(ay[i]);
        int32_t sp = qspan_of(ay[i]);
        return rev_of(ax[i]) ? (qlen - 1 - (qp + 1 - sp)) : qp;
      };
      int32_t first = qpos_fwd(0);
      int64_t st = rust_binary_search(mini_pos, n_mini, first);
      if (st >= 0) {
        while (st > 0 && mini_pos[st - 1] == first) --st;
        int64_t j = st, en = st, kk = 1;
        int32_t n_match = 1;
        while (j + 1 < n_mini && kk < nch) {
          ++j;
          if (mini_pos[j] == qpos_fwd(kk)) {
            ++n_match;
            en = j;
            ++kk;
          }
        }
        int32_t n_tot = (int32_t)(en - st) + 1;
        int32_t r_qs = strand_rev ? qlen - qe : qs;
        int32_t r_qe = strand_rev ? qlen - qs : qe;
        if (r_qs > (int32_t)avg_k && ts > (int32_t)avg_k) ++n_tot;
        if ((qlen - r_qe) > (int32_t)avg_k && (tlen - te) > (int32_t)avg_k)
          ++n_tot;
        float frac = (float)n_match / (float)n_tot;
        float ak = avg_k >= 1.0f ? avg_k : 1.0f;
        dv = frac >= 1.0f ? 0.0f : 1.0f - powf(frac, 1.0f / ak);
      }
    }

    int64_t* o = out_fields + 9 * n_rec;
    o[0] = qs;
    o[1] = qe;
    o[2] = ts;
    o[3] = te;
    o[4] = (int64_t)c.idx.size();  // cm
    o[5] = rid;
    o[6] = strand_rev;
    o[7] = (oi == 0) ? 1 : 0;
    o[8] = c.score;
    out_dv[n_rec] = (double)dv;
    ++n_rec;
  }
  // stash s1/s2 in the slot after the last record when there is room
  if (n_rec < max_records) {
    int64_t* o = out_fields + 9 * n_rec;
    o[0] = s1 > 0 ? s1 : 0;
    o[1] = s2 > 0 ? s2 : 0;
  }
  return n_rec;
}

// ---------------------------------------------------------------------
// batch read encoding: raw ASCII -> 4-bit-packed nt4 nibble rows
// ---------------------------------------------------------------------

// seqs: B pointers to read bytes with lengths lens[i] (<= 2*Lpack).
// out (B, Lpack) is filled with 0x44 (two nt4=4 padding nibbles) and the
// read's codes packed low-nibble-first — the wire format _unpack_codes4
// (models/mapper.py) expands on device.
void mm2t_encode_pack4(const uint8_t* const* seqs, const int64_t* lens,
                       int64_t B, int64_t Lpack, uint8_t* out) {
  for (int64_t i = 0; i < B; i++) {
    uint8_t* row = out + i * Lpack;
    memset(row, 0x44, Lpack);
    const uint8_t* s = seqs[i];
    int64_t n = lens[i];
    int64_t j = 0;
    for (; j + 1 < n; j += 2)
      row[j >> 1] = (uint8_t)(NT4[s[j]] | (NT4[s[j + 1]] << 4));
    if (j < n) row[j >> 1] = (uint8_t)(NT4[s[j]] | 0x40);
  }
}

// 2-bit wire: 4 codes per byte (low pair first), ambiguous bases (nt4
// code 4, i.e. N) recorded as flat exceptions i*4*Lpack2 + j that the
// device scatters back to 4 after unpacking (stages.unpack_codes2);
// positions past each read's length are masked to 4 on device from
// `lengths`, so padding costs no exceptions. Returns the exception
// count; if it exceeds nex_cap the caller must fall back to the 4-bit
// wire (out/out_nex contents are then unspecified). Halves H2D bytes —
// the host->TPU relay is the headline pass's largest wire cost.
int64_t mm2t_encode_pack2(const uint8_t* const* seqs, const int64_t* lens,
                          int64_t B, int64_t Lpack2, uint8_t* out,
                          int32_t* out_nex, int64_t nex_cap) {
  const int64_t L = 4 * Lpack2;
  int64_t n_ex = 0;
  for (int64_t i = 0; i < B; i++) {
    uint8_t* row = out + i * Lpack2;
    memset(row, 0, Lpack2);
    const uint8_t* s = seqs[i];
    const int64_t n = lens[i];
    for (int64_t j = 0; j < n; j++) {
      const uint8_t c = NT4[s[j]];
      if (c >= 4) {
        if (n_ex >= nex_cap) return n_ex + 1;
        out_nex[n_ex++] = (int32_t)(i * L + j);
      } else {
        row[j >> 2] |= (uint8_t)(c << ((j & 3) * 2));
      }
    }
  }
  return n_ex;
}

// ---------------------------------------------------------------------
// batch PAF formatting for the lite device path
// (mirrors models/mapper.py _postprocess_lite's f-string exactly)
// ---------------------------------------------------------------------

static inline char* put_i64(char* p, int64_t v) {
  if (v < 0) { *p++ = '-'; v = -v; }
  char tmp[20];
  int n = 0;
  do { tmp[n++] = (char)('0' + v % 10); v /= 10; } while (v);
  while (n) *p++ = tmp[--n];
  return p;
}

// fields: (B, F) row-major int32 per the lite FIELDS layout; col gives
// the indices of [qs, qe, ts, te, grp, score, cm, n_anchors, mini_ovf,
// anc_ovf, win_ovf] within a row. Rows with any overflow flag or zero
// anchors produce no line (line_off[i+1] == line_off[i]); the caller
// routes them to the fallback tiers. Returns total bytes, or -1 when
// out_cap would be exceeded.
int64_t mm2t_format_lite(
    const int32_t* fields, int64_t B, int32_t F, const float* dv,
    const int32_t* qlens, const uint8_t* qname_blob, const int64_t* qname_off,
    const uint8_t* tname_blob, const int64_t* tname_off, const int32_t* tlens,
    int32_t mapq, const int32_t* col, uint8_t* out, int64_t out_cap,
    int64_t* line_off) {
  const int32_t c_qs = col[0], c_qe = col[1], c_ts = col[2], c_te = col[3],
                c_grp = col[4], c_score = col[5], c_cm = col[6],
                c_na = col[7], c_movf = col[8], c_aovf = col[9],
                c_wovf = col[10];
  int64_t pos = 0;
  line_off[0] = 0;
  for (int64_t i = 0; i < B; i++) {
    const int32_t* row = fields + i * F;
    if (row[c_movf] || row[c_aovf] || row[c_wovf] || row[c_na] == 0) {
      line_off[i + 1] = pos;
      continue;
    }
    int64_t qn_len = qname_off[i + 1] - qname_off[i];
    uint32_t grp = (uint32_t)row[c_grp];
    int rev = (int)(grp >> 31);
    int32_t rid = (int32_t)(grp & 0x7fffffff);
    int64_t tn_len = tname_off[rid + 1] - tname_off[rid];
    if (pos + qn_len + tn_len + 192 > out_cap) return -1;
    int32_t qlen = qlens[i];
    int32_t qs = row[c_qs], qe = row[c_qe];
    int32_t wqs = rev ? qlen - qe : qs;
    int32_t wqe = rev ? qlen - qs : qe;
    int32_t ts = row[c_ts], te = row[c_te];
    int32_t s1 = row[c_score] > 0 ? row[c_score] : 0;
    char* p = (char*)out + pos;
    memcpy(p, qname_blob + qname_off[i], qn_len); p += qn_len;
    *p++ = '\t'; p = put_i64(p, qlen);
    *p++ = '\t'; p = put_i64(p, wqs);
    *p++ = '\t'; p = put_i64(p, wqe);
    *p++ = '\t'; *p++ = rev ? '-' : '+';
    *p++ = '\t'; memcpy(p, tname_blob + tname_off[rid], tn_len); p += tn_len;
    *p++ = '\t'; p = put_i64(p, tlens[rid]);
    *p++ = '\t'; p = put_i64(p, ts);
    *p++ = '\t'; p = put_i64(p, te);
    *p++ = '\t'; p = put_i64(p, qe - qs > 0 ? qe - qs : 0);
    *p++ = '\t'; p = put_i64(p, te - ts > 0 ? te - ts : 0);
    *p++ = '\t'; p = put_i64(p, mapq);
    memcpy(p, "\ttp:A:P\tcm:i:", 13); p += 13;
    p = put_i64(p, row[c_cm]);
    memcpy(p, "\ts1:i:", 6); p += 6;
    p = put_i64(p, s1);
    memcpy(p, "\ts2:i:0\tdv:f:", 13); p += 13;
    p += snprintf(p, 16, "%.4f", (double)dv[i]);
    memcpy(p, "\trl:i:0", 7); p += 7;
    pos = (int64_t)((uint8_t*)p - out);
    line_off[i + 1] = pos;
  }
  return pos;
}

// ---------------------------------------------------------------------
// independent MMI\x02 cross-check (layout transcribed from
// /root/reference/src/index.rs:361-424, the loader; writer 233-307).
//
// Parses an .mmi byte stream with a SEPARATE transcription of the
// format (independent of the Python writer in oracle/index.py), then
// re-sketches the embedded 4-bit packed sequences with the independent
// exact scan above and verifies the hash-table's (minimizer, position)
// set equals the sketch-derived set. A transcription error in either
// the Python serializer or the Python sketch oracle fails this check
// unless the same error was made twice in two languages.
// ---------------------------------------------------------------------

static const char CODE2ASCII[5] = {'A', 'C', 'G', 'T', 'N'};

// 0 = ok; negative = which stage failed:
//  -1 bad magic / truncated header   -2 invalid header fields
//  -3 sequence section truncated     -4 bucket section malformed
//  -5 packed-seq tail size mismatch  -6 minimizer-set size mismatch
//  -7 minimizer-set content mismatch -8 key exceeds the 2k-bit range
int64_t mm2t_mmi_selfcheck(const uint8_t* data, int64_t len) {
  int64_t off = 0;
  auto need = [&](int64_t nb) { return off + nb <= len; };
  if (!need(4) || memcmp(data, "MMI\x02", 4) != 0) return -1;
  off = 4;
  if (!need(20)) return -1;
  uint32_t hdr[5];
  memcpy(hdr, data + off, 20);
  off += 20;
  const uint32_t w = hdr[0], k = hdr[1], b = hdr[2], n_seq = hdr[3],
                 flag = hdr[4];
  if (w == 0 || w >= 256 || k == 0 || k > 28 || b > 31) return -2;
  std::vector<uint64_t> seq_off(n_seq + 1, 0);
  for (uint32_t s = 0; s < n_seq; ++s) {
    if (!need(1)) return -3;
    uint8_t nl = data[off++];
    if (!need((int64_t)nl + 4)) return -3;
    off += nl;
    uint32_t ln;
    memcpy(&ln, data + off, 4);
    off += 4;
    seq_off[s + 1] = seq_off[s] + ln;
  }
  const uint64_t sum_len = seq_off[n_seq];

  std::vector<std::pair<uint64_t, uint64_t>> from_table;
  const uint64_t nb = 1ULL << b;
  for (uint64_t bi = 0; bi < nb; ++bi) {
    if (!need(4)) return -4;
    uint32_t n_p;
    memcpy(&n_p, data + off, 4);
    off += 4;
    if (!need((int64_t)n_p * 8)) return -4;
    const uint8_t* pbytes = data + off;
    off += (int64_t)n_p * 8;
    if (!need(4)) return -4;
    uint32_t size;
    memcpy(&size, data + off, 4);
    off += 4;
    if (!need((int64_t)size * 16)) return -4;
    for (uint32_t e = 0; e < size; ++e) {
      uint64_t key, val;
      memcpy(&key, data + off, 8);
      memcpy(&val, data + off + 8, 8);
      off += 16;
      const uint64_t minier = ((key >> 1) << b) | bi;
      if (2 * (uint64_t)k < 64 && (minier >> (2 * k)) != 0) return -8;
      if (key & 1) {  // singleton: value IS the packed position
        from_table.emplace_back(minier, val);
      } else {  // multi: value = offset<<32 | count into p
        const uint64_t cnt = val & 0xffffffffULL, p_off = val >> 32;
        if (cnt < 2 || p_off + cnt > n_p) return -4;
        for (uint64_t t = 0; t < cnt; ++t) {
          uint64_t pos;
          memcpy(&pos, pbytes + 8 * (p_off + t), 8);
          from_table.emplace_back(minier, pos);
        }
      }
    }
  }

  const int64_t words = (int64_t)((sum_len + 7) / 8);
  if (!need(words * 4)) return -5;
  const uint8_t* sb = data + off;
  off += words * 4;
  if (off != len) return -5;

  std::vector<std::pair<uint64_t, uint64_t>> from_sketch;
  std::vector<uint8_t> ascii;
  std::vector<uint64_t> recs;
  for (uint32_t s = 0; s < n_seq; ++s) {
    const uint64_t o0 = seq_off[s];
    const int64_t ln = (int64_t)(seq_off[s + 1] - o0);
    if (ln == 0) continue;
    ascii.resize(ln);
    for (int64_t i = 0; i < ln; ++i) {
      const uint64_t go = o0 + (uint64_t)i;
      uint32_t word;
      memcpy(&word, sb + 4 * (go >> 3), 4);
      const uint32_t code = (word >> ((go & 7) * 4)) & 0xF;
      ascii[i] = CODE2ASCII[code > 4 ? 4 : code];
    }
    recs.resize(2 * (size_t)ln + 16);
    int64_t nr = mm2t_sketch(ascii.data(), ln, (int32_t)w, (int32_t)k,
                             (uint32_t)s, (int32_t)(flag & 1), recs.data(),
                             (int64_t)(recs.size() / 2));
    if (nr < 0) return -2;
    if (nr > (int64_t)(recs.size() / 2)) {
      recs.resize(2 * (size_t)nr);
      nr = mm2t_sketch(ascii.data(), ln, (int32_t)w, (int32_t)k,
                       (uint32_t)s, (int32_t)(flag & 1), recs.data(), nr);
    }
    for (int64_t r = 0; r < nr; ++r)
      from_sketch.emplace_back(recs[2 * r] >> 8, recs[2 * r + 1]);
  }

  // set comparison (the exact scan may emit tied records twice; the
  // index stores each (key, position) once)
  auto dedup = [](std::vector<std::pair<uint64_t, uint64_t>>& v) {
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
  };
  dedup(from_table);
  dedup(from_sketch);
  if (from_table.size() != from_sketch.size()) return -6;
  if (!std::equal(from_table.begin(), from_table.end(), from_sketch.begin()))
    return -7;
  return 0;
}

// ---------------------------------------------------------------------
// threaded index build — the reference's rayon region
// (/root/reference/src/index.rs:442-452) as std::thread over a chunk
// plan. Input is ONE concatenated nt4-code array with per-sequence
// offsets; output is the (key = hash without the span byte,
// rid_pos_strand) pair list sorted by (key, rps) — exactly what the
// flat-array flatten consumes (oracle/index.py _flatten(presorted)).
//
// Long sequences are cut into `chunk`-base pieces with (w+k)-base halos
// and owned-range filtering, the same halo math as the device build
// (ops/index_build.py): every owned emission of the full scan happens
// by the time the window slides w positions past it, i.e. inside the
// right halo, and the sequence-end flush fires only on the last chunk.
// Set-exact for odd k (like the device build); even k and HPC disable
// intra-sequence chunking (the l-counter pause / homopolymer lookahead
// cross chunk boundaries) and parallelize over whole sequences only.
// ---------------------------------------------------------------------

// Full build: scan + cache-partitioned sort + optional 4-bit sequence
// packing (index.rs:461-465). `is_ascii` selects the input alphabet
// (raw FASTA bytes vs nt4 codes); `out_S` (may be null) receives
// ceil(total_len/8) packed u32 words.
//
// Sort design (r4): the scan emits each pair straight into one of R
// per-thread arenas bucketed by the key's TOP bits (hash64 output, so
// uniform), which replaces the LSD radix's giant random scatter — at
// 100 Mbp the 2-pass scatter walked 300 MB of 16-byte random writes
// twice and dominated the build (2.2-12 s, TLB/THP-luck dependent).
// Each range is then sorted independently IN CACHE (a few hundred KB)
// by (key, rps) and written to its final location sequentially, in
// parallel over ranges. The result is bit-identical to the reference's
// per-bucket sort_unstable + per-key position sort (index.rs:79,98):
// (key, rps) pairs are unique, so (key, rps) order is total.
//
// Returns the total pair count; pairs beyond `cap` are not written (the
// caller re-calls with a bigger buffer). Negative on invalid params.
// out_ukeys/out_starts/out_counts (all-or-none, may be null; capacity
// `cap`) receive the flattened unique-key table (oracle/index.py
// _flatten) with *out_nkeys entries — saving the NumPy pass.
// per-stage seconds of the most recent mm2t_build_index call on this
// process: [scan, pack, sort, flatten]. Single-writer (builds are
// serial per process); read via mm2t_get_build_stage_s.
static double g_build_stage_s[4] = {0, 0, 0, 0};

void mm2t_get_build_stage_s(double* out4) {
  for (int i = 0; i < 4; ++i) out4[i] = g_build_stage_s[i];
}

int64_t mm2t_build_index(
    const uint8_t* seq, const int64_t* seq_off, int64_t n_seq,
    int32_t w, int32_t k, int32_t is_hpc, int32_t is_ascii,
    int32_t n_threads, int64_t chunk,
    uint64_t* out_keys, uint64_t* out_rps, int64_t cap, uint32_t* out_S,
    uint64_t* out_ukeys, int64_t* out_starts, int64_t* out_counts,
    int64_t* out_nkeys) {
  if (w <= 0 || w >= 256 || k <= 0 || k > 28 || n_seq < 0) return -1;
  const bool timing = getenv("MM2T_TIMING") != nullptr;
  auto now = [] {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
  };
  // stage seconds of the most recent build, readable via
  // mm2t_get_build_stage_s: always recorded (4 clock reads), so a bench
  // outlier pass is attributable to a stage from the artifact alone
  for (int i = 0; i < 4; ++i) g_build_stage_s[i] = 0.0;
  double t0 = now();
  // fixed slots (scan/pack/sort/flatten) — "pack" is skipped when the
  // caller passes no S buffer, so slots are positional by name, not by
  // call order
  auto mark = [&](int slot, const char* what) {
    const double t1 = now();
    if (slot >= 0 && slot < 4) g_build_stage_s[slot] = t1 - t0;
    if (timing)
      fprintf(stderr, "[mm2t_build_index] %-8s %.3fs\n", what, t1 - t0);
    t0 = t1;
  };
  if (n_threads < 1) n_threads = 1;
  if (chunk < 4 * (int64_t)(w + k)) chunk = 1 << 22;
  const uint8_t* tbl = is_ascii ? NT4 : CODE5;
  const int64_t halo = w + k;
  const bool splittable = (k % 2 == 1) && !is_hpc;
  const int64_t total_len = n_seq ? seq_off[n_seq] : 0;

  struct Piece {
    int64_t rid, start, own0, own_len, content;
    int emit_final;
  };
  std::vector<Piece> plan;
  for (int64_t s = 0; s < n_seq; ++s) {
    const int64_t L = seq_off[s + 1] - seq_off[s];
    if (L <= 0) continue;
    const int64_t step = splittable ? chunk : L;
    for (int64_t pos = 0; pos < L; pos += step) {
      const int64_t own_len = std::min(step, L - pos);
      const int64_t left = std::min(halo, pos);
      const bool last = pos + own_len >= L;
      const int64_t right = last ? 0 : std::min(halo, L - (pos + own_len));
      plan.push_back({s, seq_off[s] + pos - left, left, own_len,
                      left + own_len + right, last ? 1 : 0});
    }
  }

  // key-range partitioning: R ranges over the key's top bits (hash64
  // keys are uniform), sized so one range sorts inside L2
  using Pair = std::pair<uint64_t, uint64_t>;
  const int key_bits = 2 * k;
  const double exp_pairs = total_len * 2.0 / (w + 1) + 1.0;
  int rb = 0;
  while ((1 << rb) < (int)std::min(exp_pairs / 32768.0, 2048.0)) ++rb;
  if (rb > key_bits) rb = key_bits;
  const int R = 1 << rb;
  const int rshift = key_bits - rb;

  // ---- phase 1: threaded scan, direct emission into per-(thread,
  // range) arenas — the partition pass rides the scan for free
  std::atomic<int64_t> next(0);
  std::vector<std::vector<std::vector<Pair>>> parts(
      n_threads, std::vector<std::vector<Pair>>(R));
  auto worker = [&](int t) {
    auto& out = parts[t];
    // ~2/(w+1) emissions per base split over R ranges, plus slack
    const size_t per = (size_t)(exp_pairs / n_threads / R * 1.3) + 16;
    for (auto& v : out) v.reserve(per);
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= (int64_t)plan.size()) break;
      const Piece& p = plan[i];
      const uint64_t own_lo = (uint64_t)p.own0;
      const uint64_t own_hi = (uint64_t)(p.own0 + p.own_len);
      // local -> sequence coordinates: local position 0 is global
      // (p.start), whose in-sequence coordinate is start - seq_off[rid]
      const uint64_t base = (uint64_t)(p.start - seq_off[p.rid]);
      sketch_scan(
          tbl, seq + p.start, p.content, w, k, (uint32_t)p.rid, is_hpc,
          p.emit_final, [&](uint64_t key_span, uint64_t y) {
            // position lives in the LOW 32 bits as pos<<1|strand;
            // shifting the whole word first would leak the rid's low
            // bit into bit 31
            const uint64_t pos_l = (y & 0xffffffffULL) >> 1;
            if (pos_l < own_lo || pos_l >= own_hi) return;
            const uint64_t y_g =
                (y & ~0xffffffffULL) | (((pos_l + base) << 1) | (y & 1));
            const uint64_t kk = key_span >> 8;
            out[kk >> rshift].emplace_back(kk, y_g);
          });
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker, t);
  worker(0);
  for (auto& th : threads) th.join();
  mark(0, "scan");
  // 4-bit pack AFTER the scan so the scan gets every core; the pack
  // itself splits across threads on word-aligned ranges
  if (out_S != nullptr) {
    const int64_t words = (total_len + 7) / 8;
    auto pack_range = [&](int64_t w0, int64_t w1) {
      for (int64_t wd = w0; wd < w1; ++wd) {
        uint32_t v = 0;
        const int64_t b0 = wd * 8;
        const int nb = (int)std::min<int64_t>(8, total_len - b0);
        for (int j = 0; j < nb; ++j)
          v |= (uint32_t)tbl[seq[b0 + j]] << (4 * j);
        out_S[wd] = v;
      }
    };
    std::vector<std::thread> pt;
    for (int t = 1; t < n_threads; ++t)
      pt.emplace_back(pack_range, words * t / n_threads,
                      words * (t + 1) / n_threads);
    pack_range(0, words / std::max(n_threads, 1));
    for (auto& th : pt) th.join();
    mark(1, "pack");
  }

  // ---- phase 2: per-range in-cache sort + sequential write --------
  // range r's final slot is [range_off[r], range_off[r+1]); each range
  // gathers its per-thread segments into a thread-local scratch, sorts
  // by (key, rps) — a few hundred KB, so the whole sort stays in L2 —
  // and writes out sequentially. No cross-range traffic, no scatter.
  std::vector<int64_t> range_off(R + 1, 0);
  for (int r = 0; r < R; ++r) {
    int64_t c = 0;
    for (int t = 0; t < n_threads; ++t) c += (int64_t)parts[t][r].size();
    range_off[r + 1] = range_off[r] + c;
  }
  const int64_t total = range_off[R];
  if (total > cap) return total;
  if (total == 0) {
    if (out_nkeys) *out_nkeys = 0;
    return 0;
  }
  {
    std::atomic<int> next_r(0);
    auto sort_worker = [&] {
      std::vector<Pair> scratch;
      for (;;) {
        const int r = next_r.fetch_add(1);
        if (r >= R) break;
        const int64_t n = range_off[r + 1] - range_off[r];
        if (n == 0) continue;
        scratch.clear();
        scratch.reserve(n);
        for (int t = 0; t < n_threads; ++t) {
          auto& v = parts[t][r];
          scratch.insert(scratch.end(), v.begin(), v.end());
          v.clear();
          v.shrink_to_fit();
        }
        std::sort(scratch.begin(), scratch.end());
        uint64_t* ok_ = out_keys + range_off[r];
        uint64_t* or_ = out_rps + range_off[r];
        for (int64_t i = 0; i < n; ++i) {
          ok_[i] = scratch[i].first;
          or_[i] = scratch[i].second;
        }
      }
    };
    std::vector<std::thread> st;
    for (int t = 1; t < n_threads; ++t) st.emplace_back(sort_worker);
    sort_worker();
    for (auto& th : st) th.join();
  }
  mark(2, "sort");

  // ---- phase 3: flatten unique-key runs ----------------------------
  // (key, rps) pairs are already fully sorted; this is a linear
  // run-length walk. The exact scan emits each (key, position) at most
  // once for odd k (tests/test_native_build.py fuzzes this), so no
  // dedup is needed.
  if (out_ukeys && out_starts && out_counts && out_nkeys) {
    int64_t i = 0, nk = 0;
    while (i < total) {
      int64_t j = i + 1;
      const uint64_t kk = out_keys[i];
      while (j < total && out_keys[j] == kk) ++j;
      out_ukeys[nk] = kk;
      out_starts[nk] = i;
      out_counts[nk] = j - i;
      ++nk;
      i = j;
    }
    *out_nkeys = nk;
  }
  mark(3, "flatten");
  return total;
}

// Back-compat wrapper: nt4-code input, pairs only.
int64_t mm2t_build_pairs(
    const uint8_t* codes, const int64_t* seq_off, int64_t n_seq,
    int32_t w, int32_t k, int32_t is_hpc, int32_t n_threads,
    int64_t chunk, uint64_t* out_keys, uint64_t* out_rps, int64_t cap) {
  return mm2t_build_index(codes, seq_off, n_seq, w, k, is_hpc,
                          /*is_ascii=*/0, n_threads, chunk, out_keys,
                          out_rps, cap, nullptr, nullptr, nullptr, nullptr,
                          nullptr);
}

}  // extern "C"
