// gnntf_tpu native runtime ops (C ABI for ctypes).
//
// Host-side hot paths that feed the TPU: negative edge sampling for link
// prediction (the reference's per-candidate Python rejection loop,
// reference gnntf/core/gnn/graph_predictor.py:84-94, is the CPU bottleneck
// flagged in SURVEY §3.5) and radix argsort of edge lists (replaces
// np.lexsort in graph construction).
//
// Build: make -C native   (produces libgnntf_native.so)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// splitmix64 — tiny, fast, statistically solid for sampling.
static inline uint64_t splitmix64(uint64_t &state) {
  uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

static inline uint64_t edge_key(int64_t u, int64_t v) {
  return (static_cast<uint64_t>(u) << 32) | static_cast<uint32_t>(v);
}

// Binary search over the sorted edge-hash array.
static inline bool has_edge(const uint64_t *hashes, int64_t n, uint64_t key) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (hashes[mid] < key) lo = mid + 1; else hi = mid;
  }
  return lo < n && hashes[lo] == key;
}

// Fill the negative slots of an interleaved (1+samples)*P x 2 edge array.
// edges layout per positive p: row (u,v) then `samples` rows (u, _).
// Negatives are drawn uniformly from neg_nodes, rejecting self loops,
// the paired positive v, and members of the (symmetrized, sorted) edge set.
// Returns 0 on success, -1 if rejection failed to terminate (degenerate
// graphs where a node is adjacent to every candidate — caller falls back).
int64_t gnntf_negative_sample(
    const int64_t *pos_edges, int64_t n_pos,
    const int64_t *neg_nodes, int64_t n_neg,
    const uint64_t *edge_hashes, int64_t n_hashes,
    int64_t samples, uint64_t seed, int64_t *edges_out) {
  if (n_neg <= 0) return -1;
  uint64_t state = seed * 0x9e3779b97f4a7c15ULL + 1;
  int64_t i = 0;
  const int64_t max_tries = 64 + 16 * (n_hashes / (n_neg > 0 ? n_neg : 1) + 1);
  for (int64_t p = 0; p < n_pos; ++p) {
    const int64_t u = pos_edges[2 * p];
    const int64_t v = pos_edges[2 * p + 1];
    edges_out[2 * i] = u;
    edges_out[2 * i + 1] = v;
    ++i;
    for (int64_t s = 0; s < samples; ++s) {
      int64_t vneg = -1;
      int64_t tries = 0;
      for (;;) {
        vneg = neg_nodes[splitmix64(state) % static_cast<uint64_t>(n_neg)];
        if (vneg != u && vneg != v &&
            !has_edge(edge_hashes, n_hashes, edge_key(u, vneg)))
          break;
        if (++tries > max_tries) return -1;
      }
      edges_out[2 * i] = u;
      edges_out[2 * i + 1] = vneg;
      ++i;
    }
  }
  return 0;
}

// Stable radix argsort of (row, col) pairs: order_out such that
// (row[order], col[order]) is lexicographically sorted.  11-bit LSD passes
// over col then row.  int32 keys assumed non-negative.
void gnntf_lexsort_edges(const int32_t *row, const int32_t *col,
                         int64_t e, int64_t *order_out) {
  std::vector<int64_t> order(e), tmp(e);
  for (int64_t i = 0; i < e; ++i) order[i] = i;
  constexpr int BITS = 11;
  constexpr int BUCKETS = 1 << BITS;
  int64_t count[BUCKETS];
  const int32_t *keys[2] = {col, row};  // minor first
  for (int k = 0; k < 2; ++k) {
    const int32_t *key = keys[k];
    int32_t maxv = 0;
    for (int64_t i = 0; i < e; ++i) maxv = std::max(maxv, key[i]);
    for (int shift = 0; (maxv >> shift) != 0 || shift == 0; shift += BITS) {
      std::memset(count, 0, sizeof(count));
      for (int64_t i = 0; i < e; ++i)
        ++count[(key[order[i]] >> shift) & (BUCKETS - 1)];
      int64_t sum = 0;
      for (int b = 0; b < BUCKETS; ++b) {
        int64_t c = count[b];
        count[b] = sum;
        sum += c;
      }
      for (int64_t i = 0; i < e; ++i)
        tmp[count[(key[order[i]] >> shift) & (BUCKETS - 1)]++] = order[i];
      order.swap(tmp);
    }
  }
  std::memcpy(order_out, order.data(), sizeof(int64_t) * e);
}

// Sorted unique of uint64 keys in place; returns new length.
int64_t gnntf_sort_unique_u64(uint64_t *keys, int64_t n) {
  std::sort(keys, keys + n);
  return std::unique(keys, keys + n) - keys;
}

// Row-split ELL layout construction (see gnntf_tpu/ops/spmm.py ELLLayout):
// single O(E) counting pass, input edges in ANY order (the numpy path
// needs a stable argsort first).  Outputs:
//   idx      [V*k]  source node of each virtual-row slot, pad = n
//   slot     [E]    flat slot of edge e in the [V, k] grid (input order)
//   vrow_row [V]    real destination row of each virtual row
// V must be precomputed by the caller as sum(ceil(deg/k)); returns -1 on
// a row id out of [0, n), else 0.
int64_t gnntf_build_ell(const int32_t *row, const int32_t *col, int64_t e,
                        int64_t n, int64_t k, int64_t v,
                        int32_t *idx, int32_t *slot, int32_t *vrow_row) {
  std::vector<int64_t> deg(n, 0);
  for (int64_t i = 0; i < e; ++i) {
    const int32_t r = row[i];
    if (r < 0 || r >= n) return -1;
    ++deg[r];
  }
  // voff[r] = first virtual row of real row r; cursor[r] = edges placed so far
  std::vector<int64_t> voff(n + 1, 0);
  for (int64_t r = 0; r < n; ++r) voff[r + 1] = voff[r] + (deg[r] + k - 1) / k;
  if (voff[n] != v) return -1;
  std::fill(idx, idx + v * k, static_cast<int32_t>(n));
  for (int64_t r = 0; r < n; ++r)
    for (int64_t vr = voff[r]; vr < voff[r + 1]; ++vr)
      vrow_row[vr] = static_cast<int32_t>(r);
  std::vector<int64_t> cursor(n, 0);
  for (int64_t i = 0; i < e; ++i) {
    const int32_t r = row[i];
    const int64_t pos = cursor[r]++;
    const int64_t s = (voff[r] + pos / k) * k + pos % k;
    idx[s] = col[i];
    slot[i] = static_cast<int32_t>(s);
  }
  return 0;
}

}  // extern "C"
