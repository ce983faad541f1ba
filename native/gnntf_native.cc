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
#include <unordered_map>

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
// Returns 0 on success, -1 only if some node is adjacent to EVERY
// candidate (no valid negative exists — caller falls back).
//
// Hub robustness: a power-law hub can be adjacent to >97% of all nodes
// (measured on the ogbn-arxiv-scale bench graph), so a small try cap
// makes the whole call fail exactly on the graphs that need the C path
// most.  Random rejection therefore gets a cap high enough that failure
// is astronomically unlikely at any acceptance rate the linear probe
// couldn't serve better (p_accept 2.6% -> P(fail) ~ 1e-47 at 4096
// tries), and on exhaustion a bounded linear probe from a random start
// finds a valid candidate whenever one exists.
// Complement cache for DENSE sources (power-law hubs): a hub adjacent to
// >90% of candidates makes random rejection pay ~1/(1-frac) tries per
// draw with a ~100 ns hash probe each — the hub's hundreds of thousands
// of positives then dominate the whole call.  For sources appearing
// >= kDenseCount times, build the complement of the neighbor set over
// neg_nodes ONCE (the source's neighbors are one contiguous block of the
// sorted hash array) and draw its negatives uniformly from it in O(1).
namespace {
// complement pays off when (a) the source recurs enough to amortize the
// O(N) build and (b) its neighbor set covers enough of the candidates
// that rejection is expensive; (b) also bounds total complement memory
// (sum of neighbor sets <= 2E, so at most 2E/(n_neg/2) sources qualify)
constexpr int64_t kDenseMinCount = 64;

struct Complement {
  bool dense = false;          // neighbor set covers >= half of neg_nodes
  std::vector<int64_t> nodes;  // valid negatives (only when dense)
};

static void build_complement(int64_t u, const int64_t *neg_nodes,
                             int64_t n_neg, const uint64_t *edge_hashes,
                             int64_t n_hashes, std::vector<char> &mark,
                             int64_t mark_n, Complement &out) {
  std::fill(mark.begin(), mark.end(), 0);
  const uint64_t lo_key = static_cast<uint64_t>(u) << 32;
  // lower_bound over the sorted hashes for u's contiguous block
  int64_t lo = 0, hi = n_hashes;
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (edge_hashes[mid] < lo_key) lo = mid + 1; else hi = mid;
  }
  for (; lo < n_hashes && (edge_hashes[lo] >> 32) ==
           static_cast<uint64_t>(u); ++lo) {
    const int64_t v = static_cast<int64_t>(
        edge_hashes[lo] & 0xffffffffULL);
    if (v >= 0 && v < mark_n) mark[v] = 1;
  }
  out.nodes.clear();
  for (int64_t j = 0; j < n_neg; ++j) {
    const int64_t cand = neg_nodes[j];
    if (cand != u && (cand < 0 || cand >= mark_n || !mark[cand]))
      out.nodes.push_back(cand);
  }
}
}  // namespace

int64_t gnntf_negative_sample(
    const int64_t *pos_edges, int64_t n_pos,
    const int64_t *neg_nodes, int64_t n_neg,
    const uint64_t *edge_hashes, int64_t n_hashes,
    int64_t samples, uint64_t seed, int64_t *edges_out) {
  if (n_neg <= 0) return -1;
  uint64_t state = seed * 0x9e3779b97f4a7c15ULL + 1;
  int64_t i = 0;
  const int64_t max_tries = 4096;
  // count source multiplicity to find dense sources worth a complement
  int64_t max_node = 0;
  for (int64_t p = 0; p < n_pos; ++p)
    if (pos_edges[2 * p] > max_node) max_node = pos_edges[2 * p];
  for (int64_t j = 0; j < n_neg; ++j)
    if (neg_nodes[j] > max_node) max_node = neg_nodes[j];
  std::vector<int32_t> src_count(static_cast<size_t>(max_node) + 1, 0);
  for (int64_t p = 0; p < n_pos; ++p) ++src_count[pos_edges[2 * p]];
  std::vector<char> mark(static_cast<size_t>(max_node) + 1, 0);
  std::unordered_map<int64_t, Complement> comps;
  for (int64_t p = 0; p < n_pos; ++p) {
    const int64_t u = pos_edges[2 * p];
    const int64_t v = pos_edges[2 * p + 1];
    edges_out[2 * i] = u;
    edges_out[2 * i + 1] = v;
    ++i;
    const Complement *comp = nullptr;
    if (src_count[u] >= kDenseMinCount) {
      auto it = comps.find(u);
      if (it == comps.end()) {
        // dense test: u's neighbor block covers >= half the candidates
        const uint64_t lo_key = static_cast<uint64_t>(u) << 32;
        const uint64_t hi_key = static_cast<uint64_t>(u + 1) << 32;
        const uint64_t *b = std::lower_bound(edge_hashes,
                                             edge_hashes + n_hashes,
                                             lo_key);
        const uint64_t *e = std::lower_bound(b, edge_hashes + n_hashes,
                                             hi_key);
        Complement c;
        if ((e - b) * 2 >= n_neg) {
          c.dense = true;
          build_complement(u, neg_nodes, n_neg, edge_hashes, n_hashes,
                           mark, max_node + 1, c);
        }
        it = comps.emplace(u, std::move(c)).first;
      }
      if (it->second.dense) {
        if (it->second.nodes.empty()) return -1;  // no valid negative
        comp = &it->second;
      }
    }
    if (comp != nullptr) {
      for (int64_t s = 0; s < samples; ++s) {
        int64_t vneg;
        do {
          vneg = comp->nodes[splitmix64(state) % comp->nodes.size()];
        } while (vneg == v && comp->nodes.size() > 1);
        edges_out[2 * i] = u;
        edges_out[2 * i + 1] = vneg;
        ++i;
      }
      continue;
    }
    for (int64_t s = 0; s < samples; ++s) {
      int64_t vneg = -1;
      int64_t tries = 0;
      for (;;) {
        vneg = neg_nodes[splitmix64(state) % static_cast<uint64_t>(n_neg)];
        if (vneg != u && vneg != v &&
            !has_edge(edge_hashes, n_hashes, edge_key(u, vneg)))
          break;
        if (++tries > max_tries) {
          // linear probe from a random start: O(n_neg) worst case,
          // succeeds iff any valid candidate exists
          const uint64_t start = splitmix64(state)
              % static_cast<uint64_t>(n_neg);
          int64_t found = -1;
          for (int64_t j = 0; j < n_neg; ++j) {
            const int64_t cand =
                neg_nodes[(start + static_cast<uint64_t>(j)) % n_neg];
            if (cand != u && cand != v &&
                !has_edge(edge_hashes, n_hashes, edge_key(u, cand))) {
              found = cand;
              break;
            }
          }
          if (found < 0) return -1;
          vneg = found;
          break;
        }
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
