"""Decompose SpMM cost on the live backend: gather vs scatter vs full op,
plus candidate reformulations (row-split ELL, bf16).

Every variant is timed as K chained iterations inside ONE jitted call whose
input is the previous timed call's output (defeats remote execution
memoization, see bench.py) and ends with a full-output reduction fetch.

Run: python experiments/profile_spmm.py [n_nodes n_edges features iters]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnntf_tpu.data.synthetic import random_power_law_edges
from gnntf_tpu.graph import from_edges
from gnntf_tpu.ops import normalize_adjacency
from gnntf_tpu.ops.spmm import spmm_segment

args = [int(a) for a in sys.argv[1:]]
N = args[0] if len(args) > 0 else 169_343
E = args[1] if len(args) > 1 else 1_166_243
F = args[2] if len(args) > 2 else 128
K = args[3] if len(args) > 3 else 10

src, dst = random_power_law_edges(N, E, seed=0)
g = from_edges(src, dst, n_nodes=N, directed=False)
g = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(g)
x0 = jnp.asarray(np.random.RandomState(1).randn(N, F), jnp.float32)
Etot = g.n_edges
print(f"device={jax.devices()[0]}  N={N} E={Etot} F={F} K={K}",
      file=sys.stderr, flush=True)


def timeit(name, body, x, reps=2):
    @jax.jit
    def chain(h):
        return jax.lax.fori_loop(0, K, lambda i, h: body(h), h)

    h = chain(x)
    _ = float(jnp.sum(h))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        h = chain(h)
        _ = float(jnp.sum(h))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / K
    print(f"{name:34s} {per_iter*1e3:8.2f} ms/iter "
          f"{Etot/per_iter/1e6:10.1f} M edges/s", flush=True)
    return per_iter


row, col, val = g.row, g.col, g.val

# 1. the current default
timeit("segment-sum spmm (f32)", lambda h: spmm_segment(g, h), x0)

# 2. gather only: materialized-free gather+reduce over edges
timeit("gather+rowreduce only",
       lambda h: h + (h[col] * val[:, None]).sum(0)[None, :] * 1e-9, x0)

# 3. scatter only: fixed per-edge payload scaled by a data dependency
ones_e = jnp.ones((Etot,), jnp.float32)
timeit("scatter only (segment_sum bcast)",
       lambda h: jax.ops.segment_sum(
           jnp.broadcast_to((h[0] * 1e-9)[None, :], (Etot, F)) + val[:, None],
           row, num_segments=N, indices_are_sorted=True), x0)

# 4. row-split ELL: gather + dense k-reduce + small scatter over virtual rows
def build_ell(row_np, col_np, val_np, n, k):
    e = row_np.shape[0]
    deg = np.bincount(row_np, minlength=n)
    start = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=start[1:])
    rank = np.arange(e, dtype=np.int64) - start[row_np]
    vrow_within = rank // k
    n_vrows_per = -(-deg // k)
    n_vrows_per = np.maximum(n_vrows_per, 0)
    voff = np.zeros(n + 1, np.int64)
    np.cumsum(n_vrows_per, out=voff[1:])
    vrow = voff[row_np] + vrow_within
    V = int(voff[-1])
    slot = rank % k
    idx = np.full((V, k), n, np.int32)     # n -> padded zero row
    vals = np.zeros((V, k), np.float32)
    idx[vrow, slot] = col_np
    vals[vrow, slot] = val_np
    vrow_row = np.zeros(V, np.int32)
    for r in range(n):  # vectorize: repeat
        pass
    vrow_row = np.repeat(np.arange(n, dtype=np.int32), n_vrows_per)
    return jnp.asarray(idx), jnp.asarray(vals), jnp.asarray(vrow_row), V


row_np = np.asarray(row)
col_np = np.asarray(col)
val_np = np.asarray(val)
for k in (8, 16, 32):
    idx, vals, vrow_row, V = build_ell(row_np, col_np, val_np, N, k)
    print(f"  ELL k={k}: V={V} pad={V*k/Etot:.2f}x", file=sys.stderr,
          flush=True)

    def ell_body(h, idx=idx, vals=vals, vrow_row=vrow_row):
        hp = jnp.concatenate([h, jnp.zeros((1, F), h.dtype)], axis=0)
        gathered = hp[idx] * vals[:, :, None]
        partial_ = gathered.sum(axis=1)
        return jax.ops.segment_sum(partial_, vrow_row, num_segments=N,
                                   indices_are_sorted=True)

    timeit(f"row-split ELL k={k} (f32)", ell_body, x0)

# 5. bf16 feature propagation through the default path
xb = x0.astype(jnp.bfloat16)
timeit("segment-sum spmm (bf16)", lambda h: spmm_segment(g, h), xb)

# 6. extended sweep: smaller k, bf16 ELL, RCM locality
if os.environ.get("PROFILE_EXT") == "1":
    for k in (2, 4):
        idx, vals, vrow_row, V = build_ell(row_np, col_np, val_np, N, k)
        print(f"  ELL k={k}: V={V} pad={V*k/Etot:.2f}x", file=sys.stderr,
              flush=True)

        def ell_body(h, idx=idx, vals=vals, vrow_row=vrow_row):
            hp = jnp.concatenate([h, jnp.zeros((1, F), h.dtype)], axis=0)
            return jax.ops.segment_sum((hp[idx] * vals[:, :, None]).sum(1),
                                       vrow_row, num_segments=N,
                                       indices_are_sorted=True)
        timeit(f"row-split ELL k={k} (f32)", ell_body, x0)

    idx, vals, vrow_row, V = build_ell(row_np, col_np, val_np, N, 8)
    vals16 = vals.astype(jnp.bfloat16)

    def ell_bf16(h):
        hp = jnp.concatenate([h, jnp.zeros((1, F), h.dtype)], axis=0)
        g = hp[idx] * vals16[:, :, None]
        return jax.ops.segment_sum(
            g.sum(1).astype(jnp.float32), vrow_row, num_segments=N,
            indices_are_sorted=True).astype(jnp.bfloat16)
    timeit("row-split ELL k=8 (bf16 feats)", ell_bf16,
           x0.astype(jnp.bfloat16))

    # RCM locality: relabel nodes, rebuild ELL, measure (output permuted —
    # timing-only comparison)
    from gnntf_tpu.graph.reorder import rcm_order
    perm = np.asarray(rcm_order(g))
    inv = np.empty_like(perm); inv[perm] = np.arange(N)
    r2, c2 = inv[row_np], inv[col_np]
    o2 = np.lexsort((c2, r2))
    idx, vals, vrow_row, V = build_ell(r2[o2], c2[o2], val_np[o2], N, 8)

    def ell_rcm(h):
        hp = jnp.concatenate([h, jnp.zeros((1, F), h.dtype)], axis=0)
        return jax.ops.segment_sum((hp[idx] * vals[:, :, None]).sum(1),
                                   vrow_row, num_segments=N,
                                   indices_are_sorted=True)
    timeit("row-split ELL k=8 + RCM", ell_rcm, x0)
