"""Sparse matrix x dense matrix products (SpMM) and SDDMM.

This is THE hot op of the framework — the reference calls
``tf.sparse.sparse_dense_matmul`` from every propagation layer
(e.g. gnntf/core/gnn/architectures/filter.py:19, gcn.py:24,:48,:88,:104,:131).

Implementations (select with :func:`set_spmm_impl`, default ``auto``):

* ``segment`` — gather + sorted segment-sum.  Simple, fully dynamic
  (works on traced edge structure), and the baseline for everything else.
* ``ell`` — row-split padded ELL with duplicate coalescing: rows are
  split into virtual rows of at most ``k`` edges, the per-virtual-row
  reduce is a *dense* axis sum, and only the small virtual-row -> row
  combine is a scatter.  The layout (indices) is built host-side once per
  graph structure and memoized; edge *values* stay dynamic, so per-step
  graph-dropout and renormalization work unchanged.
* ``hybrid`` — ELL plus **hub densification**: the SpMM bottleneck on TPU
  is the gather-unit *issue rate* (~80-190 M rows/s regardless of F or
  dtype, documentation/performance.md), so the rows gathered most often
  are moved off the gather path entirely.  The top ``n_hubs`` source
  nodes by edge count (power-law graphs: top-128 sources carry ~50% of
  edges) are handled as a dense (N, H) slice — live edge values scattered
  element-wise (cheap; the scatter unit sustains ~1 G elem/s) and one
  (N, H) @ (H, F) MXU matmul — while only the remaining minority of edges
  take the gather path.  Measured on TPU v5e at ogbn-arxiv scale
  (E=2.3M, F=128): 5.45 ms/SpMM = 428 M edges/s vs 12.4 ms (ELL r1) and
  27.6 ms (segment) — the dense hub matmul overlaps to near-zero marginal
  cost.  Falls back to plain ELL when hub coverage is low or the dense
  slice would exceed the memory cap.
* ``pallas`` — blocked one-hot MXU kernel (`gnntf_tpu.ops.pallas`);
  competitive only at high blocked fill factors.
* ``auto`` — ``hybrid`` for concrete (non-traced) edge structure above
  ``_ELL_MIN_EDGES`` edges, else ``segment``.
"""
from __future__ import annotations

import contextvars
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.coo import Graph
from ..utils.idcache import IdLRU, sizeof

_IMPL_NAMES = ("auto", "segment", "ell", "hybrid", "pallas")
_ELL_MIN_EDGES = 65_536
_ELL_DEFAULT_K = 8

# Dispatch state.  Both the impl selection and the executor override are
# contextvars, NOT module globals: contextvars are per-thread (and
# per-asyncio-task), so two threads tracing two different meshes — each
# scoping its own ``spmm_executor``/``spmm_impl`` — can never cross-talk.
# jit tracing is synchronous within the calling thread, which is exactly
# the scope a contextvar provides.
#
# ``_SPMM_IMPL_DEFAULT`` is the process-wide fallback mutated by
# :func:`set_spmm_impl` (a plain assignment — atomic in CPython, but
# intended to be called once at startup, not raced); the contextvar, set by
# the scoping context managers below, takes precedence in its context.
_SPMM_IMPL_DEFAULT = "auto"
_SPMM_IMPL_VAR: contextvars.ContextVar[Optional[str]] = \
    contextvars.ContextVar("gnntf_spmm_impl", default=None)

# Executor override: a callable ``(graph, x) -> out`` that takes precedence
# over every impl.  Distributed runs install one (e.g.
# ``parallel.halo.HaloExecutor``) around jit tracing so every propagation
# layer's SpMM routes through an explicit shard_map executor instead of
# relying on GSPMD sharding propagation.  Trace-scoped: it only needs to be
# set while the step function traces.
_SPMM_EXECUTOR_VAR: contextvars.ContextVar[Optional[object]] = \
    contextvars.ContextVar("gnntf_spmm_executor", default=None)


class spmm_executor:
    """Context manager scoping an executor override to a trace/call.

    Contextvar-backed: scoping is per-thread, so concurrent traces on
    different threads (e.g. two ``fit(mesh=...)`` calls over two meshes)
    each see only their own executor."""

    def __init__(self, fn):
        self.fn = fn

    def __enter__(self):
        self._token = _SPMM_EXECUTOR_VAR.set(self.fn)
        return self.fn

    def __exit__(self, *exc):
        _SPMM_EXECUTOR_VAR.reset(self._token)
        return False


class spmm_impl:
    """Context manager scoping the SpMM implementation selection
    (``auto``/``segment``/``ell``/``hybrid``/``pallas``) to a trace/call —
    the per-call analogue of :func:`set_spmm_impl`, race-free under
    threaded tracing.  ``None`` defers to the process default."""

    def __init__(self, name: Optional[str]):
        if name is not None and name not in _IMPL_NAMES:
            raise ValueError(name)
        self.name = name

    def __enter__(self):
        self._token = _SPMM_IMPL_VAR.set(self.name)
        return self.name

    def __exit__(self, *exc):
        _SPMM_IMPL_VAR.reset(self._token)
        return False


def set_spmm_executor(fn) -> None:
    """Install (or with ``None`` remove) the executor override for the
    *current context* (thread).  Prefer the :class:`spmm_executor` scope."""
    _SPMM_EXECUTOR_VAR.set(fn)


def set_spmm_impl(name: str) -> None:
    """Set the process-wide default SpMM implementation.  For per-call /
    per-trace selection use :class:`spmm_impl` (or ``fit(spmm_impl=...)``),
    which is safe under concurrent tracing."""
    global _SPMM_IMPL_DEFAULT
    if name not in _IMPL_NAMES:
        raise ValueError(name)
    _SPMM_IMPL_DEFAULT = name


def _no_fold(val) -> jax.Array:
    """Shield a concrete (trace-constant) array from XLA constant folding
    via ``lax.optimization_barrier`` (identity for traced values).

    Trade-off, measured at bench scale (2.3M edges): with dropout off the
    edge values close over the jit as constants and XLA folds the E-sized
    scatter/segment chains at *compile* time ("Constant folding an
    instruction is taking > 1s" — minutes of compile through the
    remote-compile service) but the folded program then runs the routing
    for free at runtime; a barrier flips that (fast compile, but the
    barrier also blocks loop-invariant hoisting, so the routing re-runs
    every iteration — 9x slower propagation, 2.8x slower train epoch).
    The framework therefore does NOT barrier by default; fixed-adjacency
    callers use :class:`PreparedSpMM`, which sidesteps both costs."""
    if isinstance(val, jax.core.Tracer):
        return val
    return jax.lax.optimization_barrier(jnp.asarray(val))


def _scaled_call(fn, graph: Graph, x: jax.Array, **kw) -> jax.Array:
    """Apply a lazily-scaled graph's diagonal scales as (N, F) row-wise
    multiplies — and the lazy post-scale identity as ``+ w*x`` — around
    ``fn`` on the unscaled base graph (see ``spmm``)."""
    rs, cs = graph.row_scale, graph.col_scale
    w = graph.eye_weight
    base = dataclasses.replace(graph, row_scale=None, col_scale=None,
                               eye_weight=0.0)
    xin = x
    if cs is not None:
        xin = xin * cs[:, None].astype(x.dtype)
    out = fn(base, xin, **kw)
    if rs is not None:
        out = out * rs[:, None].astype(out.dtype)
    if w != 0.0:
        out = out + jnp.asarray(w, x.dtype) * x
    return out


def spmm_segment(graph: Graph, x: jax.Array) -> jax.Array:
    """out[i, :] = sum_e{row[e]=i} val[e] * x[col[e], :]  (out = A @ X)."""
    if graph.scaled or graph.eye_weight != 0.0:
        return _scaled_call(spmm_segment, graph, x)
    graph = graph.materialized_dropout()
    val = graph.val
    gathered = x[graph.col] * val[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered,
        graph.row,
        num_segments=graph.n_nodes,
        indices_are_sorted=graph.sorted_by_row,
    )


@dataclasses.dataclass(frozen=True)
class ELLLayout:
    """Host-built row-split ELL layout for one graph *structure*.

    ``idx[v, j]`` — source node of the j-th edge of virtual row ``v``
    (padded with ``n_nodes``, which indexes an appended zero row);
    ``slot[e]`` — flat position of edge ``e`` in the [V, k] value grid
    (strictly increasing for row-sorted input, so the per-call value
    scatter is sorted and unique);
    ``vrow_row[v]`` — the real destination row of virtual row ``v``
    (non-decreasing, so the combine is a sorted segment-sum).

    **Duplicate coalescing** (``dup_order``/``dup_seg`` set): repeated
    (row, col) pairs — ubiquitous under the reference's symmetrization
    convention, which doubles every reciprocal edge
    (graph_manipulation.py:29; DGL Planetoid graphs arrive bidirectional,
    so ~100% of their edges are duplicated) — are coalesced at the layout
    level.  Live edge values are summed per unique pair *before* the
    gather (``val_u = segment_sum(val[dup_order], dup_seg)``), which is
    exact for any downstream linear use (including per-edge dropout drawn
    on the original entries), and the gather/k-sum/combine then process
    only ``n_unique`` edges.  On graphs with heavy duplication this halves
    the gather work — the SpMM bottleneck on TPU is gather *issue rate*,
    not bandwidth (documentation/performance.md).
    """

    idx: np.ndarray        # (V, k) int32
    slot: np.ndarray       # (E_u,) int32 — per *unique* edge
    vrow_row: np.ndarray   # (V,) int32
    k: int
    n_nodes: int
    dup_order: Optional[np.ndarray] = None  # (E,) sort to (row,col) order
    dup_seg: Optional[np.ndarray] = None    # (E,) unique-pair id, sorted
    n_unique: int = 0
    # (E,) int32 — flat value-grid slot per ORIGINAL edge (duplicates share
    # a slot, so one scatter-ADD from original edge order both coalesces and
    # places the live values; replaces the gather-based coalesce, whose
    # E-sized val[dup_order] gather is ~10x slower than a scatter on TPU)
    edge_slot: Optional[np.ndarray] = None

    # Leaves are numpy on purpose: the layout may be built lazily inside a
    # jit trace, where jnp.asarray would lift them into tracers that poison
    # the host-side cache (numpy arrays stay trace-safe constants).

    @property
    def n_vrows(self) -> int:
        return int(self.idx.shape[0])

    def coalesce_values(self, val):
        """Sum live edge values over duplicate (row, col) pairs; identity
        when the structure has no duplicates."""
        if self.dup_order is None:
            return val
        return jax.ops.segment_sum(val[self.dup_order],
                                   self.dup_seg,
                                   num_segments=self.n_unique,
                                   indices_are_sorted=True)


def build_ell(row: np.ndarray, col: np.ndarray, n_nodes: int,
              k: int = _ELL_DEFAULT_K, dedup: bool = True) -> ELLLayout:
    """Build the row-split ELL layout (host, one-time per structure).

    With ``dedup`` (default), duplicate (row, col) pairs are coalesced: the
    layout indexes only unique pairs and records the order/segment maps
    that sum live values per pair at call time (see ELLLayout docstring).

    Prefers the single-pass C++ builder (native/gnntf_native.cc
    ``gnntf_build_ell``, O(E) counting pass, any edge order); falls back
    to the vectorized numpy path (stable argsort + scatter) when the
    native library is unavailable."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    e = row.shape[0]
    if dedup and e:
        order = np.lexsort((col, row))
        rs, cs = row[order], col[order]
        new = np.ones(e, bool)
        new[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
        n_u = int(new.sum())
        if n_u < e:
            uid = np.cumsum(new, dtype=np.int64) - 1
            base = build_ell(rs[new], cs[new], n_nodes, k, dedup=False)
            es = np.empty(e, np.int32)
            es[order] = base.slot[uid]
            return dataclasses.replace(
                base, dup_order=order.astype(np.int32),
                dup_seg=uid.astype(np.int32), n_unique=n_u, edge_slot=es)
    if e and n_nodes < 2**31 and row.max() < n_nodes and col.max() <= n_nodes:
        deg = np.bincount(row, minlength=n_nodes)
        v_total = int(np.sum(-(-deg // k)))
        if v_total > 0:
            from ..utils.native import build_ell_native
            built = build_ell_native(row, col, n_nodes, k, v_total)
            if built is not None:
                idx, slot, vrow_row = built
                slot = np.asarray(slot, np.int32)
                return ELLLayout(idx=np.asarray(idx, np.int32),
                                 slot=slot,
                                 vrow_row=np.asarray(vrow_row, np.int32),
                                 k=k, n_nodes=n_nodes, edge_slot=slot)
    order = None
    if e and np.any(row[1:] < row[:-1]):
        order = np.argsort(row, kind="stable")
        row_s, col_s = row[order], col[order]
    else:
        row_s, col_s = row, col
    deg = np.bincount(row_s, minlength=n_nodes)
    start = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(deg, out=start[1:])
    rank = np.arange(e, dtype=np.int64) - start[row_s]
    vrows_per_row = -(-deg // k)
    voff = np.zeros(n_nodes + 1, np.int64)
    np.cumsum(vrows_per_row, out=voff[1:])
    vrow = voff[row_s] + rank // k
    v_total = max(int(voff[-1]), 1)
    slot_sorted = vrow * k + rank % k
    idx = np.full((v_total, k), n_nodes, np.int32)
    idx.reshape(-1)[slot_sorted] = col_s
    slot = np.empty(e, np.int64)
    if order is not None:
        slot[order] = slot_sorted
    else:
        slot = slot_sorted
    vrow_row = np.repeat(np.arange(n_nodes, dtype=np.int32), vrows_per_row)
    if vrow_row.shape[0] == 0:
        vrow_row = np.zeros(1, np.int32)
    slot = slot.astype(np.int32)
    return ELLLayout(idx=idx, slot=slot,
                     vrow_row=vrow_row, k=k, n_nodes=n_nodes, edge_slot=slot)


_ELL_CACHE = IdLRU()  # byte-bounded with anchor-identity re-check


def _ell_layout(graph: Graph, k: int) -> ELLLayout:
    key = ("ell", id(graph.row), id(graph.col), graph.n_nodes, k)
    anchors = (graph.row, graph.col)
    layout = _ELL_CACHE.get(key, anchors)
    if layout is None:
        layout = build_ell(np.asarray(graph.row), np.asarray(graph.col),
                           graph.n_nodes, k)
        _ELL_CACHE.put(key, anchors, layout)
    return layout


def _ell_compute(layout: ELLLayout, vals: jax.Array, x: jax.Array,
                 n_nodes: int) -> jax.Array:
    """The ELL compute on a pre-scattered (V, k) value grid: padded gather
    -> dense k-sum -> sorted virtual-row combine."""
    xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    partial = (xp[layout.idx] * vals[:, :, None]).sum(axis=1)
    return jax.ops.segment_sum(partial, layout.vrow_row,
                               num_segments=n_nodes,
                               indices_are_sorted=True)


def _ell_apply(layout: ELLLayout, val: jax.Array, x: jax.Array,
               n_nodes: int, slots_sorted: bool = True) -> jax.Array:
    """ELL compute from per-*unique*-edge values (kept for callers that
    already coalesced; the production path scatters per-original values,
    see :func:`spmm_ell`)."""
    v_total = layout.n_vrows
    vals = jnp.zeros((v_total * layout.k,), x.dtype)
    vals = vals.at[layout.slot].set(val.astype(x.dtype),
                                             indices_are_sorted=slots_sorted,
                                             unique_indices=True)
    return _ell_compute(layout, vals.reshape(v_total, layout.k), x, n_nodes)


def spmm_ell(graph: Graph, x: jax.Array, k: int = _ELL_DEFAULT_K) -> jax.Array:
    """SpMM via the row-split ELL layout (see module docstring).

    Requires concrete (non-traced) ``graph.row``/``graph.col``; the usual
    case — models close over the graph rather than passing it as a jit
    argument, so the structure is a trace constant.  ``graph.val`` may be
    traced (dropout/renormalization happen per step).

    Live values are routed into the (V, k) grid with ONE scatter-add from
    original edge order (``layout.edge_slot``): duplicate (row, col) pairs
    share a slot, so the add coalesces them for free — no E-sized
    ``val[dup_order]`` gather on the hot path."""
    if graph.scaled or graph.eye_weight != 0.0:
        return _scaled_call(spmm_ell, graph, x, k=k)
    graph = graph.materialized_dropout()
    layout = _ell_layout(graph, k)
    v_total = layout.n_vrows
    unique = layout.dup_order is None
    vals = jnp.zeros((v_total * layout.k,), x.dtype)
    vals = vals.at[layout.edge_slot].add(
        graph.val.astype(x.dtype),
        indices_are_sorted=unique and graph.sorted_by_row,
        unique_indices=unique)
    return _ell_compute(layout, vals.reshape(v_total, layout.k), x,
                        graph.n_nodes)


@dataclasses.dataclass(frozen=True)
class HybridLayout:
    """Host-built layout for the hub-densified SpMM (module docstring).

    Unique-edge maps: ``dup_order`` sorts original edges to (row, col)
    order, ``dup_seg`` (when duplicates exist) sums them per unique pair.
    The unique edges are then split: ``hub_sel`` (source in the top
    ``n_hubs`` nodes) are scattered into the dense (N, H) slice at flat
    positions ``hub_flat``; ``rest_sel`` take the ELL gather path."""

    rest: ELLLayout
    dup_order: Optional[np.ndarray]  # (E,) or None (identity)
    dup_seg: Optional[np.ndarray]    # (E,) or None (no duplicates)
    n_unique: int
    rest_sel: np.ndarray             # (E_rest,) int32 into unique edges
    hub_sel: np.ndarray              # (E_hub,) int32 into unique edges
    hub_flat: np.ndarray             # (E_hub,) int32 into the (N*H,) slice
    hub_ids: np.ndarray              # (H,) int32 hub node ids
    n_hubs: int
    n_nodes: int
    # Per-ORIGINAL-edge routing (exactly one is in range per edge; the
    # other holds an out-of-range sentinel dropped by scatter mode="drop"):
    # one scatter-add places+coalesces the live values of each half with no
    # gathers on the hot path (see spmm_hybrid).
    ell_slot_of_edge: Optional[np.ndarray] = None    # (E,) into rest grid
    dense_flat_of_edge: Optional[np.ndarray] = None  # (E,) into (N*H,)

    def unique_values(self, val: jax.Array) -> jax.Array:
        if self.dup_order is not None:
            val = val[self.dup_order]
        if self.dup_seg is not None:
            val = jax.ops.segment_sum(val, self.dup_seg,
                                      num_segments=self.n_unique,
                                      indices_are_sorted=True)
        return val


_HUB_COUNT = 256  # measured optimum at bench scale (experiments/hub_sweep.py:
# 394.5 / 407.7 / 425.6 M edges/s at H=64/128/256; H=512's 347MB dense
# slice exceeds the remote-compile payload limit and the marginal coverage
# is ~0.4% — see documentation/performance.md)
_HUB_MIN_COVERAGE = 0.15       # below this the dense slice isn't worth it
_HUB_MEM_CAP = 512 * 1024 ** 2  # max bytes for the dense (N, H) f32 slice


def build_hybrid(row, col, n_nodes: int, k: int = _ELL_DEFAULT_K,
                 n_hubs: int = _HUB_COUNT,
                 min_coverage: float = _HUB_MIN_COVERAGE,
                 mem_cap: int = _HUB_MEM_CAP) -> Optional[HybridLayout]:
    """Build the hub-densified layout, or None when hub densification
    doesn't pay (low hub coverage, tiny graph, or dense-slice memory cap
    exceeded) — the caller then falls back to plain ELL."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    e = row.shape[0]
    if e == 0 or n_nodes * n_hubs * 4 > mem_cap:
        return None
    order = np.lexsort((col, row))
    rs, cs = row[order], col[order]
    new = np.ones(e, bool)
    new[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
    n_u = int(new.sum())
    if n_u == e:
        dup_seg = None
        ru, cu = rs, cs
        dup_order = None if np.array_equal(order, np.arange(e)) \
            else order.astype(np.int32)
    else:
        dup_seg = (np.cumsum(new, dtype=np.int64) - 1).astype(np.int32)
        dup_order = order.astype(np.int32)
        ru, cu = rs[new], cs[new]
    cdeg = np.bincount(cu, minlength=n_nodes)
    n_hubs = min(n_hubs, int(np.sum(cdeg > 0)))
    if n_hubs == 0:
        return None
    hub_ids = np.argpartition(-cdeg, n_hubs - 1)[:n_hubs]
    coverage = float(cdeg[hub_ids].sum()) / max(1, n_u)
    if coverage < min_coverage:
        return None
    hub_pos = np.full(n_nodes, -1, np.int64)
    hub_pos[hub_ids] = np.arange(n_hubs)
    is_hub = hub_pos[cu] >= 0
    rest = build_ell(ru[~is_hub], cu[~is_hub], n_nodes, k, dedup=False)
    rest_sel = np.flatnonzero(~is_hub).astype(np.int32)
    hub_sel = np.flatnonzero(is_hub).astype(np.int32)
    hub_flat = (ru[is_hub] * n_hubs + hub_pos[cu[is_hub]]).astype(np.int32)
    # per-unique routing tables (out-of-range sentinel on the other half)
    u2ell = np.full(n_u, rest.n_vrows * k, np.int32)
    u2ell[rest_sel] = rest.slot
    u2dense = np.full(n_u, n_nodes * n_hubs, np.int32)
    u2dense[hub_sel] = hub_flat
    # per-original routing: duplicates of a pair share its target slot
    if dup_order is None:  # already in (row, col) order, no duplicates
        ell_of_edge, dense_of_edge = u2ell, u2dense
    else:
        per_sorted = (u2ell, u2dense) if dup_seg is None \
            else (u2ell[dup_seg], u2dense[dup_seg])
        ell_of_edge = np.empty(e, np.int32)
        dense_of_edge = np.empty(e, np.int32)
        ell_of_edge[dup_order] = per_sorted[0]
        dense_of_edge[dup_order] = per_sorted[1]
    return HybridLayout(
        rest=rest, dup_order=dup_order, dup_seg=dup_seg, n_unique=n_u,
        rest_sel=rest_sel, hub_sel=hub_sel, hub_flat=hub_flat,
        hub_ids=hub_ids.astype(np.int32), n_hubs=n_hubs, n_nodes=n_nodes,
        ell_slot_of_edge=ell_of_edge, dense_flat_of_edge=dense_of_edge)


_HYBRID_CACHE = IdLRU()
_NO_HUBS = "no-hubs"  # sentinel: hybrid build declined, use plain ELL


def _hybrid_layout(graph: Graph, k: int):
    key = ("hybrid", id(graph.row), id(graph.col), graph.n_nodes, k)
    anchors = (graph.row, graph.col)
    hit = _HYBRID_CACHE.get(key, anchors)
    if hit is None:
        layout = build_hybrid(np.asarray(graph.row), np.asarray(graph.col),
                              graph.n_nodes, k)
        hit = layout if layout is not None else _NO_HUBS
        _HYBRID_CACHE.put(key, anchors, hit)
    return hit


def spmm_hybrid(graph: Graph, x: jax.Array,
                k: int = _ELL_DEFAULT_K) -> jax.Array:
    """Hub-densified SpMM (see module docstring): dense (N, H) MXU matmul
    for edges sourced at the ``H`` highest-traffic nodes, ELL gather for
    the rest.  Semantically identical to ``spmm_segment`` (duplicates sum,
    live values flow through), differentiable, jit-compatible with traced
    values.

    Value routing is two scatter-adds straight from original edge order
    (``ell_slot_of_edge``/``dense_flat_of_edge``; each edge is in range on
    exactly one of them, the other side drops it via ``mode="drop"``).
    Duplicate pairs share a slot so the adds coalesce them — no per-edge
    gathers remain on the hot path (the old
    gather->segment_sum->gather chain cost more than the SpMM itself at
    ogbn-arxiv scale)."""
    if graph.scaled or graph.eye_weight != 0.0:
        return _scaled_call(spmm_hybrid, graph, x, k=k)
    graph = graph.materialized_dropout()
    layout = _hybrid_layout(graph, k)
    if layout is _NO_HUBS or layout is None:
        return spmm_ell(graph, x, k)
    val = graph.val.astype(x.dtype)
    rest = layout.rest
    ell_vals = jnp.zeros((rest.n_vrows * rest.k,), x.dtype)
    ell_vals = ell_vals.at[layout.ell_slot_of_edge].add(
        val, mode="drop")
    out = _ell_compute(rest, ell_vals.reshape(rest.n_vrows, rest.k), x,
                       graph.n_nodes)
    dense = jnp.zeros((graph.n_nodes * layout.n_hubs,), x.dtype)
    dense = dense.at[layout.dense_flat_of_edge].add(
        val, mode="drop")
    dense = dense.reshape(graph.n_nodes, layout.n_hubs)
    return out + jnp.dot(dense, x[layout.hub_ids],
                         preferred_element_type=x.dtype)


def _structure_is_concrete(graph: Graph) -> bool:
    return not (isinstance(graph.row, jax.core.Tracer)
                or isinstance(graph.col, jax.core.Tracer))


class PreparedSpMM:
    """Value-routing done once, eagerly, outside jit: the per-call work is
    pure gather / k-reduce / MXU matmul / sorted combine.

    For a *fixed* normalized adjacency (inference, the propagation
    benchmark, repeated evaluation) the value scatter, duplicate
    coalescing and degree scaling are loop-invariant.  Leaving them
    inside the jitted program either makes XLA constant-fold E-sized
    chains at compile time (minutes at 2.3M edges through the
    remote-compile service) or — when shielded with an optimization
    barrier — re-executes them every call.  Preparing eagerly sidesteps
    both: build once per (graph, values), then ``prepared(x)`` from any
    jit.

    ``prepare_spmm(graph)`` accepts a lazily-scaled graph (from
    ``normalize_adjacency``); scales fold into the prepared state as
    (N,)-vector multiplies around the product.
    """

    def __init__(self, graph: Graph, k: int = _ELL_DEFAULT_K):
        if not _structure_is_concrete(graph):
            raise TypeError("prepare_spmm needs concrete graph structure")
        if graph.dropped:
            raise TypeError("prepare_spmm is for fixed adjacencies; a "
                            "lazily-dropped graph resamples per call — use "
                            "spmm() directly")
        if isinstance(graph.val, jax.core.Tracer):
            raise TypeError("prepare_spmm needs concrete edge values; for "
                            "traced values (dropout) call spmm() directly")
        # the one-time value routing must stay eager even when this runs
        # inside a jit trace (the dispatcher builds lazily mid-trace):
        # staged-but-concrete results would leak tracers into the cache
        with jax.ensure_compile_time_eval():
            self._build(graph, k)

    def _build(self, graph: Graph, k: int):
        self.n_nodes = graph.n_nodes
        self.row_scale = graph.row_scale
        self.col_scale = graph.col_scale
        self.eye_weight = graph.eye_weight
        base = dataclasses.replace(graph, row_scale=None, col_scale=None,
                                   eye_weight=0.0)
        val = jnp.asarray(base.val)
        layout = _hybrid_layout(base, k)
        if layout is _NO_HUBS or layout is None:
            ell = _ell_layout(base, k)
            self.hybrid = None
            self.ell = ell
            unique = ell.dup_order is None
            vals = jnp.zeros((ell.n_vrows * ell.k,), val.dtype)
            self.ell_vals = vals.at[ell.edge_slot].add(
                val, indices_are_sorted=unique and base.sorted_by_row,
                unique_indices=unique).reshape(ell.n_vrows, ell.k)
            self.dense = None
            self.hub_ids = None
        else:
            self.hybrid = layout
            self.ell = layout.rest
            vals = jnp.zeros((layout.rest.n_vrows * layout.rest.k,),
                             val.dtype)
            self.ell_vals = vals.at[layout.ell_slot_of_edge].add(
                val, mode="drop").reshape(layout.rest.n_vrows,
                                          layout.rest.k)
            dense = jnp.zeros((graph.n_nodes * layout.n_hubs,), val.dtype)
            self.dense = dense.at[layout.dense_flat_of_edge].add(
                val, mode="drop").reshape(graph.n_nodes, layout.n_hubs)
            self.hub_ids = jnp.asarray(layout.hub_ids)
        jax.block_until_ready(self.ell_vals)

    def __call__(self, x: jax.Array) -> jax.Array:
        xin = x
        if self.col_scale is not None:
            xin = xin * self.col_scale[:, None].astype(x.dtype)
        out = _ell_compute(self.ell, self.ell_vals.astype(x.dtype),
                           xin, self.n_nodes)
        if self.dense is not None:
            out = out + jnp.dot(self.dense.astype(x.dtype),
                                xin[self.hub_ids],
                                preferred_element_type=x.dtype)
        if self.row_scale is not None:
            out = out * self.row_scale[:, None].astype(out.dtype)
        if self.eye_weight != 0.0:
            out = out + jnp.asarray(self.eye_weight, x.dtype) * x
        return out

    def nbytes(self) -> int:
        return sizeof((self.ell_vals, self.dense, self.hub_ids,
                       self.row_scale, self.col_scale)) + sizeof(self.ell)


def prepare_spmm(graph: Graph, k: int = _ELL_DEFAULT_K) -> PreparedSpMM:
    """Build a :class:`PreparedSpMM` for a fixed (concrete-valued) graph."""
    return PreparedSpMM(graph, k)


_PREPARED_CACHE = IdLRU()


def _prepared_cached(graph: Graph, k: int) -> PreparedSpMM:
    """Memoized :class:`PreparedSpMM` for an unscaled, undropped,
    concrete-valued graph — the dispatcher's fixed-adjacency fast path
    (evaluation / inference inside a jitted step).  The eager one-time
    build runs during the first trace; later traces and the hoisting
    replay hit the cache and see only parameter-fed arrays."""
    key = ("prep", id(graph.row), id(graph.col), id(graph.val), graph.n_nodes, k)
    anchors = (graph.row, graph.col, graph.val)
    prep = _PREPARED_CACHE.get(key, anchors)
    if prep is None:
        prep = PreparedSpMM(graph, k)
        _PREPARED_CACHE.put(key, anchors, prep, nbytes=prep.nbytes())
    return prep


def spmm(graph: Graph, x: jax.Array) -> jax.Array:
    """Dispatching SpMM entry point used by all propagation layers.

    Lazy diagonal scales (``graph.row_scale``/``col_scale``, produced by
    ``normalize_adjacency``) are applied here as (N, F) row-wise multiplies
    around the product — ``rs ⊙ (A @ (cs ⊙ x))`` — so no implementation or
    executor ever pays the two E-sized per-edge scale gathers.  The lazy
    post-scale identity (``eye_weight``, add_eye='after') is the exact
    rewrite ``(A' + wI) @ x = A' @ x + w*x``."""
    if graph.eye_weight != 0.0:
        w = graph.eye_weight
        base = dataclasses.replace(graph, eye_weight=0.0)
        return spmm(base, x) + jnp.asarray(w, x.dtype) * x
    if graph.scaled:
        rs, cs = graph.row_scale, graph.col_scale
        base = dataclasses.replace(graph, row_scale=None, col_scale=None)
        if cs is not None:
            x = x * cs[:, None].astype(x.dtype)
        out = spmm(base, x)
        if rs is not None:
            out = out * rs[:, None].astype(out.dtype)
        return out
    executor = _SPMM_EXECUTOR_VAR.get()
    if executor is not None:
        # lazy-aware executors (supports_lazy_dropout) receive the graph
        # with its dropout fields intact and take the grid-resident path
        # (each device recomputes the identical mask locally from its
        # constant edge-id grid — parallel/dropgrids.py), so no E-sized
        # per-layer value routing reaches the distributed step.  Executors
        # registered against the original contract (per-edge values in
        # graph.val) still get the realized draw.
        if graph.dropped and not getattr(executor, "supports_lazy_dropout",
                                         False):
            graph = graph.materialized_dropout()
        return executor(graph, x)
    impl = _SPMM_IMPL_VAR.get() or _SPMM_IMPL_DEFAULT
    if graph.dropped:
        from .stochastic import grids_eligible, stochastic_spmm
        if impl in ("auto", "hybrid", "ell") and grids_eligible(graph):
            # training hot path: masked value grids + gather-only custom
            # VJP (ops/stochastic.py) — hub densification doesn't apply
            # (randomizing the dense slice costs a per-layer scatter or
            # per-cell sampling, both measured slower than the extra
            # gather issue)
            return stochastic_spmm(graph, x)
        return spmm(graph.materialized_dropout(), x)
    if (impl in ("auto", "hybrid")
            and graph.n_edges >= _ELL_MIN_EDGES
            and _structure_is_concrete(graph)
            and not isinstance(graph.val, jax.core.Tracer)):
        # fixed adjacency at scale (evaluation/inference inside a step):
        # value routing prepared once, eagerly, outside the program — the
        # per-call work is gather/k-reduce/MXU only and all state arrives
        # as hoisted parameters, never as folded constants
        return _prepared_cached(graph, _ELL_DEFAULT_K)(x)
    if impl == "auto":
        impl = ("hybrid" if graph.n_edges >= _ELL_MIN_EDGES
                and _structure_is_concrete(graph) else "segment")
    if impl == "pallas":
        from .pallas.spmm import spmm_pallas

        return spmm_pallas(graph, x)
    if impl == "hybrid" and _structure_is_concrete(graph):
        return spmm_hybrid(graph, x)
    if impl == "ell" and _structure_is_concrete(graph):
        return spmm_ell(graph, x)
    return spmm_segment(graph, x)


def edge_dot(row: jax.Array, col: jax.Array, x: jax.Array,
             y: Optional[jax.Array] = None) -> jax.Array:
    """Per-pair dot products ``s[e] = <x[row[e]], y[col[e]]>`` — the SDDMM
    core on an explicit index list.  Production call sites: every
    dot/cosine link-prediction scoring pass (tasks/link_prediction.py,
    reference graph_predictor.py:120-124 does this with gathers + reduce)
    and :func:`sddmm` on a graph's sparsity pattern."""
    y = x if y is None else y
    return jnp.sum(x[row] * y[col], axis=-1)


def sddmm(graph: Graph, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sampled dense-dense matmul on the sparsity pattern:
    ``s[e] = <x[row[e]], y[col[e]]>`` — the score computation of dot-product
    graph attention (no reference counterpart; BASELINE config 3)."""
    return edge_dot(graph.row, graph.col, x, y)
