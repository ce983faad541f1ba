"""Sparse matrix x dense matrix products (SpMM) and SDDMM.

This is THE hot op of the framework — the reference calls
``tf.sparse.sparse_dense_matmul`` from every propagation layer
(e.g. gnntf/core/gnn/architectures/filter.py:19, gcn.py:24,:48,:88,:104,:131).

Implementations (select with :func:`set_spmm_impl`, default ``auto``):

* ``segment`` — gather + sorted segment-sum.  Simple, fully dynamic
  (works on traced edge structure), and the baseline for everything else.
* ``ell`` — row-split padded ELL: rows are split into virtual rows of at
  most ``k`` edges, the per-virtual-row reduce is a *dense* axis sum, and
  only the small virtual-row -> row combine is a scatter.  Measured 2.2x
  faster than ``segment`` on TPU v5e at ogbn-arxiv scale
  (experiments/profile_spmm.py: 12.3 ms vs 27.6 ms per SpMM, E=2.3M,
  F=128, k=8) because the TPU's weak spot is the per-edge scatter/gather
  grain, and ELL moves almost all work onto dense-shaped ops.  The
  layout (indices) is built host-side once per graph structure and
  memoized; edge *values* stay dynamic, so per-step graph-dropout and
  renormalization work unchanged.
* ``pallas`` — blocked one-hot MXU kernel (`gnntf_tpu.ops.pallas`);
  competitive only at high blocked fill factors.
* ``auto`` — ``ell`` for concrete (non-traced) edge structure above
  ``_ELL_MIN_EDGES`` edges, else ``segment``.
"""
from __future__ import annotations

import dataclasses
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.coo import Graph

_SPMM_IMPL = "auto"  # "auto" | "segment" | "ell" | "pallas"
_ELL_MIN_EDGES = 65_536
_ELL_DEFAULT_K = 8


def set_spmm_impl(name: str) -> None:
    global _SPMM_IMPL
    if name not in ("auto", "segment", "ell", "pallas"):
        raise ValueError(name)
    _SPMM_IMPL = name


def spmm_segment(graph: Graph, x: jax.Array) -> jax.Array:
    """out[i, :] = sum_e{row[e]=i} val[e] * x[col[e], :]  (out = A @ X)."""
    gathered = x[graph.col] * graph.val[:, None].astype(x.dtype)
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
    """

    idx: np.ndarray        # (V, k) int32
    slot: np.ndarray       # (E,) int32
    vrow_row: np.ndarray   # (V,) int32
    k: int
    n_nodes: int

    # Leaves are numpy on purpose: the layout may be built lazily inside a
    # jit trace, where jnp.asarray would lift them into tracers that poison
    # the host-side cache (numpy arrays stay trace-safe constants).

    @property
    def n_vrows(self) -> int:
        return int(self.idx.shape[0])


def build_ell(row: np.ndarray, col: np.ndarray, n_nodes: int,
              k: int = _ELL_DEFAULT_K) -> ELLLayout:
    """Build the row-split ELL layout (host, one-time per structure).

    Prefers the single-pass C++ builder (native/gnntf_native.cc
    ``gnntf_build_ell``, O(E) counting pass, any edge order); falls back
    to the vectorized numpy path (stable argsort + scatter) when the
    native library is unavailable."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    e = row.shape[0]
    if e and n_nodes < 2**31 and row.max() < n_nodes and col.max() <= n_nodes:
        deg = np.bincount(row, minlength=n_nodes)
        v_total = int(np.sum(-(-deg // k)))
        if v_total > 0:
            from ..utils.native import build_ell_native
            built = build_ell_native(row, col, n_nodes, k, v_total)
            if built is not None:
                idx, slot, vrow_row = built
                return ELLLayout(idx=np.asarray(idx, np.int32),
                                 slot=np.asarray(slot, np.int32),
                                 vrow_row=np.asarray(vrow_row, np.int32),
                                 k=k, n_nodes=n_nodes)
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
    return ELLLayout(idx=idx, slot=slot.astype(np.int32),
                     vrow_row=vrow_row, k=k, n_nodes=n_nodes)


_ELL_CACHE: OrderedDict = OrderedDict()
_ELL_CACHE_MAX = 32


def _ell_layout(graph: Graph, k: int) -> ELLLayout:
    # keyed on id() but a strong reference to the keying array is kept in
    # the value, so a recycled id can never alias a dead graph's layout;
    # bounded LRU so per-sample-subgraph workloads don't leak layouts
    key = (id(graph.row), k)
    hit = _ELL_CACHE.get(key)
    if hit is not None and hit[0] is graph.row:
        _ELL_CACHE.move_to_end(key)
        return hit[1]
    layout = build_ell(np.asarray(graph.row), np.asarray(graph.col),
                       graph.n_nodes, k)
    _ELL_CACHE[key] = (graph.row, layout)
    while len(_ELL_CACHE) > _ELL_CACHE_MAX:
        _ELL_CACHE.popitem(last=False)
    return layout


def spmm_ell(graph: Graph, x: jax.Array, k: int = _ELL_DEFAULT_K) -> jax.Array:
    """SpMM via the row-split ELL layout (see module docstring).

    Requires concrete (non-traced) ``graph.row``/``graph.col``; the usual
    case — models close over the graph rather than passing it as a jit
    argument, so the structure is a trace constant.  ``graph.val`` may be
    traced (dropout/renormalization happen per step)."""
    layout = _ell_layout(graph, k)
    v_total = layout.n_vrows
    vals = jnp.zeros((v_total * layout.k,), x.dtype)
    vals = vals.at[layout.slot].set(graph.val.astype(x.dtype),
                                    indices_are_sorted=graph.sorted_by_row,
                                    unique_indices=True)
    vals = vals.reshape(v_total, layout.k)
    xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    partial = (xp[layout.idx] * vals[:, :, None]).sum(axis=1)
    return jax.ops.segment_sum(partial, layout.vrow_row,
                               num_segments=graph.n_nodes,
                               indices_are_sorted=True)


def _structure_is_concrete(graph: Graph) -> bool:
    return not isinstance(graph.row, jax.core.Tracer)


def spmm(graph: Graph, x: jax.Array) -> jax.Array:
    """Dispatching SpMM entry point used by all propagation layers."""
    impl = _SPMM_IMPL
    if impl == "auto":
        impl = ("ell" if graph.n_edges >= _ELL_MIN_EDGES
                and _structure_is_concrete(graph) else "segment")
    if impl == "pallas":
        from .pallas.spmm import spmm_pallas

        return spmm_pallas(graph, x)
    if impl == "ell" and _structure_is_concrete(graph):
        return spmm_ell(graph, x)
    return spmm_segment(graph, x)


def sddmm(graph: Graph, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sampled dense-dense matmul: s[e] = <x[row[e]], y[col[e]]>.

    Per-edge dot products on the sparsity pattern — the score computation of
    dot-product graph attention (no reference counterpart; BASELINE config 3).
    """
    return jnp.sum(x[graph.row] * y[graph.col], axis=-1)


def spmm_transpose(graph: Graph, x: jax.Array) -> jax.Array:
    """out = A^T @ X (swap row/col roles); used by tests and backward paths."""
    gathered = x[graph.row] * graph.val[:, None].astype(x.dtype)
    return jax.ops.segment_sum(gathered, graph.col, num_segments=graph.n_nodes)
