"""Sparse matrix x dense matrix products (SpMM) and SDDMM.

This is THE hot op of the framework — the reference calls
``tf.sparse.sparse_dense_matmul`` from every propagation layer
(e.g. gnntf/core/gnn/architectures/filter.py:19, gcn.py:24,:48,:88,:104,:131).

The default implementation is a gather + segment-sum, which XLA lowers to an
efficient embedding-style gather and a sorted scatter-add on TPU (edges are
sorted by destination row at graph build time, so ``indices_are_sorted`` holds
and the scatter becomes a linear pass).  A Pallas kernel path
(`gnntf_tpu.ops.pallas`) can be selected for large graphs via
:func:`set_spmm_impl`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.coo import Graph

_SPMM_IMPL = "segment"  # or "pallas"


def set_spmm_impl(name: str) -> None:
    global _SPMM_IMPL
    if name not in ("segment", "pallas"):
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


def spmm(graph: Graph, x: jax.Array) -> jax.Array:
    """Dispatching SpMM entry point used by all propagation layers."""
    if _SPMM_IMPL == "pallas":
        from .pallas.spmm import spmm_pallas

        return spmm_pallas(graph, x)
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
