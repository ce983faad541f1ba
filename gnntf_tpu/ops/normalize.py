"""Adjacency normalization — the single normalization kernel of the framework.

Behavioral spec from the reference ``GNN.get_adjacency``
(gnntf/core/gnn/gnn.py:36-50):

  1. sparse dropout on edge *values* (layered.py:47-50) — fresh mask per call,
     i.e. per layer per step;
  2. optional self-loops *before* normalization (``add_eye='before'``);
  3. normalization:
       * ``symmetric``:  D = divide_no_nan(1, sqrt(colsum));  A <- D[i]·A[ij]·D[j]
         (i.e. D^{-1/2} A D^{-1/2}, with colsum==rowsum for symmetrized graphs)
       * ``bipartite``:  D = divide_no_nan(1, colsum);        A <- D[i]·A[ij]
       * ``none``: passthrough
  4. optional self-loops *after* normalization (``add_eye='after'``).

Renormalization happens *after* dropout so every dropout draw is renormalized
— reproduced here exactly.  All branches are static (Python-level), so each
configuration compiles to one fused XLA computation; with dropout off the
result is a pure function of the graph and XLA CSEs repeated calls across
layers.

TPU note: the degree scaling is returned *lazily* — the result carries the
raw (dropped) edge values plus per-node ``row_scale``/``col_scale`` vectors,
and the SpMM applies ``D ⊙ (A @ (D ⊙ x))`` (identical math to per-edge
``val·D[row]·D[col]`` up to float reassociation).  Per-edge scaling costs
two E-sized scalar gathers per layer per step — measured at ~2/3 of the
whole training epoch at ogbn-arxiv scale before this change — while the
lazy form is two (N, F) row-wise multiplies that XLA fuses into the
neighboring ops.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.coo import Graph, add_self_loops
from .dropout import dropout


def _degree(graph: Graph) -> jax.Array:
    """Column sums: deg[j] = sum_i A[i, j] (tf.sparse.reduce_sum axis=0).

    For a lazily-dropped graph the sum runs over the column-split grid
    (dense k-reduce + sorted combine) instead of an unsorted E-sized
    ``segment_sum`` — measured ~18 ms per layer per step at 2.3M edges,
    the single most expensive op of the naive training forward."""
    if graph.dropped:
        from .stochastic import stochastic_degree
        return stochastic_degree(graph, by="col")
    return jax.ops.segment_sum(graph.val, graph.col, num_segments=graph.n_nodes)


def _degree_row(graph: Graph) -> jax.Array:
    """Row sums (the 'row' normalization mode)."""
    if graph.dropped:
        from .stochastic import stochastic_degree
        return stochastic_degree(graph, by="row")
    return jax.ops.segment_sum(graph.val, graph.row,
                               num_segments=graph.n_nodes)


def edge_dropout(graph: Graph, rate: float, rng: Optional[jax.Array]) -> Graph:
    """Dropout on edge values; synthetic self-loop entries are never dropped
    (they are appended only after dropout in the reference flow).

    Above ``stochastic.MIN_EDGES`` (concrete structure and values) the
    draw is kept *lazy*: the graph carries two salts and every consumer
    recomputes the identical counter-based mask from constant edge ids —
    see ops/stochastic.py for why (removes all per-layer E-sized
    gather/scatter traffic).  Small or traced graphs keep the eager
    ``jax.random.bernoulli`` draw."""
    if rate == 0.0 or rng is None:
        return graph
    n_drop = graph.n_edges - graph.num_self_loop
    from .stochastic import grids_eligible, salts_from_key
    if grids_eligible(graph) and not graph.dropped:
        return dataclasses.replace(graph, drop_salt=salts_from_key(rng),
                                   drop_keep=1.0 - rate, drop_n=n_drop)
    graph = graph.materialized_dropout()  # stacking draws: realize the first
    base = dropout(rng, graph.val[:n_drop], rate)
    val = base if graph.num_self_loop == 0 else jnp.concatenate(
        [base, graph.val[n_drop:]])
    return Graph(graph.row, graph.col, val, graph.n_nodes,
                 graph.num_self_loop, graph.sorted_by_row)


def normalize_adjacency(
    graph: Graph,
    *,
    graph_dropout: float = 0.5,
    normalized: str = "symmetric",
    add_eye: str = "none",
    rng: Optional[jax.Array] = None,
) -> Graph:
    """Jit-compatible equivalent of ``GNN.get_adjacency``.

    Pass ``rng=None`` (or ``graph_dropout=0``) for the deterministic
    (inference / parity) path.
    """
    if graph.scaled:
        # normalizing an already-normalized graph: fold the scales first so
        # degrees see the effective values (no production path does this,
        # but it must stay correct)
        graph = graph.materialized()
    graph = edge_dropout(graph, graph_dropout, rng)
    if add_eye == "before":
        graph = add_self_loops(graph)
    if normalized == "symmetric":
        deg = _degree(graph)
        d = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-30)), 0.0)
        d = d.astype(graph.val.dtype)
        graph = dataclasses.replace(graph, row_scale=d, col_scale=d)
    elif normalized == "bipartite":
        deg = _degree(graph)
        d = jnp.where(deg != 0, 1.0 / jnp.where(deg == 0, 1.0, deg), 0.0)
        d = d.astype(graph.val.dtype)
        graph = dataclasses.replace(graph, row_scale=d)
    elif normalized == "row":
        # true row-stochastic D_row^{-1} A (D_row = per-destination degree):
        # the exact neighbor mean for *any* graph, directed or not.  No
        # reference counterpart (its 'bipartite' divides by colsums, which
        # equals the destination mean only on symmetrized graphs).
        deg = _degree_row(graph)
        d = jnp.where(deg != 0, 1.0 / jnp.where(deg == 0, 1.0, deg), 0.0)
        d = d.astype(graph.val.dtype)
        graph = dataclasses.replace(graph, row_scale=d)
    elif normalized != "none":
        raise ValueError(f"Invalid matrix normalization: {normalized!r}")
    if add_eye == "after":
        graph = add_self_loops(graph)  # materializes the scales (eye == 1)
    return graph
