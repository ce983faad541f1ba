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


def _degree(graph: Graph, by: str = "col") -> jax.Array:
    """Column sums: deg[j] = sum_i A[i, j] (tf.sparse.reduce_sum axis=0);
    ``by='row'`` gives row sums (the 'row' normalization mode).

    For a lazily-dropped graph the sum runs over the column-split grid
    (dense k-reduce + sorted combine) instead of an unsorted E-sized
    ``segment_sum`` — measured ~18 ms per layer per step at 2.3M edges,
    the single most expensive op of the naive training forward.  A
    lazily-dropped graph whose structure arrives *traced* (e.g. a sharded
    Graph crossing a jit boundary) cannot build grids — it falls back to
    the materialized segment sum (advisor r3)."""
    if graph.dropped:
        from .stochastic import grids_eligible, stochastic_degree
        if grids_eligible(graph):
            deg = stochastic_degree(graph, by=by)
        else:
            g = graph.materialized_dropout()
            idx = g.col if by == "col" else g.row
            deg = jax.ops.segment_sum(g.val, idx, num_segments=g.n_nodes)
    else:
        idx = graph.col if by == "col" else graph.row
        deg = jax.ops.segment_sum(graph.val, idx,
                                  num_segments=graph.n_nodes)
    if graph.eye_weight != 0.0:
        deg = deg + jnp.asarray(graph.eye_weight, deg.dtype)
    return deg


def _degree_row(graph: Graph) -> jax.Array:
    return _degree(graph, by="row")


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
    (inference / parity) path — memoized per (graph identity, mode), so
    every layer of an evaluation trace shares ONE normalized graph object
    (degree pass runs once, and the identity-keyed SpMM layout caches hit
    across layers and traces).
    """
    deterministic = rng is None or graph_dropout == 0.0
    cacheable = (deterministic and not graph.scaled and not graph.dropped
                 and graph.eye_weight == 0.0
                 and not any(isinstance(a, jax.core.Tracer)
                             for a in (graph.row, graph.col, graph.val)))
    if cacheable:
        global _NORM_CACHE
        if _NORM_CACHE is None:
            from ..utils.idcache import IdLRU
            _NORM_CACHE = IdLRU()
        key = ("norm", id(graph.row), id(graph.col), id(graph.val),
               graph.n_nodes, normalized, add_eye)
        anchors = (graph.row, graph.col, graph.val)
        hit = _NORM_CACHE.get(key, anchors)
        if hit is not None:
            return hit
        # the cached value must hold *concrete* arrays even when this
        # runs inside a jit trace (omnistaging stages ops on concrete
        # inputs too) — ensure_compile_time_eval keeps the one-time
        # degree pass eager so no tracer can leak into the cache
        with jax.ensure_compile_time_eval():
            result = _normalize_impl(graph, graph_dropout=0.0,
                                     normalized=normalized, add_eye=add_eye,
                                     rng=None)
        _NORM_CACHE.put(key, anchors, result)
        return result
    return _normalize_impl(graph, graph_dropout=graph_dropout,
                           normalized=normalized, add_eye=add_eye, rng=rng)


_NORM_CACHE = None


def _normalize_impl(
    graph: Graph,
    *,
    graph_dropout: float,
    normalized: str,
    add_eye: str,
    rng: Optional[jax.Array],
) -> Graph:
    if graph.scaled or graph.eye_weight != 0.0:
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
