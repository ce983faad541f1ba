"""Locality-improving node reorderings.

The blocked Pallas SpMM kernel (`gnntf_tpu.ops.pallas`) and any tiled
sparse schedule benefit from edges clustering into (row-window, col-tile)
blocks.  Real graphs have community structure that a bandwidth-reducing
permutation exposes; reverse Cuthill–McKee is the classic choice.

No reference counterpart (the reference never partitions or reorders,
SURVEY §2.4) — this is TPU-performance infrastructure.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from .coo import Graph, from_edges


def rcm_order(graph: Graph) -> np.ndarray:
    """Reverse Cuthill–McKee permutation: `perm[new_id] = old_id`.

    BFS from lowest-degree nodes, neighbors visited degree-ascending, then
    the visitation order is reversed.  Pure numpy (scipy-free) so it works
    in every environment.
    """
    n = graph.n_nodes
    row = np.asarray(graph.row)
    col = np.asarray(graph.col)
    # CSR build
    order = np.argsort(row, kind="stable")
    r, c = row[order], col[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, r + 1, 1)
    indptr = np.cumsum(indptr)
    degree = np.diff(indptr)

    visited = np.zeros(n, dtype=bool)
    result = np.empty(n, dtype=np.int64)
    pos = 0
    seeds = np.argsort(degree, kind="stable")
    for seed in seeds:
        if visited[seed]:
            continue
        visited[seed] = True
        result[pos] = seed
        head = pos
        pos += 1
        while head < pos:
            u = result[head]
            head += 1
            nbrs = c[indptr[u]:indptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if len(nbrs):
                nbrs = np.unique(nbrs)
                nbrs = nbrs[~visited[nbrs]]
                nbrs = nbrs[np.argsort(degree[nbrs], kind="stable")]
                visited[nbrs] = True
                result[pos:pos + len(nbrs)] = nbrs
                pos += len(nbrs)
    return result[::-1].copy()


def permute_graph(graph: Graph, perm: np.ndarray) -> Tuple[Graph, np.ndarray]:
    """Relabel nodes by ``perm`` (``perm[new_id] = old_id``).

    Returns the permuted graph and the inverse mapping
    ``inv[old_id] = new_id`` for relabeling features/labels:
    ``x_new = x_old[perm]``; node-id arrays map via ``inv[ids]``.
    """
    n = graph.n_nodes
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    row = inv[np.asarray(graph.row)]
    col = inv[np.asarray(graph.col)]
    g = from_edges(row, col, n_nodes=n, directed=True,
                   values=np.asarray(graph.val))
    return g, inv


def bandwidth(graph: Graph) -> int:
    """Max |row - col| over edges — the quantity RCM minimises."""
    row = np.asarray(graph.row)
    col = np.asarray(graph.col)
    if len(row) == 0:
        return 0
    return int(np.max(np.abs(row - col)))
