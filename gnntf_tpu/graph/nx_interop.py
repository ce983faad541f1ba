"""networkx interop — behavioral equivalents of the reference conversion API.

Reference: gnntf/core/gnn/graph_manipulation.py (create_nx_graph :5-12,
adj2graph :15-16, graph2indices :19-21, graph2adj :24-31).
"""
from __future__ import annotations

import numpy as np

from .coo import Graph, from_edges


def create_nx_graph(nodes, edges):
    """Build a directed networkx graph from node and edge lists."""
    import networkx as nx

    graph = nx.DiGraph()
    if nodes is not None:
        graph.add_nodes_from(nodes)
    graph.add_edges_from(edges)
    return graph


def graph2indices(G):
    """Map node objects to dense ids in graph-iteration order.

    The iteration-order contract is part of the reference API
    (README.md:10-12): features/labels rows must follow ``list(G)`` order.
    """
    node2id = {u: idx for idx, u in enumerate(G)}
    return [[node2id[u], node2id[v]] for u, v in G.edges()]


def graph2adj(G, directed: bool = False, dtype=None) -> Graph:
    """networkx graph -> :class:`Graph`.

    Matches the reference exactly: edge weights from the ``weight`` attribute
    (default 1.0); when ``directed=False`` reversed edges are *appended* so a
    reciprocal pair present in the input yields summed (value-2) entries.
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    indices = np.asarray(graph2indices(G), np.int32).reshape(-1, 2)
    values = np.asarray(
        [data.get("weight", 1.0) for _, _, data in G.edges(data=True)], np.float64
    )
    return from_edges(
        indices[:, 0], indices[:, 1], values,
        n_nodes=len(G), directed=directed, dtype=dtype,
    )


def adj2graph(nodes, adj: Graph):
    """Inverse of :func:`graph2adj` (edge list only; weights dropped)."""
    row = np.asarray(adj.row)
    col = np.asarray(adj.col)
    return create_nx_graph(nodes, list(zip(row.tolist(), col.tolist())))
