"""Host-side graph partitioning for multi-chip execution.

The scaling dimension of this workload is graph size (SURVEY §5.7): edges are
sharded across devices, features/params replicated or feature-sharded.
Edges are pre-sorted by destination row, so contiguous chunking gives every
device a contiguous destination range — its scatter-accumulate output
touches a narrow row band, and the cross-device combine is one psum.

Padding keeps shapes static: chunks are padded with (0, 0, 0.0) entries
whose zero value contributes nothing to degrees or aggregates.
"""
from __future__ import annotations

import numpy as np

from ..graph.coo import Graph


def pad_graph(graph: Graph, multiple: int) -> Graph:
    """Pad the edge list to a multiple (masked zero-value entries)."""
    import jax.numpy as jnp

    e = graph.n_edges
    target = ((e + multiple - 1) // multiple) * multiple
    if target == e:
        return graph
    pad = target - e
    graph = graph.materialized()  # padding operates on per-edge values
    return Graph(
        row=jnp.concatenate([graph.row, jnp.zeros((pad,), jnp.int32)]),
        col=jnp.concatenate([graph.col, jnp.zeros((pad,), jnp.int32)]),
        val=jnp.concatenate([graph.val,
                             jnp.zeros((pad,), graph.val.dtype)]),
        n_nodes=graph.n_nodes,
        num_self_loop=graph.num_self_loop,
        # padded entries appended at the end break global sortedness only at
        # the tail; segment ops stay correct, but be conservative:
        sorted_by_row=False,
    )


