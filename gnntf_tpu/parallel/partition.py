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


def partition_edges(graph: Graph, num_parts: int):
    """Split the (row-sorted) edge list into ``num_parts`` equal contiguous
    chunks, padding the total to a multiple first.  Returns a Graph whose
    arrays can be sharded on the leading edge axis (still flat [E_pad])."""
    return pad_graph(graph, num_parts)


def edge_balanced_ranges(row: np.ndarray, num_parts: int):
    """Destination-contiguous, edge-balanced node ranges: partition p owns
    destination rows [starts[p], starts[p+1]) such that edge counts are
    near-equal.  Used by the halo/edge-partition executor."""
    e = row.shape[0]
    bounds = [0]
    for p in range(1, num_parts):
        target = p * e // num_parts
        bounds.append(int(target))
    bounds.append(e)
    starts = [int(row[b]) if b < e else int(row[-1]) + 1 for b in bounds[:-1]]
    starts[0] = 0
    return starts
