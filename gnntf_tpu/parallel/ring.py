"""Ring SpMM over a shard_map device mesh.

The ring-attention analogue for graph aggregation (SURVEY §5.7: blockwise
accumulate + neighbor exchange maps onto ring-SpMM over edge blocks):
node features are sharded by contiguous row block, each device owns the
edges whose *destination* falls in its block, and instead of exchanging a
precomputed halo (see `halo.py`), the feature blocks themselves rotate
around the ring with ``lax.ppermute``.  At step ``s`` device ``p`` holds
block ``(p + s) % P`` and aggregates exactly the edges whose source lives
in that block; after ``P`` steps every edge has been applied.

Trade-off vs the halo executor: ring moves each block ``P - 1`` times
(dense all-gather bandwidth, but pipelined and overlap-friendly — XLA
schedules the next ``ppermute`` concurrently with the current block's
gather/segment-sum), while halo moves only boundary rows but needs a
host-precomputed send schedule and an ``all_to_all``.  Ring wins when the
graph is dense/expander-like (halo ≈ everything anyway) or when feature
blocks fit comfortably in VMEM; halo wins on well-partitioned sparse
graphs.  Both are differentiable and drop into a jitted train step.

No reference counterpart (the reference is single-device eager TF,
SURVEY §2.4).  Correctness is CI-tested on an 8-device virtual CPU mesh
against the single-chip segment-sum SpMM, including gradients.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.coo import Graph
from .dist import EDGE_AXIS


@dataclass(frozen=True)
class RingPartition:
    """Host-precomputed schedule for :func:`ring_spmm`.

    ``rows/cols/vals[p, s, e]`` — the edges device ``p`` applies at ring
    step ``s`` (source block ``(p + s) % P``): local destination offset,
    source offset *within the rotating block*, and edge value (0-padded).
    """

    rows: jax.Array     # (P, P, Emax) int32
    cols: jax.Array     # (P, P, Emax) int32
    vals: jax.Array     # (P, P, Emax) f32
    n_nodes: int
    n_parts: int
    rows_per_part: int

    @property
    def padded_nodes(self) -> int:
        return self.n_parts * self.rows_per_part


def build_ring_partition(graph: Graph, n_parts: int) -> RingPartition:
    """Group edges by (destination block, ring step) — host, one-time."""
    row = np.asarray(graph.row, np.int64)
    col = np.asarray(graph.col, np.int64)
    val = np.asarray(graph.val)
    n = graph.n_nodes
    nr = -(-n // n_parts)

    dst_block = row // nr
    src_block = col // nr
    # step at which device dst_block holds block src_block
    step = (src_block - dst_block) % n_parts

    groups = {}
    emax = 1
    for p in range(n_parts):
        on_p = dst_block == p
        for s in range(n_parts):
            m = on_p & (step == s)
            q = (p + s) % n_parts
            groups[(p, s)] = (row[m] - p * nr, col[m] - q * nr, val[m])
            emax = max(emax, int(m.sum()))

    rows_b = np.zeros((n_parts, n_parts, emax), np.int32)
    cols_b = np.zeros((n_parts, n_parts, emax), np.int32)
    vals_b = np.zeros((n_parts, n_parts, emax), np.float32)
    for (p, s), (r, c, v) in groups.items():
        e = len(r)
        rows_b[p, s, :e] = r
        cols_b[p, s, :e] = c
        vals_b[p, s, :e] = v
    return RingPartition(
        rows=jnp.asarray(rows_b), cols=jnp.asarray(cols_b),
        vals=jnp.asarray(vals_b), n_nodes=n, n_parts=n_parts,
        rows_per_part=nr)


def _ring_local(x_local, rows, cols, vals, *, nr, n_parts):
    # shard_map keeps rank: squeeze the sharded leading axis (size 1/device)
    x_local = x_local.reshape(nr, -1)
    rows = rows.reshape(n_parts, -1)
    cols = cols.reshape(n_parts, -1)
    vals = vals.reshape(n_parts, -1)
    ring = [(i, (i - 1) % n_parts) for i in range(n_parts)]

    def body(carry, inp):
        x_cur, step = carry
        r, c, v = inp
        gathered = x_cur[c] * v[:, None].astype(x_cur.dtype)
        acc = jax.ops.segment_sum(gathered, r, num_segments=nr)
        # rotate blocks backwards so device p receives block (p+s)%P next;
        # the final rotation returns blocks to their owners, which keeps the
        # loop body uniform and gives XLA a fixed overlap pattern
        x_nxt = jax.lax.ppermute(x_cur, EDGE_AXIS, ring)
        return (x_nxt, step + 1), acc

    (_, _), accs = jax.lax.scan(body, (x_local, 0), (rows, cols, vals))
    return accs.sum(axis=0)[None]  # restore the sharded leading axis


def ring_spmm(part: RingPartition, x: jax.Array, mesh: Mesh) -> jax.Array:
    """``out = A @ X`` with X row-sharded over the mesh's edge axis and
    feature blocks rotated around the ring (one ``ppermute`` per step)."""
    nr, n_parts = part.rows_per_part, part.n_parts
    pad = part.padded_nodes - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    xs = x.reshape(n_parts, nr, x.shape[1])

    fn = jax.shard_map(
        partial(_ring_local, nr=nr, n_parts=n_parts),
        mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=P(EDGE_AXIS),
    )
    out = fn(xs, part.rows, part.cols, part.vals)
    out = out.reshape(part.padded_nodes, -1)
    return out[: part.n_nodes]
