"""Explicit halo-exchange SpMM over a shard_map device mesh.

The GNN analogue of sequence parallelism (SURVEY §5.7): node features are
sharded by contiguous row range, each device owns the edges whose
*destination* falls in its range, and the only communication is an
``all_to_all`` of exactly the boundary ("halo") source rows each device
needs — not a full feature all-gather.  XLA lowers the all_to_all onto
ICI; the local aggregation is the same sorted segment-sum the single-chip
path uses.  Fully differentiable (all_to_all and segment_sum both carry
gradients), so it drops into a jitted train step.

No reference counterpart (the reference is single-device eager TF,
SURVEY §2.4).  Correctness is CI-tested on an 8-device virtual CPU mesh
against the dense oracle, including gradients.

Layout (host-precomputed, static shapes):
  * nodes padded to ``P * Nr``; device p owns rows [p*Nr, (p+1)*Nr);
  * ``send_idx[q, p, s]`` — local row indices device q sends to device p
    (padded with 0; duplicates are harmless);
  * per-device edge list (rows/cols/vals padded with zero-value entries),
    with cols remapped into the concatenated [own rows | halo] table:
    col c owned by q != p maps to Nr + q*S + position of c in
    ``send_idx[q, p]``.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.coo import Graph
from .dist import EDGE_AXIS


@dataclass(frozen=True)
class HaloPartition:
    """Host-precomputed partition plan for :func:`halo_spmm`."""

    rows: jax.Array       # (P, Emax) int32 — local destination offsets
    cols: jax.Array       # (P, Emax) int32 — remapped source positions
    vals: jax.Array       # (P, Emax) f32
    send_idx: jax.Array   # (P, P, S) int32 — send_idx[q, p]: q -> p rows
    n_nodes: int          # true (unpadded) node count
    n_parts: int
    rows_per_part: int
    halo_size: int        # S

    @property
    def padded_nodes(self) -> int:
        return self.n_parts * self.rows_per_part


def build_halo_partition(graph: Graph, n_parts: int) -> HaloPartition:
    """Partition a (row-sorted) graph for halo execution (host, one-time)."""
    row = np.asarray(graph.row, np.int64)
    col = np.asarray(graph.col, np.int64)
    val = np.asarray(graph.val)
    n = graph.n_nodes
    nr = -(-n // n_parts)

    owner = row // nr
    send_lists = [[[] for _ in range(n_parts)] for _ in range(n_parts)]
    # per-partition remap of needed remote cols
    part_edges = []
    for p in range(n_parts):
        mask = owner == p
        r = row[mask] - p * nr
        c = col[mask]
        v = val[mask]
        c_owner = c // nr
        remote_pos = np.empty_like(c)
        # own cols map directly
        own = c_owner == p
        remote_pos[own] = c[own] - p * nr
        for q in range(n_parts):
            if q == p:
                continue
            m = c_owner == q
            if not np.any(m):
                continue
            needed = np.unique(c[m])
            send_lists[q][p] = (needed - q * nr).tolist()
            lookup = {int(cc): i for i, cc in enumerate(needed)}
            # positions filled after S is known — store (q, local index)
            remote_pos[m] = np.asarray(
                [lookup[int(cc)] for cc in c[m]], np.int64)
        part_edges.append((r, c, v, c_owner, remote_pos))

    S = max(1, max((len(send_lists[q][p]) for q in range(n_parts)
                    for p in range(n_parts)), default=1))
    emax = max(1, max(len(pe[0]) for pe in part_edges))

    rows_b = np.zeros((n_parts, emax), np.int32)
    cols_b = np.zeros((n_parts, emax), np.int32)
    vals_b = np.zeros((n_parts, emax), np.float32)
    send = np.zeros((n_parts, n_parts, S), np.int32)
    for q in range(n_parts):
        for p in range(n_parts):
            lst = send_lists[q][p]
            send[q, p, :len(lst)] = lst
    for p, (r, c, v, c_owner, remote_pos) in enumerate(part_edges):
        e = len(r)
        rows_b[p, :e] = r
        vals_b[p, :e] = v
        own = c_owner == p
        final = np.where(own, remote_pos,
                         nr + c_owner * S + remote_pos)
        cols_b[p, :e] = final
    return HaloPartition(
        rows=jnp.asarray(rows_b), cols=jnp.asarray(cols_b),
        vals=jnp.asarray(vals_b), send_idx=jnp.asarray(send),
        n_nodes=n, n_parts=n_parts, rows_per_part=nr, halo_size=S)


def _local_spmm(x_local, send_local, rows, cols, vals, *, nr, n_parts, s):
    # shard_map keeps rank: squeeze the sharded leading axis (size 1/device)
    x_local = x_local.reshape(nr, -1)
    send_local = send_local.reshape(n_parts, s)
    rows = rows.reshape(-1)
    cols = cols.reshape(-1)
    vals = vals.reshape(-1)
    send = x_local[send_local.reshape(-1)].reshape(n_parts, s, -1)
    halo = jax.lax.all_to_all(send, EDGE_AXIS, split_axis=0, concat_axis=0,
                              tiled=False)
    table = jnp.concatenate([x_local, halo.reshape(n_parts * s, -1)], axis=0)
    gathered = table[cols] * vals[:, None].astype(x_local.dtype)
    out = jax.ops.segment_sum(gathered, rows, num_segments=nr)
    return out[None]  # restore the sharded leading axis


def halo_spmm(part: HaloPartition, x: jax.Array, mesh: Mesh) -> jax.Array:
    """``out = A @ X`` with X row-sharded over the mesh's edge axis.

    ``x`` must be the full (possibly unpadded) feature matrix; it is padded
    to ``P * Nr`` rows, sharded, multiplied, and unpadded."""
    nr, np_, s = part.rows_per_part, part.n_parts, part.halo_size
    pad = part.padded_nodes - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    xs = x.reshape(np_, nr, x.shape[1])

    fn = jax.shard_map(
        partial(_local_spmm, nr=nr, n_parts=np_, s=s),
        mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                  P(EDGE_AXIS)),
        out_specs=P(EDGE_AXIS),
    )
    out = fn(xs, part.send_idx, part.rows, part.cols, part.vals)
    out = out.reshape(part.padded_nodes, -1)
    return out[: part.n_nodes]
