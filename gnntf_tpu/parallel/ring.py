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

from collections import OrderedDict
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.coo import Graph
from .dist import EDGE_AXIS


@dataclass(frozen=True)
class RingPartition:
    """Host-precomputed schedule for :func:`ring_spmm`.

    ``rows/cols[p, s, e]`` — the edges device ``p`` applies at ring step
    ``s`` (source block ``(p + s) % P``): local destination offset and
    source offset *within the rotating block* (0-padded).  ``edge_slot``
    maps each *original* edge to its flat slot in that grid so live
    (possibly traced) edge values can be scattered per call; ``base_val``
    holds the build-time values for the ``val=None`` path.  Leaves are
    numpy (trace-safe constants).
    """

    rows: np.ndarray       # (P, P, Emax) int32
    cols: np.ndarray       # (P, P, Emax) int32
    edge_slot: np.ndarray  # (E,) int64 — original edge -> flat grid slot
    base_val: np.ndarray   # (E,)
    n_nodes: int
    n_edges: int
    n_parts: int
    rows_per_part: int

    @property
    def padded_nodes(self) -> int:
        return self.n_parts * self.rows_per_part

    @property
    def edges_per_group(self) -> int:
        return int(self.rows.shape[2])

    @property
    def vals(self) -> np.ndarray:
        """Build-time values in grid layout (diagnostics/tests)."""
        grid = np.zeros(self.n_parts * self.n_parts * self.edges_per_group,
                        self.base_val.dtype)
        grid[self.edge_slot] = self.base_val
        return grid.reshape(self.rows.shape)


def build_ring_partition(graph: Graph, n_parts: int) -> RingPartition:
    """Group edges by (destination block, ring step) — host, one-time,
    vectorized (one stable sort over (block, step), no per-edge loops)."""
    row = np.asarray(graph.row, np.int64)
    col = np.asarray(graph.col, np.int64)
    val = np.asarray(graph.val)
    e = row.shape[0]
    n = graph.n_nodes
    nr = -(-n // n_parts)

    dst_block = row // nr
    src_block = col // nr
    # step at which device dst_block holds block src_block
    step = (src_block - dst_block) % n_parts

    gid = dst_block * n_parts + step           # (p, s) group id
    order = np.argsort(gid, kind="stable")
    gid_s = gid[order]
    counts = np.bincount(gid_s, minlength=n_parts * n_parts)
    emax = max(1, int(counts.max()) if e else 1)
    starts = np.zeros(n_parts * n_parts + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(e, dtype=np.int64) - starts[gid_s]
    slot_sorted = gid_s * emax + pos
    edge_slot = np.empty(e, np.int64)
    edge_slot[order] = slot_sorted

    q = (dst_block + step) % n_parts           # source block at that step
    rows_b = np.zeros((n_parts, n_parts, emax), np.int32)
    cols_b = np.zeros((n_parts, n_parts, emax), np.int32)
    rows_b.reshape(-1)[edge_slot] = (row - dst_block * nr).astype(np.int32)
    cols_b.reshape(-1)[edge_slot] = (col - q * nr).astype(np.int32)
    return RingPartition(
        rows=rows_b, cols=cols_b, edge_slot=edge_slot,
        base_val=np.asarray(val), n_nodes=n, n_edges=e, n_parts=n_parts,
        rows_per_part=nr)


def _ring_local_drop(x_local, rows, cols, vals, eids, salt, *, nr, n_parts,
                     keep, n_drop):
    """Grid-resident dropout variant: the device's whole (P, Emax) value
    grid is masked once from the constant edge-id grid before the ring
    scan — no per-edge value routing (parallel/dropgrids.py)."""
    from ..ops.stochastic import dropped_values
    vals = dropped_values(vals.reshape(-1), eids.reshape(-1), salt, keep,
                          n_drop).reshape(vals.shape)
    return _ring_local(x_local, rows, cols, vals, nr=nr, n_parts=n_parts)


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


def ring_spmm(part: RingPartition, x: jax.Array, mesh: Mesh,
              val=None, *, val_grid=None, eid_grid=None,
              drop=None) -> jax.Array:
    """``out = A @ X`` with X row-sharded over the mesh's edge axis and
    feature blocks rotated around the ring (one ``ppermute`` per step).

    ``val`` — live per-edge values in the original edge order (traced
    values from dropout/renormalization are fine); defaults to the
    build-time values.  ``drop`` + ``val_grid``/``eid_grid`` select the
    grid-resident dropout path (no per-edge value routing; see
    halo.halo_spmm)."""
    nr, n_parts = part.rows_per_part, part.n_parts
    pad = part.padded_nodes - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    xs = x.reshape(n_parts, nr, x.shape[1])

    if drop is not None:
        salt, keep, n_drop = drop
        fn = jax.shard_map(
            partial(_ring_local_drop, nr=nr, n_parts=n_parts, keep=keep,
                    n_drop=n_drop),
            mesh=mesh,
            in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                      P(EDGE_AXIS), P(EDGE_AXIS), P()),
            out_specs=P(EDGE_AXIS),
        )
        out = fn(xs, part.rows, part.cols, val_grid, eid_grid, salt)
        return out.reshape(part.padded_nodes, -1)[: part.n_nodes]

    if val is None:
        val = jnp.asarray(part.base_val)
    if val.shape[0] != part.n_edges:
        raise ValueError(
            f"ring partition built for {part.n_edges} edges, got values "
            f"for {val.shape[0]}")
    grid = jnp.zeros((n_parts * n_parts * part.edges_per_group,), val.dtype)
    grid = grid.at[jnp.asarray(part.edge_slot)].set(val, unique_indices=True)
    vals = grid.reshape(n_parts, n_parts, part.edges_per_group)

    fn = jax.shard_map(
        partial(_ring_local, nr=nr, n_parts=n_parts),
        mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=P(EDGE_AXIS),
    )
    out = fn(xs, part.rows, part.cols, vals)
    out = out.reshape(part.padded_nodes, -1)
    return out[: part.n_nodes]


class RingExecutor:
    """An ``ops.spmm`` executor override routing every propagation layer's
    SpMM through :func:`ring_spmm` — the ring-rotation counterpart of
    ``halo.HaloExecutor`` (same caching discipline: partitions built
    host-side per graph *structure*, keyed on ``id(row)`` with a strong
    reference pinned in the value, bounded LRU).

    ``fit(mesh=..., spmm="ring")`` installs one around the jitted train and
    eval steps; live (possibly traced) edge values — per-step edge dropout
    and renormalization included — flow through ``ring_spmm``'s value
    scatter."""

    _CACHE_MAX = 16
    supports_lazy_dropout = True  # see HaloExecutor / ops.spmm dispatcher

    def __init__(self, mesh: Mesh, n_parts: Optional[int] = None):
        self.mesh = mesh
        self.n_parts = int(mesh.shape[EDGE_AXIS]) if n_parts is None \
            else n_parts
        self._plans: OrderedDict = OrderedDict()

    def partition_for(self, graph: Graph) -> RingPartition:
        key = (id(graph.row), id(graph.col), graph.n_nodes)
        hit = self._plans.get(key)
        if hit is not None and hit[0] is graph.row and hit[1] is graph.col:
            self._plans.move_to_end(key)
            return hit[2]
        if isinstance(graph.row, jax.core.Tracer):
            raise TypeError(
                "RingExecutor needs a concrete edge structure; the graph "
                "row/col arrived as tracers (close over the graph instead "
                "of passing it as a jit argument)")
        structure = Graph(
            row=np.asarray(graph.row), col=np.asarray(graph.col),
            val=np.ones(graph.n_edges, np.float32), n_nodes=graph.n_nodes,
            num_self_loop=graph.num_self_loop,
            sorted_by_row=graph.sorted_by_row)
        plan = build_ring_partition(structure, self.n_parts)
        self._plans[key] = (graph.row, graph.col, plan)
        while len(self._plans) > self._CACHE_MAX:
            self._plans.popitem(last=False)
        return plan

    def __call__(self, graph: Graph, x: jax.Array) -> jax.Array:
        if graph.scaled or graph.eye_weight != 0.0:
            # dispatch normally peels scales/eye; direct calls too
            from ..ops.spmm import _scaled_call
            return _scaled_call(self, graph, x)
        plan = self.partition_for(graph)
        from .dropgrids import executor_drop_state
        state = executor_drop_state(plan, graph, plan.rows.shape)
        if state is not None:
            vg, eg, drop = state
            return ring_spmm(plan, x, self.mesh, val_grid=vg, eid_grid=eg,
                             drop=drop)
        return ring_spmm(plan, x, self.mesh, graph.materialized_dropout().val)
