"""Explicit halo-exchange SpMM over a shard_map device mesh.

The GNN analogue of sequence parallelism (SURVEY §5.7): node features are
sharded by contiguous row range, each device owns the edges whose
*destination* falls in its range, and the only communication is an
``all_to_all`` of exactly the boundary ("halo") source rows each device
needs — not a full feature all-gather.  XLA lowers the all_to_all onto
ICI; the local aggregation is the same sorted segment-sum the single-chip
path uses.  Fully differentiable (all_to_all, all_gather and segment_sum
all carry gradients), so it drops into a jitted train step —
``fit(mesh=..., spmm="halo")`` routes every propagation layer through it.

**Degree-skew robustness (hub replication).**  The all_to_all buffer is
padded to the *largest* pairwise send list, so on power-law graphs a
single 10K-degree hub would inflate every device's buffer.  Source nodes
whose rows are needed by ``hub_fanout``-or-more remote partitions are
therefore taken off the pairwise path entirely and served by one small
``all_gather`` of just those rows (each device contributes the hubs it
owns); the pairwise ``S`` then reflects only genuinely local boundary
traffic.  The gathered-table layout per device is
``[own rows | pairwise halo (P*S) | replicated hubs (P*Hq)]``.

**Live edge values.**  The partition stores an edge -> slot permutation,
not baked values: :func:`halo_spmm` scatters the caller's (possibly
traced) per-edge values into the padded per-device grid at call time, so
per-step edge dropout and renormalization flow through the executor.

No reference counterpart (the reference is single-device eager TF,
SURVEY §2.4).  Correctness is CI-tested on an 8-device virtual CPU mesh
against the dense oracle, including gradients and a 10K-degree-hub graph.
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
class HaloPartition:
    """Host-precomputed partition plan for :func:`halo_spmm`.

    Leaves are numpy on purpose (trace-safe constants; the plan may be
    closed over by a jitted train step).
    """

    rows: np.ndarray       # (P, Emax) int32 — local destination offsets
    cols: np.ndarray       # (P, Emax) int32 — positions in the local table
    edge_slot: np.ndarray  # (E,) int64 — original edge -> flat (P*Emax) slot
    base_val: np.ndarray   # (E,) — build-time edge values (val=None path)
    send_idx: np.ndarray   # (P, P, S) int32 — send_idx[q, p]: q -> p rows
    hub_idx: np.ndarray    # (P, Hq) int32 — hub rows each owner contributes
    n_nodes: int           # true (unpadded) node count
    n_edges: int
    n_parts: int
    rows_per_part: int
    halo_size: int         # S — pairwise all_to_all rows per (q, p)
    hub_rows: int          # Hq — all_gather rows per owner (0 = no hubs)

    @property
    def padded_nodes(self) -> int:
        return self.n_parts * self.rows_per_part

    @property
    def edges_per_part(self) -> int:
        return int(self.rows.shape[1])

    @property
    def halo_bytes_per_device(self) -> int:
        """all_to_all + all_gather payload rows (x4 bytes per feature)."""
        return 4 * (self.n_parts * self.halo_size
                    + self.n_parts * self.hub_rows)


def build_halo_partition(graph: Graph, n_parts: int, *, hub_fanout: int = 3,
                         max_hubs: int = 4096,
                         halo_cap: Optional[int] = -1) -> HaloPartition:
    """Partition a graph for halo execution (host, one-time, vectorized).

    ``hub_fanout`` — a source node needed by at least this many *remote*
    partitions is replicated via all_gather instead of the pairwise
    all_to_all (cap: ``max_hubs`` nodes, highest-fanout first).  Set
    ``hub_fanout=0`` to disable hub replication.

    ``halo_cap`` — hard bound on the per-pair all_to_all row count ``S``:
    any (sender, receiver) pair exceeding it spills its highest-fanout
    columns into the replicated hub table (spilling a column shrinks every
    pair that needs it), so one skewed boundary cannot inflate every
    device's padded buffer.  ``-1`` (default) = auto (the 95th percentile
    of nonzero pair sizes, at least 64); ``None`` = uncapped.
    """
    row = np.asarray(graph.row, np.int64)
    col = np.asarray(graph.col, np.int64)
    val = np.asarray(graph.val)
    e = row.shape[0]
    n = graph.n_nodes
    nr = -(-n // n_parts)

    # sort edges by destination partition (stable keeps any row order)
    if e and np.any(row[1:] < row[:-1]):
        order = np.argsort(row, kind="stable")
    else:
        order = np.arange(e, dtype=np.int64)
    rs, cs = row[order], col[order]
    owner = rs // nr
    c_owner = cs // nr
    remote = c_owner != owner

    # remote fanout per source node = #distinct dest partitions needing it
    fanout = np.zeros(n, np.int64)
    if np.any(remote):
        upairs = np.unique(cs[remote] * n_parts + owner[remote])
        fan_nodes, fan = np.unique(upairs // n_parts, return_counts=True)
        fanout[fan_nodes] = fan

    # --- hub selection pass 1: global high-fanout nodes
    is_hub_node = np.zeros(n, bool)
    if hub_fanout > 0:
        cand = np.flatnonzero(fanout >= hub_fanout)
        if cand.shape[0] > max_hubs:
            keep = np.argsort(-fanout[cand], kind="stable")[:max_hubs]
            cand = cand[keep]
        is_hub_node[cand] = True

    def _pair_groups(mask):
        """Unique (dest p, col c) pairs among ``mask`` edges, grouped by
        (owner q, dest p) in (q, p, c) order.  Returns None when empty."""
        if not np.any(mask):
            return None
        pk = owner[mask] * (n + 1) + cs[mask]
        upk, inv = np.unique(pk, return_inverse=True)
        p_u = upk // (n + 1)
        c_u = upk % (n + 1)
        q_u = c_u // nr
        grp_order = np.lexsort((c_u, p_u, q_u))
        gk = q_u[grp_order] * n_parts + p_u[grp_order]
        new_grp = np.ones(gk.shape[0], bool)
        new_grp[1:] = gk[1:] != gk[:-1]
        grp_start_idx = np.flatnonzero(new_grp)
        grp_id = np.cumsum(new_grp) - 1
        rank_in_grp = np.arange(gk.shape[0]) - grp_start_idx[grp_id]
        counts = np.diff(np.append(grp_start_idx, gk.shape[0]))
        return upk, inv, grp_order, grp_id, rank_in_grp, counts

    # --- hub selection pass 2: cap spill.  One pass suffices — removing a
    # column only shrinks pair groups, so every group left after spilling
    # its over-cap members is within the cap.
    pairwise = remote & ~is_hub_node[cs]
    if halo_cap is not None and np.any(pairwise):
        grp = _pair_groups(pairwise)
        _, _, grp_order, grp_id, _, counts = grp
        cap = halo_cap if halo_cap > 0 else \
            max(64, int(np.percentile(counts, 95)))
        if int(counts.max()) > cap:
            upk = grp[0]
            c_u = (upk % (n + 1))[grp_order]
            # within each (q, p) group order by fanout ascending, so the
            # over-cap (spilled) members are the highest-fanout columns —
            # replicating those shrinks other pairs too
            sub = np.lexsort((fanout[c_u], grp_id))
            rank_f = np.arange(sub.shape[0]) - \
                np.flatnonzero(np.diff(np.append(-1, grp_id[sub])))[grp_id[sub]]
            spill = c_u[sub[rank_f >= cap]]
            is_hub_node[spill] = True
            pairwise = remote & ~is_hub_node[cs]

    # --- hub table layout (by owner, ascending node id)
    hub_pos = np.full(n, -1, np.int64)   # global hub slot (owner * Hq + rank)
    hub_rank = np.zeros(n, np.int64)     # rank within owner
    hq = 0
    hubs = np.flatnonzero(is_hub_node)
    if hubs.shape[0]:
        hub_owner = hubs // nr
        hub_counts = np.bincount(hub_owner, minlength=n_parts)
        hq = int(hub_counts.max())
        starts = np.zeros(n_parts + 1, np.int64)
        np.cumsum(hub_counts, out=starts[1:])
        rank = np.arange(hubs.shape[0]) - starts[hub_owner]
        hub_pos[hubs] = hub_owner * hq + rank
        hub_rank[hubs] = rank
    is_hub_edge = remote & (hub_pos[cs] >= 0)

    # --- pairwise send lists: unique (dest p, col c) among pairwise edges
    s = 1
    send = np.zeros((n_parts, n_parts, 1), np.int32)
    send_pos_of_edge = np.zeros(e, np.int64)
    grp = _pair_groups(pairwise)
    if grp is not None:
        upk, inv, grp_order, grp_id, rank_in_grp, counts = grp
        c_s = (upk % (n + 1))[grp_order]
        q_s = c_s // nr
        p_s = (upk // (n + 1))[grp_order]
        s = max(1, int(counts.max()))
        send = np.zeros((n_parts, n_parts, s), np.int32)
        send[q_s, p_s, rank_in_grp] = (c_s - q_s * nr).astype(np.int32)
        # table position of unique pair j (undo the lexsort):
        tbl = np.empty(upk.shape[0], np.int64)
        tbl[grp_order] = nr + q_s * s + rank_in_grp
        send_pos_of_edge[pairwise] = tbl[inv]

    # --- per-edge column remap into [own | halo P*S | hubs P*Hq]
    final_cols = np.where(
        pairwise, send_pos_of_edge,
        np.where(is_hub_edge, nr + n_parts * s + hub_pos[cs],
                 cs - owner * nr))

    # --- contiguous per-partition edge blocks + edge -> slot map
    part_count = np.bincount(owner, minlength=n_parts) if e else \
        np.zeros(n_parts, np.int64)
    emax = max(1, int(part_count.max()) if e else 1)
    estart = np.zeros(n_parts + 1, np.int64)
    np.cumsum(part_count, out=estart[1:])
    pos_in_part = np.arange(e, dtype=np.int64) - estart[owner]
    slot_sorted = owner * emax + pos_in_part
    edge_slot = np.empty(e, np.int64)
    edge_slot[order] = slot_sorted

    rows_b = np.zeros((n_parts, emax), np.int32)
    cols_b = np.zeros((n_parts, emax), np.int32)
    rows_b.reshape(-1)[slot_sorted] = (rs - owner * nr).astype(np.int32)
    cols_b.reshape(-1)[slot_sorted] = final_cols.astype(np.int32)

    hub_idx = np.zeros((n_parts, hq), np.int32)
    if hq:
        hub_nodes = np.flatnonzero(hub_pos >= 0)
        hub_idx[hub_nodes // nr, hub_rank[hub_nodes]] = \
            (hub_nodes % nr).astype(np.int32)

    return HaloPartition(
        rows=rows_b, cols=cols_b, edge_slot=edge_slot,
        base_val=np.asarray(val), send_idx=send, hub_idx=hub_idx,
        n_nodes=n, n_edges=e, n_parts=n_parts, rows_per_part=nr,
        halo_size=s, hub_rows=hq)


def _local_spmm_drop(x_local, vals, eids, salt, send, hub, rows, cols, *,
                     nr, n_parts, s, hq, keep, n_drop):
    """Grid-resident dropout variant: ``vals`` is the constant *base*
    value grid; the realized mask is recomputed locally from the constant
    edge-id grid and the (replicated, traced) salt — no E-sized value
    scatter or routing anywhere in the step (parallel/dropgrids.py)."""
    from ..ops.stochastic import dropped_values
    vals = dropped_values(vals.reshape(-1), eids.reshape(-1), salt, keep,
                          n_drop)
    return _local_spmm(x_local, vals, send, hub, rows, cols, nr=nr,
                       n_parts=n_parts, s=s, hq=hq)


def _local_spmm(x_local, vals, send, hub, rows, cols, *, nr, n_parts, s, hq):
    # shard_map keeps rank: squeeze the sharded leading axis (size 1/device)
    f = x_local.shape[-1]
    x_local = x_local.reshape(nr, f)
    vals = vals.reshape(-1)
    rows = jnp.asarray(rows.reshape(-1))
    cols = jnp.asarray(cols.reshape(-1))
    pieces = [x_local]
    out_rows = x_local[jnp.asarray(send.reshape(-1))].reshape(n_parts, s, f)
    halo = jax.lax.all_to_all(out_rows, EDGE_AXIS, split_axis=0,
                              concat_axis=0, tiled=False)
    pieces.append(halo.reshape(n_parts * s, f))
    if hq:
        mine = x_local[jnp.asarray(hub.reshape(-1))]
        hubs = jax.lax.all_gather(mine, EDGE_AXIS, axis=0, tiled=False)
        pieces.append(hubs.reshape(n_parts * hq, f))
    table = jnp.concatenate(pieces, axis=0)
    gathered = table[cols] * vals[:, None].astype(x_local.dtype)
    out = jax.ops.segment_sum(gathered, rows, num_segments=nr,
                              indices_are_sorted=False)
    return out[None]  # restore the sharded leading axis


def halo_spmm(part: HaloPartition, x: jax.Array, mesh: Mesh,
              val: Optional[jax.Array] = None, *, val_grid=None,
              eid_grid=None, drop=None) -> jax.Array:
    """``out = A @ X`` with X row-sharded over the mesh's edge axis.

    ``x`` is the full (possibly unpadded) feature matrix; it is padded to
    ``P * Nr`` rows, sharded, multiplied, and unpadded.  ``val`` — live
    per-edge values in the *original* edge order (traced values from
    dropout/renormalization are fine); defaults to the build-time values.

    Grid-resident dropout path (``drop=(salt, keep, n_drop)`` with
    ``val_grid``/``eid_grid`` from ``dropgrids.plan_value_grids``): no
    per-edge values are routed at all — each device recomputes the
    realized mask from its slice of the constant edge-id grid
    (VERDICT r3 #2; ops/stochastic.py invariant)."""
    nr, np_, s, hq = (part.rows_per_part, part.n_parts, part.halo_size,
                      part.hub_rows)
    pad = part.padded_nodes - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    xs = x.reshape(np_, nr, x.shape[1])

    if drop is not None:
        salt, keep, n_drop = drop
        fn = jax.shard_map(
            partial(_local_spmm_drop, nr=nr, n_parts=np_, s=s, hq=hq,
                    keep=keep, n_drop=n_drop),
            mesh=mesh,
            in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P(),
                      P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                      P(EDGE_AXIS)),
            out_specs=P(EDGE_AXIS),
        )
        out = fn(xs, val_grid, eid_grid, salt, part.send_idx, part.hub_idx,
                 part.rows, part.cols)
        return out.reshape(part.padded_nodes, -1)[: part.n_nodes]

    if val is None:
        val = jnp.asarray(part.base_val)
    if val.shape[0] != part.n_edges:
        raise ValueError(
            f"halo partition built for {part.n_edges} edges, got values for "
            f"{val.shape[0]} (self-loop-appending normalizations need the "
            "partition rebuilt on the extended structure)")
    grid = jnp.zeros((np_ * part.edges_per_part,), val.dtype)
    grid = grid.at[jnp.asarray(part.edge_slot)].set(val, unique_indices=True)
    vals = grid.reshape(np_, part.edges_per_part)

    fn = jax.shard_map(
        partial(_local_spmm, nr=nr, n_parts=np_, s=s, hq=hq),
        mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS),
                  P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=P(EDGE_AXIS),
    )
    out = fn(xs, vals, part.send_idx, part.hub_idx, part.rows, part.cols)
    out = out.reshape(part.padded_nodes, -1)
    return out[: part.n_nodes]


class HaloExecutor:
    """An ``ops.spmm`` executor override (``ops.spmm.set_spmm_executor``)
    routing every propagation layer's SpMM through :func:`halo_spmm` — or,
    on a hierarchical ``(edge_host, edge[, feat])`` mesh
    (``multihost.make_pod_mesh(hierarchical=True)``), through the
    DCN-aware 3-phase exchange (``hier_halo.hier_halo_spmm``), selected
    automatically from the mesh axis names.

    ``fit(mesh=..., spmm="halo")`` installs one around the jitted train and
    eval steps, so the *training* propagation — per-layer edge dropout and
    renormalized values included — runs as explicit halo all_to_all +
    local segment-sum instead of GSPMD sharding propagation.

    Partitions are built host-side per graph *structure* and cached with
    the same discipline as the ELL layout cache (``ops/spmm.py``): keyed on
    ``id(row)`` with a strong reference pinned in the value so a recycled
    id can never alias a dead graph's plan, bounded LRU.  Live (possibly
    traced) edge values flow through ``halo_spmm``'s value scatter;
    structures appended inside the trace (``add_eye``) are concrete
    constants, so plan building stays host-side.
    """

    _CACHE_MAX = 16
    # dispatcher contract: this executor understands Graph.drop_* fields
    # and applies the identical counter-based mask device-locally
    supports_lazy_dropout = True

    def __init__(self, mesh: Mesh, n_parts: Optional[int] = None, **build_kw):
        from .multihost import EDGE_HOST_AXIS
        self.mesh = mesh
        self.hierarchical = EDGE_HOST_AXIS in mesh.shape
        if self.hierarchical:
            self.n_hosts = int(mesh.shape[EDGE_HOST_AXIS])
            self.n_chips = int(mesh.shape[EDGE_AXIS])
            self.n_parts = self.n_hosts * self.n_chips
        else:
            self.n_parts = int(mesh.shape[EDGE_AXIS]) if n_parts is None \
                else n_parts
        self.build_kw = build_kw
        self._plans: OrderedDict = OrderedDict()

    def partition_for(self, graph: Graph):
        key = (id(graph.row), id(graph.col), graph.n_nodes)
        hit = self._plans.get(key)
        if hit is not None and hit[0] is graph.row and hit[1] is graph.col:
            self._plans.move_to_end(key)
            return hit[2]
        if isinstance(graph.row, jax.core.Tracer):
            raise TypeError(
                "HaloExecutor needs a concrete edge structure; the graph "
                "row/col arrived as tracers (close over the graph instead "
                "of passing it as a jit argument)")
        structure = Graph(
            row=np.asarray(graph.row), col=np.asarray(graph.col),
            val=np.ones(graph.n_edges, np.float32), n_nodes=graph.n_nodes,
            num_self_loop=graph.num_self_loop,
            sorted_by_row=graph.sorted_by_row)
        if self.hierarchical:
            from .hier_halo import build_hier_halo_partition
            plan = build_hier_halo_partition(structure, self.n_hosts,
                                             self.n_chips, **self.build_kw)
        else:
            plan = build_halo_partition(structure, self.n_parts,
                                        **self.build_kw)
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
        if self.hierarchical:
            from .hier_halo import hier_halo_spmm
            if state is not None:
                vg, eg, drop = state
                return hier_halo_spmm(plan, x, self.mesh, val_grid=vg,
                                      eid_grid=eg, drop=drop)
            return hier_halo_spmm(plan, x, self.mesh,
                                  graph.materialized_dropout().val)
        if state is not None:
            vg, eg, drop = state
            return halo_spmm(plan, x, self.mesh, val_grid=vg, eid_grid=eg,
                             drop=drop)
        return halo_spmm(plan, x, self.mesh, graph.materialized_dropout().val)
