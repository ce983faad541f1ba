"""Grid-resident edge dropout for the distributed executors.

Round-3 gap (VERDICT #2): the SpMM dispatcher handed the halo/ring
executors *materialized* per-edge values, so multi-chip training paid an
E-sized value scatter per layer per step — exactly the routing cost the
counter-based stochastic path (ops/stochastic.py) eliminated on one chip.
The enabling invariant carries over unchanged: an edge's dropout decision
is a pure hash of its edge id and the step's salts, so ANY layout that
stores a constant slot -> edge-id map can recompute the identical
realized mask locally.

This module builds, once per (partition plan, base values):

* ``val_grid`` — the plan's padded value grid with the *base* (undropped)
  edge values routed in (device-side eager scatter, one time);
* ``eid_grid`` — the constant slot -> original-edge-id grid (host numpy).

Per layer per step the executor then computes
``dropped_values(val_grid, eid_grid, salt, keep, n_drop)`` — pure
elementwise VPU work — *inside* the shard_map region, each device over
its own slice.  No per-edge value ever moves between layouts or devices;
the only traced input is the (2,)-uint32 salt, replicated.

Padding slots carry value 0 and edge id 0; whatever the mask decides for
id 0, a zero value contributes nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.coo import Graph
from ..utils.idcache import IdLRU

_GRID_CACHE = IdLRU()


def plan_value_grids(plan, graph: Graph, shape):
    """(val_grid, eid_grid) for ``plan`` (any partition type exposing
    ``edge_slot``/``n_edges``) shaped like the plan's edge grid.

    Cached per (plan, base-values) identity.  ``graph.val`` must be
    concrete; the scatter runs eagerly on device (no host round-trip —
    fetching E values back through a remote-TPU tunnel is orders of
    magnitude slower than an on-device scatter)."""
    n_slots = 1
    for d in shape:
        n_slots *= int(d)
    key = ("plangrid", id(plan.edge_slot), id(graph.val), tuple(shape))
    anchors = (plan.edge_slot, graph.val)
    hit = _GRID_CACHE.get(key, anchors)
    if hit is None:
        eid = np.zeros(n_slots, np.uint32)
        eid[plan.edge_slot] = np.arange(plan.n_edges, dtype=np.uint32)
        with jax.ensure_compile_time_eval():
            vg = jnp.zeros((n_slots,), graph.val.dtype)
            vg = vg.at[jnp.asarray(plan.edge_slot)].set(
                graph.val, unique_indices=True).reshape(shape)
        hit = (vg, eid.reshape(shape))
        _GRID_CACHE.put(key, anchors, hit)
    return hit


def executor_drop_state(plan, graph: Graph, shape):
    """The executor-facing entry: returns ``(val_grid, eid_grid,
    (salt, keep, n_drop))`` when ``graph`` is lazily dropped with concrete
    base values (the grid-resident fast path applies), else ``None``."""
    if not graph.dropped or any(
            isinstance(a, jax.core.Tracer)
            for a in (graph.row, graph.col, graph.val)):
        return None
    vg, eg = plan_value_grids(plan, graph, shape)
    return vg, eg, (graph.drop_salt, graph.drop_keep, graph.drop_n)
