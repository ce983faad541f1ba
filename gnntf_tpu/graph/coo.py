"""Graph representation: COO edge lists as JAX arrays.

TPU-first design notes
----------------------
The whole framework operates on a static-shape COO edge list sorted by
destination row.  Sorting by destination makes the scatter-accumulate of the
SpMM (`segment_sum`) locality-friendly and lets kernels assume
``indices_are_sorted=True``.  All shapes are static so every training step is
a single XLA compilation.

Behavioral parity with the reference (`/root/reference`):
  * ``graph2adj`` semantics — edges carry a ``weight`` (default 1.0) and an
    undirected graph is built by appending the reversed edge list, which
    *sums* duplicate (u, v)/(v, u) pairs implicitly
    (reference: gnntf/core/gnn/graph_manipulation.py:24-31).
  * Node ids follow graph-iteration order
    (reference: gnntf/core/gnn/graph_manipulation.py:19-21).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """A sparse adjacency matrix ``A`` with ``A[row[e], col[e]] = val[e]``.

    ``row`` is the destination of a message and ``col`` the source, matching
    the reference convention ``out = A @ X`` (row i aggregates columns j).

    ``num_self_loop`` marks how many *trailing* entries are synthetic
    self-loop (identity) entries appended by :func:`add_self_loops`; edge
    dropout never touches them (the reference adds the eye *after* dropout,
    gnntf/core/gnn/gnn.py:37-39).

    **Lazy diagonal scaling** (``row_scale``/``col_scale``, per-node
    vectors): the effective matrix is ``diag(row_scale) A diag(col_scale)``.
    Normalization (D^{-1/2} A D^{-1/2} etc.) stores its degree vectors here
    instead of scaling every edge value: per-edge scaling costs two E-sized
    scalar gathers per layer per step (the TPU gather unit sustains only
    ~10^8 rows/s), while the SpMM applies the same math as two (N, F)
    row-wise multiplies around the product —
    ``D ⊙ (A @ (D ⊙ x)) == (D A D) @ x`` exactly, up to float
    reassociation.  ``None`` means identity.  Use :meth:`materialized` when
    per-edge values are genuinely needed.

    **Lazy counter-based edge dropout** (``drop_salt``/``drop_keep``/
    ``drop_n``): when ``drop_salt`` is set, the effective edge values are
    ``val[e] * mask(e)/drop_keep`` for ``e < drop_n`` (``mask(e)`` a pure
    hash of the edge id and the salts — ops/stochastic.py) and ``val[e]``
    unchanged for trailing self-loop entries.  Keeping the draw symbolic
    lets every SpMM layout recompute the identical realized mask from its
    own constant edge-id grids, removing all per-layer E-sized
    gather/scatter traffic from the training path.  Applied *before* the
    lazy scales (dropout happens before renormalization, reference
    gnn.py:36-47).

    **Lazy post-scale identity** (``eye_weight``): the effective matrix is
    ``diag(row_scale) A diag(col_scale) + eye_weight * I``.  This is how
    self-loops added *after* normalization (reference ``add_eye='after'``,
    gnn.py:48-49) stay lazy: ``(A_norm + wI) @ x == A_norm @ x + w*x``
    exactly, so the SpMM adds ``w*x`` instead of extending the edge list —
    which would force materializing the (traced, under dropout) scales
    into per-edge values and knock the training path off the grid-resident
    formulation.
    """

    row: jax.Array            # [E] int32 destination ids
    col: jax.Array            # [E] int32 source ids
    val: jax.Array            # [E] float edge weights
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_self_loop: int = dataclasses.field(default=0, metadata=dict(static=True))
    sorted_by_row: bool = dataclasses.field(default=False, metadata=dict(static=True))
    row_scale: Optional[jax.Array] = None   # [N] or None (identity)
    col_scale: Optional[jax.Array] = None   # [N] or None (identity)
    drop_salt: Optional[jax.Array] = None   # (2,) uint32 or None (no dropout)
    drop_keep: float = dataclasses.field(default=1.0, metadata=dict(static=True))
    drop_n: int = dataclasses.field(default=0, metadata=dict(static=True))
    eye_weight: float = dataclasses.field(default=0.0, metadata=dict(static=True))

    @property
    def n_edges(self) -> int:
        return int(self.row.shape[0])

    @property
    def shape(self):
        return (self.n_nodes, self.n_nodes)

    @property
    def scaled(self) -> bool:
        return self.row_scale is not None or self.col_scale is not None

    @property
    def dropped(self) -> bool:
        return self.drop_salt is not None

    def materialized_dropout(self) -> "Graph":
        """Fold the lazy edge-dropout into per-edge values (elementwise on
        the edge list — the exact realization every grid computes; scales
        are left lazy)."""
        if not self.dropped:
            return self
        from ..ops.stochastic import materialize_dropped
        return dataclasses.replace(self, val=materialize_dropped(self),
                                   drop_salt=None, drop_keep=1.0, drop_n=0)

    def materialized(self) -> "Graph":
        """Fold the lazy dropout, diagonal scales and post-scale identity
        into per-edge values (the scale fold costs two E-sized gathers —
        the cost the lazy representation exists to avoid; call only where
        per-edge values are required)."""
        self = self.materialized_dropout()
        if self.scaled:
            val = self.val
            if self.row_scale is not None:
                val = val * self.row_scale[self.row].astype(val.dtype)
            if self.col_scale is not None:
                val = val * self.col_scale[self.col].astype(val.dtype)
            self = dataclasses.replace(self, val=val, row_scale=None,
                                       col_scale=None)
        if self.eye_weight != 0.0:
            self = _append_eye(dataclasses.replace(self, eye_weight=0.0),
                               self.eye_weight)
        return self

    def to_dense(self) -> jax.Array:
        """Densify (testing only)."""
        g = self.materialized()
        a = jnp.zeros(g.shape, g.val.dtype)
        return a.at[g.row, g.col].add(g.val)


def from_edges(
    src,
    dst,
    values=None,
    *,
    n_nodes: Optional[int] = None,
    directed: bool = True,
    sort: bool = True,
    dtype=jnp.float32,
) -> Graph:
    """Build a :class:`Graph` from edge arrays.

    With ``directed=False`` the reversed edges are appended (duplicates sum —
    exact reference convention, graph_manipulation.py:29).
    """
    src = np.asarray(src, np.int32).reshape(-1)
    dst = np.asarray(dst, np.int32).reshape(-1)
    if values is None:
        values = np.ones(src.shape[0], np.float64)
    values = np.asarray(values, np.float64).reshape(-1)
    if src.shape != dst.shape or src.shape != values.shape:
        raise ValueError("src/dst/values must have the same length")
    if n_nodes is None:
        n_nodes = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    # Reference stores indices [u, v] where the edge u->v contributes to row u
    # aggregating from column v after symmetrization; A[u, v] means message
    # v -> u during A @ X.
    row, col = src, dst
    if not directed:
        row = np.concatenate([src, dst])
        col = np.concatenate([dst, src])
        values = np.concatenate([values, values])
    if sort:
        order = None
        if row.shape[0] >= 100_000:  # native radix sort pays off at scale
            try:
                from ..utils.native import lexsort_edges
                order = lexsort_edges(row, col)
            except Exception:
                order = None
        if order is None:
            order = np.lexsort((col, row))
        row, col, values = row[order], col[order], values[order]
    return Graph(
        row=jnp.asarray(row, jnp.int32),
        col=jnp.asarray(col, jnp.int32),
        val=jnp.asarray(values, dtype),
        n_nodes=n_nodes,
        sorted_by_row=sort,
    )


def _append_eye(graph: Graph, weight: float) -> Graph:
    """Structurally append N identity entries to an *unscaled* graph.
    Lazy-dropout fields survive: the appended entries sit at edge ids
    ``>= drop_n``, which the counter-based mask exempts by construction
    (ops/stochastic.keep_mask), exactly the reference's
    dropout-then-add-eye order (gnn.py:37-39)."""
    n = graph.n_nodes
    eye = jnp.arange(n, dtype=jnp.int32)
    return dataclasses.replace(
        graph,
        row=jnp.concatenate([graph.row, eye]),
        col=jnp.concatenate([graph.col, eye]),
        val=jnp.concatenate(
            [graph.val, jnp.full((n,), weight, graph.val.dtype)]),
        num_self_loop=graph.num_self_loop + n,
        sorted_by_row=False,
    )


# Extended-structure memo: add_eye='before' runs once per layer per trace,
# and the per-layer results must be the *same array objects* so the
# SpMM layout/grid caches (identity-keyed) hit across layers and traces.
_EYE_CACHE = None  # lazily constructed IdLRU (avoids import cycle at load)


def add_self_loops(graph: Graph, weight: float = 1.0) -> Graph:
    """Add N identity entries (kept out of edge dropout).

    Mirrors ``tf.sparse.add(graph, tf.sparse.eye(n))``
    (reference gnn.py:38-39, :48-49); duplicate entries are summed
    implicitly by downstream segment sums.

    Lazy-friendly on both reference paths:

    * ``add_eye='after'`` arrives with a *scaled* graph — the identity is
      kept symbolic as ``eye_weight`` (``A_norm @ x + w*x``, exact), so
      neither the (possibly traced) scales nor the dropout are
      materialized.
    * ``add_eye='before'`` arrives unscaled — the structure is extended
      concretely (memoized so every layer shares one extension and the
      layout caches hit) and lazy dropout fields survive untouched.
    """
    if graph.scaled:
        return dataclasses.replace(graph,
                                   eye_weight=graph.eye_weight + weight)
    concrete = not any(isinstance(a, jax.core.Tracer)
                       for a in (graph.row, graph.col, graph.val))
    if not concrete:
        return _append_eye(graph, weight)
    global _EYE_CACHE
    if _EYE_CACHE is None:
        from ..utils.idcache import IdLRU
        _EYE_CACHE = IdLRU()
    # n_nodes is part of the key: a graph sharing edge arrays but sized
    # differently (padded/grown node set) must not reuse the extension
    key = ("eye", id(graph.row), id(graph.col), id(graph.val),
           float(weight), graph.num_self_loop, graph.n_nodes)
    anchors = (graph.row, graph.col, graph.val)
    ext = _EYE_CACHE.get(key, anchors)
    if ext is None:
        base = dataclasses.replace(graph, drop_salt=None, drop_keep=1.0,
                                   drop_n=0)
        # keep the build eager even mid-trace: the cached arrays must be
        # concrete, not staged tracers (omnistaging)
        with jax.ensure_compile_time_eval():
            ext = _append_eye(base, weight)
        _EYE_CACHE.put(key, anchors, ext)
    # reattach the caller's (possibly traced) lazy-dropout state
    return dataclasses.replace(ext, drop_salt=graph.drop_salt,
                               drop_keep=graph.drop_keep,
                               drop_n=graph.drop_n)
