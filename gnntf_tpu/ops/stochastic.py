"""Grid-resident stochastic adjacency: counter-based edge dropout.

The reference redraws sparse edge-dropout per layer per step and
renormalizes after every draw (gnntf/core/gnn/gnn.py:36-50,
layered.py:47-50).  Done literally on TPU that costs, per layer, a
Bernoulli draw over E values (~10 ms at 2.3M edges), an unsorted E-sized
segment-sum for the degrees (~18 ms) and E-sized scatter-adds to route the
dropped values into the SpMM layout (~18 ms each) — measured to be ~90% of
the whole training forward (experiments/train_breakdown.py, r3).

This module removes every per-layer E-sized gather/scatter from that path:

* **Counter-based masks.**  Edge ``e``'s dropout decision is a pure hash
  ``fmix32(fmix32(e ^ s0) ^ s1) -> uniform24 < keep`` of its edge id and
  two 32-bit salts derived from the layer's RNG key.  Because the mask is
  a *function of the edge id*, any layout that stores its slot -> edge-id
  map as a constant grid can recompute the exact same realized mask
  locally — no mask array ever moves between layouts.
* **Per-original-edge ELL grids.**  The graph structure is laid out once
  (host side) into a row-split ELL grid (for ``A @ x``) and a column-split
  twin (rows of ``A^T``).  Each ORIGINAL edge owns one slot in each grid
  (no duplicate coalescing — a scatter/segment-sum per step would cost
  more than the extra gather issue it saves; duplicates simply occupy
  their own slots and the k-reduce sums them).  Per layer the live values
  are ``val_grid * mask(eid_grid)/keep`` — pure elementwise VPU work
  (~2.6 ms per 2.3M-slot grid vs ~18 ms for a value-routing scatter).
* **Degrees from the column grid.**  Colsums of the dropped adjacency are
  a dense k-reduce plus a *sorted* virtual-column combine — replacing the
  unsorted E-sized ``segment_sum(val, col)`` of the naive path.
* **Gather-based transpose for the backward.**  ``d/dx (A @ x) = A^T @ g``;
  XLA's autodiff of a gather is an F-wide row *scatter* (measured ~47 ms
  per layer at bench scale).  The custom VJP here runs the transpose
  through the column grid instead — the same gather/k-reduce/combine
  shape as the forward (~13 ms).

Measured end to end (TPU v5e, 169K nodes / 2.33M edges / F=128, 10
propagation layers): forward 680 -> 158 ms, forward+backward 795 -> 291 ms.

No reference counterpart (the reference's training step is eager TF on
CPU); the behavioral contract it preserves is get_adjacency's
dropout -> renormalize -> propagate semantics, verified against the
per-edge materialized path in tests/test_stochastic.py.
"""
from __future__ import annotations

import contextvars
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.coo import Graph
from ..utils.idcache import IdLRU

# Graphs below this many edges keep the plain jax.random.bernoulli path
# (grid build cost + constants aren't worth it; parity-scale graphs are
# unaffected by design).
MIN_EDGES = 65_536

# Scoped override (advisor r4: dryrun/test harnesses used to monkeypatch
# the module global, which is process-wide and leaks through jit caches
# traced under the patched value).  The contextvar is per-thread and the
# scope is explicit; it must be live while the consuming step TRACES
# (post-compile the threshold is baked into the program — callers that
# re-enter with the same traced functions keep the traced behavior, which
# is also true of any other trace-time configuration).
_MIN_EDGES_VAR: contextvars.ContextVar[Optional[int]] = \
    contextvars.ContextVar("gnntf_min_edges", default=None)


def min_edges() -> int:
    """The effective lazy-dropout threshold: the scoped override if one is
    active, else the module default."""
    override = _MIN_EDGES_VAR.get()
    return MIN_EDGES if override is None else override


class min_edges_scope:
    """Context manager scoping the lazy-dropout edge threshold — for
    dryruns/tests that need the grid path on tiny graphs without mutating
    the process-global default."""

    def __init__(self, n: int):
        self.n = int(n)

    def __enter__(self):
        self._token = _MIN_EDGES_VAR.set(self.n)
        return self.n

    def __exit__(self, *exc):
        _MIN_EDGES_VAR.reset(self._token)
        return False
# row-split width shared with the deterministic ELL/hybrid formulations
# (ops/spmm.py) so a k retune there applies to the training grids too
from .spmm import _ELL_DEFAULT_K as _K  # noqa: E402  (cycle-safe: spmm
# imports this module only lazily inside functions)


def salts_from_key(rng: jax.Array) -> jax.Array:
    """Two uint32 salts from a PRNG key (old-style uint32 pairs and
    new-style typed keys both supported)."""
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        rng = jax.random.key_data(rng)
    return rng.reshape(-1)[:2].astype(jnp.uint32)


def _fmix32(x: jax.Array) -> jax.Array:
    """murmur3's 32-bit finalizer — full avalanche on sequential counters."""
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    return x


def keep_mask(eids: jax.Array, salt: jax.Array, keep: float,
              n_drop: int) -> jax.Array:
    """Boolean keep-decision per edge id.

    ``eids`` may be any shape (flat per-edge ids, or a layout's constant
    eid grid).  Entries with ``eid >= n_drop`` are never dropped — these
    are appended self-loop entries (the reference adds the eye after
    dropout, gnn.py:37-39) and layout padding (which carries value 0, so
    its mask is irrelevant but harmless)."""
    # BOTH salts must pass through a full fmix round.  Injecting s1
    # affinely after the avalanche (xor, or xor+odd-multiply) leaves
    # threshold events correlated between structured keys — raw
    # PRNGKey(i) key data is (0, i), and e.g. `fmix(e^s0)^s1` gives
    # IDENTICAL masks for adjacent keys (the differing low bits shift out
    # of the compared window), while `(fmix(e^s0)^s1)*C` still correlates
    # at |r|≈0.5 (an affine shift of a uniform value against a fixed
    # threshold).  Measured in test_mask_hash_quality's structured-key
    # gate; the second round costs ~1 ms per 2.3M-slot grid.
    h = _fmix32(_fmix32(eids ^ salt[0]) ^ salt[1])
    thresh = jnp.uint32(min(int(round(keep * (1 << 24))), (1 << 24)))
    return ((h >> jnp.uint32(8)) < thresh) | (eids >= jnp.uint32(n_drop))


def dropped_values(val: jax.Array, eids: jax.Array, salt: jax.Array,
                   keep: float, n_drop: int) -> jax.Array:
    """Inverted-dropout values: ``val * mask / keep`` (survivors of the
    first ``n_drop`` ids scaled, the rest passed through)."""
    kept = keep_mask(eids, salt, keep, n_drop)
    scale = jnp.where(eids < jnp.uint32(n_drop),
                      jnp.asarray(1.0 / keep, val.dtype),
                      jnp.ones((), val.dtype))
    return jnp.where(kept, val * scale, jnp.zeros((), val.dtype))


def materialize_dropped(graph: Graph) -> jax.Array:
    """Per-edge dropped values for a lazily-dropped graph — the exact same
    realization every grid computes (same hash, same ids).  Used by every
    fallback path (segment impl, distributed executors, inspection)."""
    eids = jax.lax.iota(jnp.uint32, graph.n_edges)
    return dropped_values(graph.val, eids, graph.drop_salt,
                          graph.drop_keep, graph.drop_n)


@dataclasses.dataclass
class TrainGrids:
    """Host-built per-original-edge row/column ELL grids for one graph
    structure + base values.

    Leaves are **numpy on purpose** (the ELLLayout convention,
    ops/spmm.py): the grids may be built lazily inside a jit trace, where
    ``jnp.asarray`` would lift them into tracers that poison this
    host-side cache for every *later* trace.  As numpy they enter each
    program as trace-safe constants."""

    n_nodes: int
    # row-split (A @ x): gather sources, combine into destination rows
    r_idx: np.ndarray    # (Vr, k) int32 source ids (pad -> n_nodes)
    r_vrow: np.ndarray   # (Vr,)  int32 destination row per virtual row
    r_val: np.ndarray    # (Vr, k) base values (pad -> 0)
    r_eid: np.ndarray    # (Vr, k) uint32 edge ids (pad -> 0; val 0 anyway)
    # column-split (A^T @ g, colsums): same shapes over the transpose
    c_idx: np.ndarray
    c_vrow: np.ndarray   # destination *column* per virtual column
    c_val: np.ndarray
    c_eid: np.ndarray

    def __post_init__(self):
        self._core = None

    @property
    def core(self):
        """The custom-VJP SpMM core: forward gathers through the row grid,
        backward gathers through the column grid (never an F-wide row
        scatter).  Masked value grids are explicit arguments — they carry
        the trace's salt — and their cotangents are structural zeros
        (edge values never depend on parameters in this framework)."""
        if self._core is not None:
            return self._core
        r_idx, r_vrow = self.r_idx, self.r_vrow
        c_idx, c_vrow = self.c_idx, self.c_vrow
        n = self.n_nodes

        def _apply(idx, vrow, vals, x):
            # under a hoisting_jit these constant grids enter the program
            # as parameters, not 10-MB literals (jaxpr-level closure
            # conversion, ops/hoist.py; covered by tests/test_hoist.py)
            xp = jnp.concatenate(
                [x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
            part = (xp[idx] * vals[:, :, None]).sum(axis=1)
            return jax.ops.segment_sum(part, vrow, num_segments=n,
                                       indices_are_sorted=True)

        @jax.custom_vjp
        def core(rv, cv, x):
            return _apply(r_idx, r_vrow, rv, x)

        def fwd(rv, cv, x):
            return core(rv, cv, x), (rv, cv)

        def bwd(res, g):
            rv, cv = res
            dx = _apply(c_idx, c_vrow, cv, g)
            return jnp.zeros_like(rv), jnp.zeros_like(cv), dx

        core.defvjp(fwd, bwd)
        self._core = core
        return core


def _route(layout, arr: np.ndarray, fill) -> np.ndarray:
    grid = np.full(layout.n_vrows * layout.k, fill, arr.dtype)
    grid[layout.slot] = arr
    return grid.reshape(layout.n_vrows, layout.k)


def grid_value_dtype():
    """Storage dtype for the value grids (``GNNTF_GRID_VALUE_DTYPE``,
    default float32).  ``bfloat16`` halves the grids' HBM residency and
    read traffic; for unweighted graphs (values 1.0 — the reference's
    default ``graph2adj`` weights, and duplicates occupy separate slots
    here) the representation is EXACT, so the masked-values product is
    bit-identical after the upcast.  Weighted graphs lose value mantissa
    bits — keep the default there.  Compute always upcasts to the
    feature dtype (the cast fuses into the consumer)."""
    import os
    name = os.environ.get("GNNTF_GRID_VALUE_DTYPE", "float32")
    if name in ("bf16", "bfloat16"):
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(np.float32)


def build_train_grids(row: np.ndarray, col: np.ndarray, val,
                      n_nodes: int, k: int = _K) -> TrainGrids:
    """One-time host build: per-original-edge row and column ELL layouts
    with base-value and edge-id grids (see module docstring)."""
    from .spmm import build_ell
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val).astype(grid_value_dtype())
    eids = np.arange(row.shape[0], dtype=np.uint32)
    rl = build_ell(row, col, n_nodes, k, dedup=False)
    cl = build_ell(col, row, n_nodes, k, dedup=False)
    return TrainGrids(
        n_nodes=n_nodes,
        r_idx=rl.idx, r_vrow=rl.vrow_row,
        r_val=_route(rl, val, val.dtype.type(0)),
        r_eid=_route(rl, eids, np.uint32(0)),
        c_idx=cl.idx, c_vrow=cl.vrow_row,
        c_val=_route(cl, val, val.dtype.type(0)),
        c_eid=_route(cl, eids, np.uint32(0)),
    )


_GRIDS_CACHE = IdLRU()  # byte-bounded; shares the global layout budget


def train_grids(graph: Graph, k: int = _K) -> TrainGrids:
    """Memoized grids for a concrete-structure graph.  Keyed on the
    identity of row, col AND val (a graph sharing row/val objects but a
    different col must not reuse grids — advisor r3); strong refs to the
    anchors are kept in the cache entry.  Safe to call mid-trace —
    construction touches only concrete arrays, so it executes eagerly
    even inside jit."""
    key = (id(graph.row), id(graph.col), id(graph.val), graph.n_nodes,
           k, grid_value_dtype().name)
    anchors = (graph.row, graph.col, graph.val)
    grids = _GRIDS_CACHE.get(key, anchors)
    if grids is None:
        grids = build_train_grids(np.asarray(graph.row),
                                  np.asarray(graph.col),
                                  np.asarray(graph.val), graph.n_nodes, k)
        _GRIDS_CACHE.put(key, anchors, grids)
    return grids


def grids_eligible(graph: Graph) -> bool:
    """The grid path needs concrete structure and base values (models
    close over their graph; distributed/sharded graphs are traced and
    fall back) and enough edges to amortize the constants."""
    return (graph.n_edges >= min_edges()
            and not any(isinstance(a, jax.core.Tracer)
                        for a in (graph.row, graph.col, graph.val)))


def masked_row_values(grids: TrainGrids, graph: Graph) -> jax.Array:
    rv = jnp.asarray(grids.r_val).astype(graph.val.dtype)
    return dropped_values(rv, grids.r_eid,
                          graph.drop_salt, graph.drop_keep, graph.drop_n)


def masked_col_values(grids: TrainGrids, graph: Graph) -> jax.Array:
    cv = jnp.asarray(grids.c_val).astype(graph.val.dtype)
    return dropped_values(cv, grids.c_eid,
                          graph.drop_salt, graph.drop_keep, graph.drop_n)


def stochastic_spmm(graph: Graph, x: jax.Array) -> jax.Array:
    """``A_dropped @ x`` for a lazily-dropped graph through the grids.
    Scales (lazy normalization) are applied by the ``spmm`` dispatcher
    around this call; ``graph`` here is the unscaled base."""
    grids = train_grids(graph)
    rv = masked_row_values(grids, graph)
    cv = masked_col_values(grids, graph)
    return grids.core(rv, cv, x.astype(rv.dtype) if x.dtype != rv.dtype
                      else x)


def stochastic_degree(graph: Graph, by: str = "col") -> jax.Array:
    """Degree vector of the *dropped* adjacency without touching edge
    lists: dense k-reduce of the masked grid + sorted combine.
    ``by='col'``: colsums (tf.sparse.reduce_sum axis=0 — symmetric and
    bipartite normalization); ``by='row'``: rowsums ('row' mode)."""
    grids = train_grids(graph)
    if by == "col":
        vals, vrow = masked_col_values(grids, graph), grids.c_vrow
    else:
        vals, vrow = masked_row_values(grids, graph), grids.r_vrow
    return jax.ops.segment_sum(vals.sum(axis=1), vrow,
                               num_segments=graph.n_nodes,
                               indices_are_sorted=True)
