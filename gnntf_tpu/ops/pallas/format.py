"""Blocked-COO: the host-side edge layout for the Pallas SpMM kernel.

The kernel (`gnntf_tpu.ops.pallas.spmm`) processes edges in fixed-size
chunks where every edge of a chunk falls inside one (row-window, col-tile)
block of the adjacency matrix:

  * rows of a chunk lie in  [window * W, (window+1) * W)
  * cols of a chunk lie in  [tile * T,   (tile+1) * T)

so both the gather (pick source rows from the X col-tile) and the scatter
(accumulate into the output row-window) become small dense one-hot matmuls
that run on the MXU.  TPU v5e Mosaic exposes no VMEM dynamic-gather or
scatter primitive (measured: `tpu.dynamic_gather` fails to compile), so
one-hot contraction is the only fully-vectorized formulation available —
this is an MXU-native redesign of the reference's CSR SpMM
(tf.sparse.sparse_dense_matmul, reference gnntf/core/gnn/architectures/
filter.py:19), not a translation of it.

Efficiency = chunk fill factor.  Chunks are cut wherever the (window, tile)
block changes, so dense blocks (small graphs, or large graphs after a
locality reordering such as `gnntf_tpu.graph.reorder.rcm_order`) fill
chunks well, while uniformly random large graphs degrade toward one
block per chunk — use the default XLA segment-sum path for those.

Chunks are ordered window-major, so the output row-window of consecutive
grid steps is monotone non-decreasing: the kernel accumulates a window in
VMEM across its chunks and writes it back exactly once.  Every window gets
at least one (possibly all-padding) chunk so each output block is visited
and zero-initialised.  Padding slots carry val=0, contributing nothing.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BlockedCOO:
    """Edge *structure* re-blocked for the Pallas SpMM kernel.

    rows/cols are stored relative to their window/tile base.  All arrays are
    flat with ``n_chunks * block_edges`` edge slots.  Edge **values are not
    baked in**: ``perm[e]`` is the flat slot of original edge ``e``, so the
    caller scatters the *live* (possibly traced) ``graph.val`` into the slot
    grid per call — per-step graph-dropout / renormalization flow through
    the kernel unchanged.
    """

    rows: np.ndarray          # (C*BE,) int32, in [0, window)
    cols: np.ndarray          # (C*BE,) int32, in [0, tile)
    perm: np.ndarray          # (E,) int32 — flat slot of original edge e
    chunk_window: np.ndarray  # (C,) int32  output row-window per chunk
    chunk_tile: np.ndarray    # (C,) int32  X col-tile per chunk

    # NOTE: layout leaves are *numpy* arrays on purpose — the layout may be
    # built lazily inside a jit trace (first call of a training step), and
    # jnp.asarray there would lift the constants into tracers that poison
    # the host-side layout cache.  numpy leaves stay trace-safe constants.
    n_nodes: int
    window: int
    tile: int
    block_edges: int
    n_windows: int
    n_tiles: int

    @property
    def n_chunks(self) -> int:
        return int(self.chunk_window.shape[0])

    @property
    def n_edges(self) -> int:
        return int(self.perm.shape[0])

    @property
    def fill_factor(self) -> float:
        """Fraction of edge slots holding real edges (1.0 = no padding)."""
        return self.n_edges / max(1, self.rows.shape[0])

    def scatter_values(self, val: jax.Array) -> jax.Array:
        """Place live edge values into the (C*BE,) slot grid (padding 0)."""
        flat = jnp.zeros((self.rows.shape[0],), jnp.float32)
        return flat.at[self.perm].set(val.astype(jnp.float32),
                                      unique_indices=True)


def _static_fields():
    return ("n_nodes", "window", "tile", "block_edges", "n_windows", "n_tiles")


# Register static/leaf split explicitly (jax>=0.4.36 dataclass registry).
jax.tree_util.register_dataclass(
    BlockedCOO,
    data_fields=["rows", "cols", "perm", "chunk_window", "chunk_tile"],
    meta_fields=list(_static_fields()),
)


def block_coo(row, col, n_nodes: int, *, window: int = 256,
              tile: int = 256, block_edges: int = 1024) -> BlockedCOO:
    """Build the blocked layout from COO structure (host-side, one-time).

    Semantics match the plain segment-sum SpMM: duplicate edges sum, edge
    order inside a block is irrelevant.
    """
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    n_windows = -(-n_nodes // window)
    n_tiles = -(-n_nodes // tile)

    w = row // window
    t = col // tile
    # window-major order; tile minor. Stable so tests are deterministic.
    order = np.lexsort((t, w))
    row, col, w, t = row[order], col[order], w[order], t[order]

    # chunk id within each (window, tile) run
    block_key = w * n_tiles + t
    # boundaries where the block changes
    change = np.ones(len(row), dtype=bool)
    if len(row):
        change[1:] = block_key[1:] != block_key[:-1]
    run_id = np.cumsum(change) - 1 if len(row) else np.zeros(0, np.int64)
    # index within run
    run_starts = np.flatnonzero(change) if len(row) else np.zeros(0, np.int64)
    idx_in_run = np.arange(len(row)) - run_starts[run_id] if len(row) else row
    chunk_in_run = idx_in_run // block_edges

    # global chunk enumeration (in order): unique (run, chunk_in_run)
    chunk_key = run_id * (1 << 32) + chunk_in_run
    chunk_change = np.ones(len(row), dtype=bool)
    if len(row):
        chunk_change[1:] = chunk_key[1:] != chunk_key[:-1]
    chunk_id = (np.cumsum(chunk_change) - 1) if len(row) else np.zeros(0, np.int64)
    slot = idx_in_run - chunk_in_run * block_edges

    n_edge_chunks = int(chunk_id[-1]) + 1 if len(row) else 0

    # windows with no edges still need one chunk to zero their output block
    windows_with_edges = np.zeros(n_windows, dtype=bool)
    if len(row):
        windows_with_edges[w] = True
    empty_windows = np.flatnonzero(~windows_with_edges)
    n_chunks = n_edge_chunks + len(empty_windows)

    BE = block_edges
    rows_b = np.zeros(n_chunks * BE, np.int32)
    cols_b = np.zeros(n_chunks * BE, np.int32)
    perm = np.zeros(len(row), np.int64)
    cw = np.zeros(n_chunks, np.int32)
    ct = np.zeros(n_chunks, np.int32)

    if len(row):
        flat = chunk_id * BE + slot
        rows_b[flat] = (row - w * window).astype(np.int32)
        cols_b[flat] = (col - t * tile).astype(np.int32)
        perm[order] = flat  # original edge e lives at flat slot perm[e]
        first_of_chunk = np.flatnonzero(chunk_change)
        cw[:n_edge_chunks] = w[first_of_chunk].astype(np.int32)
        ct[:n_edge_chunks] = t[first_of_chunk].astype(np.int32)

    # append empty-window chunks, then re-sort chunks window-major
    cw[n_edge_chunks:] = empty_windows.astype(np.int32)
    ct[n_edge_chunks:] = 0
    corder = np.argsort(cw, kind="stable")
    cw, ct = cw[corder], ct[corder]
    reindex = (corder[:, None] * BE + np.arange(BE)[None, :]).ravel()
    rows_b, cols_b = rows_b[reindex], cols_b[reindex]
    # remap perm through the chunk re-sort: slot_new[reindex] = slot_old
    inv = np.empty(n_chunks * BE, np.int64)
    inv[reindex] = np.arange(n_chunks * BE)
    perm = inv[perm]

    return BlockedCOO(
        rows=rows_b, cols=cols_b, perm=perm.astype(np.int32),
        chunk_window=cw, chunk_tile=ct,
        n_nodes=n_nodes, window=window, tile=tile, block_edges=block_edges,
        n_windows=n_windows, n_tiles=n_tiles,
    )
