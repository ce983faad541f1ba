"""Graph-attention kernels: the SDDMM -> segment-softmax -> SpMM chain.

No reference counterpart (the reference has no attention models); required
by BASELINE config 3 (GAT).  The naive chain costs, per layer at ogbn
scale, two *unsorted* E-sized segment reductions (max + sum) and four
E-sized gathers — exactly the op class the grid work of r3 measured at
~18 ms each on TPU (documentation/performance.md).

The ELL formulation here reuses the row-split layout machinery
(ops/spmm.build_ell, ``dedup=False`` so every original edge keeps its own
slot and duplicate (row, col) pairs keep their *separate* softmax
contributions, matching the per-edge segment path bit-for-bit in
structure):

  * scores:   ``s_src[idx] + s_dst[vrow]`` — a (V, k, H) gather of an
    (N, H) table + broadcast, padding masked to -inf;
  * seg max:  dense ``max`` over k + *sorted* virtual-row combine;
  * seg sum:  dense ``sum`` over k + sorted combine — both replace
    unsorted E-sized scatter reductions;
  * aggregate: ``h[idx] * alpha`` -> dense k-sum -> sorted combine (the
    `_ell_compute` shape), replacing gather + unsorted segment-sum.

Falls back to the plain segment path for traced or small structures.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.coo import Graph
from .segment import segment_softmax

_MIN_EDGES = 65_536  # same scale gate as the SpMM layouts


def _ell_nodedup_layout(graph: Graph):
    """Per-original-edge row-split layout (duplicates keep their slots),
    cached alongside the other layout caches."""
    from ..utils.idcache import IdLRU
    from .spmm import build_ell, _ELL_DEFAULT_K
    global _ATTN_CACHE
    if _ATTN_CACHE is None:
        _ATTN_CACHE = IdLRU()
    key = ("attn-ell", id(graph.row), id(graph.col), graph.n_nodes)
    anchors = (graph.row, graph.col)
    layout = _ATTN_CACHE.get(key, anchors)
    if layout is None:
        layout = build_ell(np.asarray(graph.row), np.asarray(graph.col),
                           graph.n_nodes, _ELL_DEFAULT_K, dedup=False)
        _ATTN_CACHE.put(key, anchors, layout)
    return layout


_ATTN_CACHE = None


def _grid_eligible(graph: Graph) -> bool:
    return (graph.n_edges >= _MIN_EDGES
            and not isinstance(graph.row, jax.core.Tracer)
            and not isinstance(graph.col, jax.core.Tracer))


def gat_attention(graph: Graph, h: jax.Array, s_src: jax.Array,
                  s_dst: jax.Array, *, negative_slope: float = 0.2,
                  attn_dropout: float = 0.0,
                  rng: Optional[jax.Array] = None,
                  sorted_by_row: bool = False) -> jax.Array:
    """Attention-weighted aggregation ``out[n] = sum_e alpha_e h[col_e]``.

    ``h``: (N, H, F) projected features; ``s_src``/``s_dst``: (N, H)
    per-node score halves.  Scores are
    ``leaky_relu(s_src[col] + s_dst[row])`` softmax-normalized over each
    destination's incoming edges; ``attn_dropout`` (with ``rng``) applies
    inverted dropout to the normalized coefficients (the GAT paper's
    recipe).  Returns (N, H, F).
    """
    if _grid_eligible(graph):
        return _gat_attention_ell(graph, h, s_src, s_dst,
                                  negative_slope=negative_slope,
                                  attn_dropout=attn_dropout, rng=rng)
    return _gat_attention_segment(graph, h, s_src, s_dst,
                                  negative_slope=negative_slope,
                                  attn_dropout=attn_dropout, rng=rng,
                                  sorted_by_row=sorted_by_row)


def _gat_attention_segment(graph, h, s_src, s_dst, *, negative_slope,
                           attn_dropout, rng, sorted_by_row):
    row, col = graph.row, graph.col
    n, h_cnt, f = h.shape
    scores = jax.nn.leaky_relu(s_src[col] + s_dst[row],
                               negative_slope=negative_slope)
    alpha = segment_softmax(scores, row, n, indices_are_sorted=sorted_by_row)
    if attn_dropout and rng is not None:
        from .dropout import dropout as _dropout
        alpha = _dropout(rng, alpha, attn_dropout)
    msgs = h[col] * alpha[:, :, None].astype(h.dtype)
    out = jax.ops.segment_sum(msgs.reshape(msgs.shape[0], h_cnt * f), row,
                              num_segments=n,
                              indices_are_sorted=sorted_by_row)
    return out.reshape(n, h_cnt, f)


def _gat_attention_ell(graph, h, s_src, s_dst, *, negative_slope,
                       attn_dropout, rng):
    layout = _ell_nodedup_layout(graph)
    idx = jnp.asarray(layout.idx)            # (V, k) sources, pad=n
    vrow = jnp.asarray(layout.vrow_row)      # (V,) dest rows, sorted
    n, h_cnt, f = h.shape
    v, k = layout.idx.shape

    pad = idx == n
    ssrc_p = jnp.concatenate(
        [s_src, jnp.zeros((1, h_cnt), s_src.dtype)], axis=0)
    sg = ssrc_p[idx] + s_dst[vrow][:, None, :]           # (V, k, H)
    sg = jax.nn.leaky_relu(sg, negative_slope=negative_slope)
    neg = jnp.asarray(-jnp.inf, sg.dtype)
    sg = jnp.where(pad[:, :, None], neg, sg)

    # segment max: dense k-max then SORTED virtual-row combine
    vmax = sg.max(axis=1)                                # (V, H)
    rmax = jax.ops.segment_max(vmax, vrow, num_segments=n,
                               indices_are_sorted=True)
    rmax = jnp.where(jnp.isfinite(rmax), rmax, 0.0)
    e = jnp.exp(sg - rmax[vrow][:, None, :])
    e = jnp.where(pad[:, :, None], 0.0, e)               # (V, k, H)

    denom = jax.ops.segment_sum(e.sum(axis=1), vrow, num_segments=n,
                                indices_are_sorted=True)
    alpha = e / jnp.maximum(denom[vrow][:, None, :], 1e-30)
    if attn_dropout and rng is not None:
        from .dropout import dropout as _dropout
        alpha = _dropout(rng, alpha, attn_dropout)

    hp = jnp.concatenate(
        [h.reshape(n, h_cnt * f),
         jnp.zeros((1, h_cnt * f), h.dtype)], axis=0)
    msgs = hp[idx].reshape(v, k, h_cnt, f) * alpha[:, :, :, None].astype(
        h.dtype)
    part = msgs.sum(axis=1).reshape(v, h_cnt * f)        # dense k-reduce
    out = jax.ops.segment_sum(part, vrow, num_segments=n,
                              indices_are_sorted=True)
    return out.reshape(n, h_cnt, f)
