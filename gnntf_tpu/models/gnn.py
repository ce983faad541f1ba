"""GNN base model + Structural embedding preprocessor
(reference: gnntf/core/gnn/gnn.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.coo import Graph
from ..nn.core import Forward, Layer, Network
from ..train.trainer import Trainable


class GNN(Trainable):
    """A Trainable bound to a sparse adjacency (reference gnn.py:29-34).

    Layers access the normalized adjacency through ``fw.adjacency(...)``
    (the functional ``get_adjacency``, gnn.py:36-50): per-layer fresh edge
    dropout, renormalization after dropout, optional self-loops.
    """

    def __init__(self, graph: Graph, features, preprocessor: Optional[Layer] = None):
        super().__init__(features)
        if not isinstance(graph, Graph):
            raise TypeError("GNN expects a gnntf_tpu Graph (see graph2adj)")
        self.graph = graph
        if preprocessor is not None:
            self.add(preprocessor)

    def get_adjacency(self, graph_dropout: float = 0.5,
                      normalized: str = "symmetric", add_eye: str = "none"):
        """Deterministic (dropout-off) normalized adjacency for host-side
        inspection; the in-trace version lives on the Forward context.
        Materialized (per-edge values) — inspection wants concrete values,
        and this path is not the hot loop."""
        from ..ops.normalize import normalize_adjacency
        return normalize_adjacency(self.graph, graph_dropout=0.0,
                                   normalized=normalized,
                                   add_eye=add_eye).materialized()


class Structural(Layer):
    """Free learnable node embeddings, optionally split into two bipartite
    tables and optionally L2-normalized, concatenated feature-wise with the
    input (pure-structural mode when the input width is 0)
    (reference gnn.py:5-26).  Used as ``preprocessor=`` for featureless or
    recommendation graphs."""

    def build(self, net: Network, dims: int = 16, l2_contraint: bool = False,
              bipartite: int = 0, **kwargs):
        n, d = net.top_shape()
        self.l2_contraint = l2_contraint
        self.emb_a = net.create_param((bipartite, dims), **kwargs)
        self.emb_b = net.create_param((n - bipartite, dims), **kwargs)
        self.bipartite = bipartite
        return (n, dims + d)

    def apply(self, fw: Forward, x):
        emb = fw.param(self.emb_b)
        if self.bipartite != 0:
            emb = jnp.concatenate([fw.param(self.emb_a), emb], axis=0)
        if self.l2_contraint:
            # tf.math.l2_normalize: x * rsqrt(max(sum(x^2), 1e-12))
            sumsq = jnp.sum(jnp.square(emb), axis=1, keepdims=True)
            emb = emb * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-12))
        if x.shape[1] == 0:
            return emb
        return jnp.concatenate([emb, x], axis=1)
