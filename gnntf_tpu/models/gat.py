"""Graph attention network (GAT) — new capability with no reference
counterpart (BASELINE.md config 3): SDDMM-style edge scores + segment-softmax
normalized aggregation.

Kernel chain per layer (the TPU target path):
  1. dense projection  H = X @ W                      (MXU)
  2. per-edge scores   e = LeakyReLU(s_src[col] + s_dst[row])   (gather/VPU)
  3. segment softmax over incoming edges of each destination row
  4. SpMM with the attention values
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..graph.coo import Graph, add_self_loops
from ..nn.core import Forward, Layer, Network
from ..nn.layers import Dropout
from ..ops.attention import gat_attention
from .gnn import GNN


class GATLayer(Layer):
    """Multi-head graph attention (Velickovic et al., arXiv:1710.10903).

    ``concat_heads=True`` concatenates head outputs (hidden layers);
    ``False`` averages them (output layer)."""

    def build(self, net: Network, outputs: int, heads: int = 8,
              concat_heads: bool = True, activation=None,
              dropout: float = 0.0, attn_dropout: float = 0.0,
              negative_slope: float = 0.2, self_loops: bool = True,
              bias: bool = True):
        n, d = net.top_shape()
        self.W = net.create_param((d, heads * outputs), "xavier")
        self.a_src = net.create_param((heads, outputs), "xavier")
        self.a_dst = net.create_param((heads, outputs), "xavier")
        width = heads * outputs if concat_heads else outputs
        self.b = net.create_param((1, width), "zero") if bias else None
        self.heads, self.out_dim = heads, outputs
        self.concat_heads = concat_heads
        self.activation = activation
        self.dropout_rate = dropout
        self.attn_dropout = attn_dropout
        self.negative_slope = negative_slope
        self.self_loops = self_loops
        return (n, width)

    def apply(self, fw: Forward, x):
        graph: Graph = fw.graph
        if graph.scaled or graph.eye_weight != 0.0:
            # attention reads raw structure; fold any lazy normalization
            # so appended self-loops appear as real entries
            graph = graph.materialized()
        if self.self_loops:
            # memoized concrete extension — stable identity, so the
            # attention ELL layout cache hits across layers and traces
            graph = add_self_loops(graph)
        n, h_cnt, f = graph.n_nodes, self.heads, self.out_dim

        h = jnp.dot(x, fw.param(self.W), preferred_element_type=x.dtype)
        h = h.reshape(n, h_cnt, f)
        # per-node score halves: s[n, head] = <h[n, head, :], a[head, :]>
        s_src = jnp.einsum("nhf,hf->nh", h, fw.param(self.a_src))
        s_dst = jnp.einsum("nhf,hf->nh", h, fw.param(self.a_dst))
        # SDDMM -> segment-softmax -> weighted aggregation; at scale this
        # runs on the row-split ELL grid (sorted combines, no unsorted
        # E-sized reductions — ops/attention.py)
        rng = fw.next_rng() if (self.attn_dropout and fw.training) else None
        out = gat_attention(
            graph, h, s_src, s_dst, negative_slope=self.negative_slope,
            attn_dropout=self.attn_dropout if fw.training else 0.0,
            rng=rng, sorted_by_row=graph.sorted_by_row)
        out = out.reshape(n, h_cnt * f) if self.concat_heads \
            else jnp.mean(out, axis=1)
        if self.b is not None:
            out = out + fw.param(self.b)
        if self.activation is not None:
            out = self.activation(out)
        return fw.dropout(out, self.dropout_rate)


class GAT(GNN):
    """Two-layer GAT: 8 heads of ``latent`` units with ELU + concat, then a
    single averaged head over classes — the standard transductive recipe of
    the GAT paper."""

    def __init__(self, G: Graph, features, num_classes: int,
                 latent_dims=(8,), heads: int = 8, dropout: float = 0.6,
                 attn_dropout: float = 0.6, **kwargs):
        super().__init__(G, features, **kwargs)
        self.add(Dropout(dropout))
        for latent_dim in latent_dims:
            self.add(GATLayer(latent_dim, heads=heads, concat_heads=True,
                              activation=jax.nn.elu, dropout=dropout,
                              attn_dropout=attn_dropout))
        self.add(GATLayer(num_classes, heads=1, concat_heads=False,
                          attn_dropout=attn_dropout))
