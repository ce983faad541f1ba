"""GraphSAGE and GIN — capability extensions beyond the reference zoo.

The reference (MKLab-ITI/gnn-tf) ships APPNP/GCN/GCNII/NGCF only
(gnntf/core/gnn/architectures/__init__.py:1-4); GraphSAGE (Hamilton et
al., arXiv:1706.02216) and GIN (Xu et al., arXiv:1810.00826) are the two
most commonly expected additional families for anyone switching
frameworks, so they are provided here in the same Layer/GNN idiom.  Both
funnel aggregation through the framework's hot SpMM path, so they inherit
the ELL/auto kernel dispatch and the mesh-sharded executors unchanged.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..graph.coo import Graph
from ..nn.core import Forward, Layer, Network
from ..nn.layers import Dense, Dropout
from ..ops.spmm import spmm
from .gnn import GNN


class SAGELayer(Layer):
    """GraphSAGE-mean convolution:

        out = act( X @ W_self + mean_{j in N(i)} X_j @ W_neigh + b )

    optionally L2-normalized (the paper's q-normalization step).  The
    neighbor mean is the true row-stochastic SpMM (``row`` normalization:
    D_row^-1 A with D_row the per-destination degree, ops/normalize.py),
    which is the exact neighbor mean for directed and undirected graphs
    alike; edge dropout composes with it (mean over surviving neighbors,
    renormalized) just like every other layer."""

    def build(self, net: Network, outputs: int,
              activation: Optional[Callable] = jax.nn.relu,
              bias: bool = True, normalize: bool = False,
              dropout: float = 0.0, graph_dropout: float = 0.0):
        n, d = net.top_shape()
        self.W_self = net.create_param((d, outputs), "xavier")
        self.W_neigh = net.create_param((d, outputs), "xavier")
        self.b = net.create_param((1, outputs), "zero") if bias else None
        self.activation = activation
        self.normalize = normalize
        self.dropout_rate = dropout
        self.graph_dropout = graph_dropout
        return (n, outputs)

    def apply(self, fw: Forward, x):
        adj = fw.adjacency(self.graph_dropout, normalized="row",
                           add_eye="none")
        W_self, W_neigh = fw.param(self.W_self), fw.param(self.W_neigh)
        # SpMM at the narrower width (see GCNLayer): A(XW) vs (AX)W
        if W_neigh.shape[0] > W_neigh.shape[1]:
            agg = spmm(adj, jnp.dot(x, W_neigh,
                                    preferred_element_type=x.dtype))
        else:
            agg = jnp.dot(spmm(adj, x), W_neigh,
                          preferred_element_type=x.dtype)
        y = jnp.dot(x, W_self, preferred_element_type=x.dtype) + agg
        if self.b is not None:
            y = y + fw.param(self.b)
        if self.activation is not None:
            y = self.activation(y)
        if self.normalize:
            sumsq = jnp.sum(jnp.square(y), axis=1, keepdims=True)
            y = y * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-12))
        return fw.dropout(y, self.dropout_rate)


class GraphSAGE(GNN):
    """[SAGELayer(latent, relu)]* -> SAGELayer(C, linear) — the standard
    transductive mean-aggregator recipe."""

    def __init__(self, G: Graph, features, num_classes: int,
                 latent_dims=(64,), dropout: float = 0.5,
                 normalize: bool = False, **kwargs):
        super().__init__(G, features, **kwargs)
        for latent_dim in latent_dims:
            self.add(SAGELayer(latent_dim, activation=jax.nn.relu,
                               dropout=dropout, normalize=normalize))
        self.add(SAGELayer(num_classes, activation=None))


class GINLayer(Layer):
    """Graph isomorphism convolution:

        out = MLP( (1 + eps) * X + sum_{j in N(i)} X_j )

    with a 2-layer ReLU MLP and ``eps`` either fixed or learnable
    (``train_eps=True``; zero-initialized scalar parameter)."""

    def build(self, net: Network, outputs: int, hidden: Optional[int] = None,
              eps: float = 0.0, train_eps: bool = True,
              activation: Callable = jax.nn.relu,
              dropout: float = 0.0, graph_dropout: float = 0.0):
        n, d = net.top_shape()
        hidden = outputs if hidden is None else hidden
        self.W1 = net.create_param((d, hidden), "xavier")
        self.b1 = net.create_param((1, hidden), "zero")
        self.W2 = net.create_param((hidden, outputs), "xavier")
        self.b2 = net.create_param((1, outputs), "zero")
        self.eps0 = eps
        self.eps = net.create_param((1, 1), "zero") if train_eps else None
        self.activation = activation
        self.dropout_rate = dropout
        self.graph_dropout = graph_dropout
        return (n, outputs)

    def apply(self, fw: Forward, x):
        adj = fw.adjacency(self.graph_dropout, normalized="none",
                           add_eye="none")
        eps = self.eps0 if self.eps is None \
            else self.eps0 + fw.param(self.eps)[0, 0]
        y = (1.0 + eps) * x + spmm(adj, x)
        y = self.activation(
            jnp.dot(y, fw.param(self.W1), preferred_element_type=x.dtype)
            + fw.param(self.b1))
        y = jnp.dot(y, fw.param(self.W2), preferred_element_type=x.dtype) \
            + fw.param(self.b2)
        return fw.dropout(y, self.dropout_rate)


class GIN(GNN):
    """Dropout -> [GINLayer(latent)]* -> Dense(C) node classifier."""

    def __init__(self, G: Graph, features, num_classes: int,
                 latent_dims=(64,), dropout: float = 0.5,
                 train_eps: bool = True, **kwargs):
        super().__init__(G, features, **kwargs)
        self.add(Dropout(dropout))
        for latent_dim in latent_dims:
            self.add(GINLayer(latent_dim, train_eps=train_eps,
                              dropout=dropout))
        self.add(Dense(num_classes, dropout=0, regularize=False))
