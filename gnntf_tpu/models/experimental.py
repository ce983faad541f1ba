"""Experimental architectures
(reference: gnntf/core/gnn/architectures/experimental_filter.py,
experimental_gcn.py, experimental_backup.py).

Reference defects intentionally fixed (documented for the parity audit):
  * FastReg created its parameter inside ``__forward__``
    (experimental_filter.py:31) leaking a new variable every epoch — here it
    is created once at build time.
  * ``experimental_backup.py`` used ``PPRIteration`` without importing it
    (NameError when run) — the dual-alpha ``APPNP2`` / label-channel
    ``APPNPThrough`` below are working equivalents.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.coo import Graph
from ..nn.core import Forward, Layer, Network
from ..nn.layers import Dense, Dropout, Tradeoff
from ..ops.spmm import spmm
from .gnn import GNN
from .layers import PPRIteration

_identity = lambda x: x


class PPRSweep(Layer):
    """Divides features by a 10-step PPR of all-ones (degree-bias
    correction; reference experimental_filter.py:7-19)."""

    def build(self, net: Network, restart_probability: float = 0.1):
        self.restart_probability = restart_probability
        return net.top_shape()

    def apply(self, fw: Forward, x):
        adj = fw.adjacency()  # default graph_dropout=0.5 like the reference
        h0 = jnp.ones_like(x)
        hn = h0
        for _ in range(10):
            hn = spmm(adj, hn) * (1.0 - self.restart_probability) \
                + h0 * self.restart_probability
        return x / hn


class FastReg(Layer):
    """Identity layer adding a negative Dirichlet-energy-ratio loss
    (reference experimental_filter.py:22-43)."""

    def build(self, net: Network):
        d = net.top_shape()[1]
        self.W = net.create_param((d, 1), regularize=1)
        return net.top_shape()

    def apply(self, fw: Forward, x):
        adj = fw.adjacency(graph_dropout=0.5, normalized="none")
        feats = jax.nn.sigmoid(
            jnp.dot(x, fw.param(self.W), preferred_element_type=x.dtype))
        propagated = spmm(adj, feats)
        diffs = feats - propagated
        from ..ops.normalize import _degree
        deg = _degree(adj)  # dropped-adjacency aware (ops/stochastic.py)
        lam = jnp.sum(diffs * diffs) / jnp.sum(
            deg[:, None] * feats * feats)
        fw.add_loss(-lam)
        return x


class APPNPReg(GNN):
    """APPNP without input dropout (reference
    experimental_filter.py:46-56)."""

    def __init__(self, G: Graph, features, num_classes: int, a: float = 0.1,
                 latent_dims=(64,), iterations: int = 10,
                 dropout: float = 0.6, graph_dropout: float = 0.5,
                 activation=_identity, **kwargs):
        super().__init__(G, features, **kwargs)
        for latent_dim in latent_dims:
            self.add(Dense(latent_dim, activation=jax.nn.relu,
                           dropout=dropout))
        H0 = self.add(Dense(num_classes, regularize=False))
        restart = self.create_var() if a is None else a
        for _ in range(iterations):
            self.add(PPRIteration(H0, restart, graph_dropout=graph_dropout,
                                  activation=activation))


class GCNIIReg(GNN):
    """GCNII + FastReg (reference experimental_gcn.py:9-29)."""

    def __init__(self, graph: Graph, features, num_classes: int,
                 a: float = 0.1, l: float = 0.5, latent_dims=(64,),
                 iterations: int = 64, dropout: float = 0.6,
                 convolution_regularization: bool = True, **kwargs):
        from .layers import GCNIILayer
        super().__init__(graph, features, **kwargs)
        self.add(Dropout(dropout))
        for latent_dim in latent_dims:
            self.add(Dense(latent_dim, dropout=dropout,
                           activation=jax.nn.relu))
        H0 = self.top_layer()
        self.add(FastReg())
        for iteration in range(iterations):
            self.add(GCNIILayer(H0, a, l, iteration, activation=jax.nn.relu,
                                dropout=dropout, graph_dropout=0,
                                regularization=convolution_regularization))
        self.add(Dense(num_classes, dropout=0, regularize=False))


class StableIteration(Layer):
    """Propagation step with two restart probabilities traded off by a
    learnable sigmoid gate (reference experimental_backup.py:6-24)."""

    def build(self, net: Network, H0: Layer, a1: float = 0.2,
              a2: float = 0.05, graph_dropout: float = 0.5):
        self.H0 = H0
        self.a1, self.a2 = a1, a2
        self.graph_dropout = graph_dropout
        self.gate = net.create_param((1, 1), "zero", regularize=False)
        return net.top_shape()

    def apply(self, fw: Forward, x):
        adj = fw.adjacency(self.graph_dropout)
        propagated = spmm(adj, x)
        h0 = fw.value_of(self.H0)
        g = jax.nn.sigmoid(fw.param(self.gate))
        out1 = propagated * (1.0 - self.a1) + h0 * self.a1
        out2 = propagated * (1.0 - self.a2) + h0 * self.a2
        return g * out1 + (1.0 - g) * out2


class APPNP2(GNN):
    """Dual-alpha APPNP (working equivalent of
    experimental_backup.py:27-43)."""

    def __init__(self, G: Graph, features, num_classes: int,
                 latent_dims=(64,), iterations: int = 10,
                 dropout: float = 0.6, graph_dropout: float = 0.5, **kwargs):
        super().__init__(G, features, **kwargs)
        self.add(Dropout(0.5))
        for latent_dim in latent_dims:
            self.add(Dense(latent_dim, activation=jax.nn.relu,
                           dropout=dropout))
        H0 = self.add(Dense(num_classes, regularize=False))
        for _ in range(iterations):
            self.add(StableIteration(H0, graph_dropout=graph_dropout))


class APPNPThrough(GNN):
    """APPNP with an extra label channel injected through training nodes
    (working equivalent of experimental_backup.py:46-62): ``train()`` wires
    the train task's one-hot labels into an appended feature block."""

    def __init__(self, G: Graph, features, num_classes: int, a: float = 0.1,
                 latent_dims=(64,), iterations: int = 10,
                 dropout: float = 0.6, graph_dropout: float = 0.5, **kwargs):
        import numpy as np
        features = jnp.asarray(features)
        self.num_classes = num_classes
        padded = jnp.concatenate(
            [features, jnp.zeros((features.shape[0], num_classes),
                                 features.dtype)], axis=1)
        super().__init__(G, padded, **kwargs)
        self.add(Dropout(0.5))
        for latent_dim in latent_dims:
            self.add(Dense(latent_dim, activation=jax.nn.relu,
                           dropout=dropout))
        H0 = self.add(Dense(num_classes, regularize=False))
        for _ in range(iterations):
            self.add(PPRIteration(H0, a, graph_dropout=graph_dropout))

    def train(self, train, **kwargs):
        import numpy as np
        feats = np.asarray(self.features)
        nodes = np.asarray(train.nodes)
        labels = np.asarray(train.labels)
        feats[:, -self.num_classes:] = 0.0
        feats[nodes, feats.shape[1] - self.num_classes + labels] = 1.0
        self.features = jnp.asarray(feats)
        return super().train(train, **kwargs)
