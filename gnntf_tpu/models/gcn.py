"""GCN / GCNII / NGCF architectures
(reference: gnntf/core/gnn/architectures/gcn.py).
"""
from __future__ import annotations

import jax

from ..graph.coo import Graph
from ..nn.layers import Concatenate, Dense, Dropout
from .gnn import GNN
from .layers import (GCNIILayer, GCNLayer, NGCFLayer)


class GCN(GNN):
    """[GCNLayer(latent, graph_dropout=0.5, dropout=0.5)]* -> GCNLayer(C)
    (reference gcn.py:108-113)."""

    def __init__(self, G: Graph, features, num_classes: int,
                 latent_dims=(64,), layer_type=GCNLayer, **kwargs):
        super().__init__(G, features, **kwargs)
        for latent_dim in latent_dims:
            self.add(layer_type(latent_dim, graph_dropout=0.5, dropout=0.5))
        self.add(layer_type(num_classes))


class GCNII(GNN):
    """Dropout(d) -> Dense(latent, relu) = H0 -> iterations x
    GCNIILayer(H0, a, l, k, relu, dropout=d, graph_dropout=0) -> Dense(C)
    (reference gcn.py:54-74; paper
    http://proceedings.mlr.press/v119/chen20v/chen20v.pdf)."""

    def __init__(self, graph: Graph, features, num_classes: int,
                 a: float = 0.1, l: float = 0.5, latent_dims=(64,),
                 iterations: int = 64, dropout: float = 0.6,
                 convolution_regularization: bool = True,
                 layer_type=GCNIILayer, **kwargs):
        super().__init__(graph, features, **kwargs)
        self.add(Dropout(dropout))
        for latent_dim in latent_dims:
            self.add(Dense(latent_dim, dropout=0, activation=jax.nn.relu))
        H0 = self.top_layer()
        for iteration in range(iterations):
            self.add(layer_type(H0, a, l, iteration, activation=jax.nn.relu,
                                dropout=dropout, graph_dropout=0,
                                regularization=convolution_regularization))
        self.add(Dense(num_classes, dropout=0, regularize=False))


class NGCF(GNN):
    """Stack of NGCF layers with output-activation regularization, final
    feature-wise concatenation of all layer embeddings
    (reference gcn.py:138-154; the reference's axis-0 Concatenate bug is
    fixed — see nn.layers.Concatenate)."""

    def __init__(self, graph: Graph, features, num_classes: int,
                 latent_dims=None, dropout: float = 0.1, **kwargs):
        super().__init__(graph, features, **kwargs)
        if latent_dims is None:
            latent_dims = [num_classes] * 2
        layers = []
        for latent_dim in latent_dims:
            layers.append(self.add(NGCFLayer(latent_dim, regularize=0.0,
                                             dropout=dropout,
                                             output_regularize=1)))
        layers.append(self.add(NGCFLayer(num_classes, regularize=0.0,
                                         dropout=dropout,
                                         output_regularize=1)))
        self.add(Concatenate(layers))
