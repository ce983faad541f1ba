"""APPNP: predict-then-propagate with personalized PageRank
(reference: gnntf/core/gnn/architectures/filter.py:25-35;
paper https://arxiv.org/pdf/1810.05997.pdf).
"""
from __future__ import annotations

import jax

from ..graph.coo import Graph
from ..nn.layers import Dense, Dropout
from .gnn import GNN
from .layers import PPRIteration

_identity = lambda x: x


class APPNP(GNN):
    """Dropout(0.5) -> [Dense(latent, relu, dropout)] -> H0=Dense(C, no-reg)
    -> ``iterations`` x PPRIteration(H0, a, graph_dropout).

    ``a=None`` makes the restart probability a learnable scalar (the
    reference attempts the same via ``self.create_var()``, filter.py:35)."""

    def __init__(self, G: Graph, features, num_classes: int, a: float = 0.1,
                 latent_dims=(64,), iterations: int = 10, dropout: float = 0.6,
                 graph_dropout: float = 0.5, activation=_identity, **kwargs):
        super().__init__(G, features, **kwargs)
        self.add(Dropout(0.5))
        for latent_dim in latent_dims:
            self.add(Dense(latent_dim, activation=jax.nn.relu, dropout=dropout))
        H0 = self.add(Dense(num_classes, regularize=False))
        restart = self.create_var() if a is None else a
        for _ in range(iterations):
            self.add(PPRIteration(H0, restart, graph_dropout=graph_dropout,
                                  activation=activation))
