"""Third-party / custom propagation backends as layers (the reference's
demos/development/custom_layers_pygrank.py plugs a pygrank PageRank filter
in as a custom layer; same extension point here with a heat-kernel
diffusion implemented on the framework's own SpMM).

A custom layer only needs ``build`` (shape + params) and ``apply``
(pure math reading the Forward context).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

import gnntf_tpu as gnntf
from gnntf_tpu.data import dgl_setup
from gnntf_tpu.nn import Dense, Dropout, Layer
from gnntf_tpu.ops import spmm


class HeatKernelDiffusion(Layer):
    """exp(-t L) X via a truncated series: sum_k (t^k / k!) (A_hat - I)^k X.

    Stands in for any external propagation scheme (pygrank in the
    reference demo) — the graph filter is arbitrary user math over the
    normalized adjacency."""

    def build(self, net, t: float = 3.0, terms: int = 8):
        self.t, self.terms = t, terms
        return net.top_shape()

    def apply(self, fw, x):
        adj = fw.adjacency(graph_dropout=0.0)  # deterministic filter
        out = x
        term = x
        for k in range(1, self.terms):
            term = (spmm(adj, term) - term) * (self.t / k)
            out = out + term
        return out


G, labels, features, train, valid, test = dgl_setup("citeseer")
num_classes = len(set(labels))
gnntf.set_seed(0)

model = gnntf.GNN(gnntf.graph2adj(G), features)
model.add(Dropout(0.5))
model.add(Dense(64, activation=jax.nn.relu, dropout=0.5))
model.add(Dense(num_classes, regularize=False))
model.add(HeatKernelDiffusion(t=1.5, terms=8))

model.train(train=gnntf.NodeClassification(train, labels[train]),
            valid=gnntf.NodeClassification(valid, labels[valid]),
            patience=50, epochs=300, block_epochs=25)
pred = model.predict(gnntf.NodeClassification(test))
print("accuracy", gnntf.acc(np.asarray(pred), labels[test]))
