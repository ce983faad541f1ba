"""Bipartite recommendation demo (the reference's
demos/development/library_recommendation.py): a featureless app<->library
graph where node representations come from a learnable ``Structural``
embedding preprocessor, trained with BPR and a learning-rate ``degradation``
schedule.

The reference loads Android app/library CSVs (tpl_setup); without that
data this demo synthesizes an equivalent bipartite graph.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import gnntf_tpu as gnntf
from gnntf_tpu.data import tpl_setup

G, apps, libraries, features = tpl_setup()  # synthetic fallback when no CSVs
gnntf.set_seed(0)

adj = gnntf.graph2adj(G)
gnn = gnntf.NGCF(
    adj, features, num_classes=16,
    preprocessor=gnntf.Structural(dims=32, bipartite=len(apps),
                                  l2_contraint=True))

edges = [(u, v) for u, v in G.edges()]
sampler = gnntf.negative_sampling(edges, G, samples=1)
gnn.train(
    train=gnntf.LinkPrediction(lambda: sampler(), gnn=gnn, loss="diff"),
    patience=30, epochs=200,
    degradation=lambda epoch: 0.1 if epoch > 150 else 1.0)

evaluation = gnntf.MeanLinkPrediction(
    np.asarray(edges), np.ones(len(edges)), gnn=gnn, graph=G, k=3)
print("mean F1@3:", float(gnn.evaluate(evaluation)))
