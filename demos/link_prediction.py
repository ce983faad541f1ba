"""Link prediction with in-the-loop negative sampling (the reference's
demos/development/demo_link_prediction.py): NGCF trained with BPR loss on
1 positive + 1 negative per edge resampled each epoch, AUC-validated on a
held-out edge sample, and evaluated with per-node recommendation metrics
(MeanLinkPrediction)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import gnntf_tpu as gnntf
from gnntf_tpu.data import dgl_setup, sample_edges

G, labels, features, *_ = dgl_setup("cora")
gnntf.set_seed(0)

eval_edges, eval_labels = sample_edges(G)  # 1 pos + 2 structured negs each

adj = gnntf.graph2adj(G)
gnn = gnntf.NGCF(adj, features, num_classes=16)

train_edges = [(u, v) for u, v in eval_edges[eval_labels == 1]]
sampler = gnntf.negative_sampling(train_edges, G, samples=1)
gnn.train(
    train=gnntf.LinkPrediction(lambda: sampler(), gnn=gnn, loss="diff"),
    valid=gnntf.LinkPrediction(eval_edges, eval_labels, gnn=gnn,
                               loss="bce"),
    patience=50, epochs=300)

auc = gnn.evaluate(gnntf.LinkPrediction(eval_edges, eval_labels,
                                        gnn=gnn, loss="bce"))
print("AUC:", float(auc))

evaluation = gnntf.MeanLinkPrediction(eval_edges, eval_labels, gnn=gnn,
                                      loss="bce", graph=G, k=5)
f1 = gnn.evaluate(evaluation)
print("mean F1@5:", float(f1))
