"""Canonical end-to-end demo: APPNP node classification over the Planetoid
datasets (the reference's demos/node_classification.py, with its
always-loads-citeseer bug fixed — it ignored the loop variable at :6).

Run: python demos/node_classification.py [cora|citeseer|pubmed ...]
Without DGL or cached data, set GNNTF_TPU_ALLOW_SYNTHETIC=1 to use the
synthetic stand-in datasets.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import gnntf_tpu as gnntf
from gnntf_tpu.data import dgl_setup

datasets = sys.argv[1:] or ["cora", "citeseer", "pubmed"]

for dataset in datasets:
    G, labels, features, train, valid, test = dgl_setup(dataset)
    gnntf.set_seed(0)
    gnn = gnntf.APPNP(gnntf.graph2adj(G), features,
                      num_classes=len(set(labels)))
    gnn.train(train=gnntf.NodeClassification(train, labels[train]),
              valid=gnntf.NodeClassification(valid, labels[valid]),
              patience=100, verbose=True)
    prediction = gnn.predict(gnntf.NodeClassification(test))
    accuracy = gnntf.acc(np.asarray(prediction), labels[test])
    print(f"{dataset}: accuracy {accuracy:.3f}")
