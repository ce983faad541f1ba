"""Extension-API demo (the reference's demos/custom_layers.py): compose a
GNN from primitive layers instead of using the model zoo, and adapt a
third-party module via Wrap (the reference wraps Keras layers; here a flax
``linen.Dense`` plays that role).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import gnntf_tpu as gnntf
from gnntf_tpu.data import dgl_setup
from gnntf_tpu.models import PPRIteration
from gnntf_tpu.nn import Dense, Dropout, Wrap

G, labels, features, train, valid, test = dgl_setup("citeseer")
num_classes = len(set(labels))
gnntf.set_seed(0)

architecture = gnntf.GNN(gnntf.graph2adj(G), features)
architecture.add(Dropout(0.5))

try:
    import flax.linen as nn
    architecture.add(Wrap(nn.Dense, 64))  # third-party dense layer
except ImportError:
    architecture.add(Dense(64))

H0 = architecture.add(Dense(num_classes, regularize=False))
for _ in range(10):
    architecture.add(PPRIteration(H0, 0.1))

architecture.train(train=gnntf.NodeClassification(train, labels[train]),
                   valid=gnntf.NodeClassification(valid, labels[valid]),
                   patience=100)
prediction = architecture.predict(gnntf.NodeClassification(test))
print("accuracy", gnntf.acc(np.asarray(prediction), labels[test]))
