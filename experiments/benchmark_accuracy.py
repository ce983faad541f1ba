"""Repeated-experiment accuracy harness (the reference's methodology,
test_experiments.py: N repeats with per-repeat set_seed, bootstrap 95% CI —
its own runner is bit-rotted; this one works).

Run: python experiments/benchmark_accuracy.py [dataset] [model] [repeats]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import gnntf_tpu as gnntf
from gnntf_tpu.config import MODEL_CONFIGS
from gnntf_tpu.data import dgl_setup
from gnntf_tpu.measures import bootstrap_ci

dataset = sys.argv[1] if len(sys.argv) > 1 else "cora"
model_name = sys.argv[2] if len(sys.argv) > 2 else "appnp"
repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 5

G, labels, features, train, valid, test = dgl_setup(dataset)
adj = gnntf.graph2adj(G)
num_classes = len(set(labels))

accuracies = []
for experiment in range(repeats):
    gnntf.set_seed(experiment)
    model = MODEL_CONFIGS[model_name]().build(adj, features, num_classes)
    model.train(train=gnntf.NodeClassification(train, labels[train]),
                valid=gnntf.NodeClassification(valid, labels[valid]),
                patience=100, block_epochs=25)
    pred = model.predict(gnntf.NodeClassification(test))
    accuracies.append(gnntf.acc(np.asarray(pred), labels[test]))
    print(f"repeat {experiment}: acc {accuracies[-1]:.4f}", flush=True)

mean, low, high = bootstrap_ci(accuracies)
print(f"{dataset}/{model_name}: {mean:.4f} [{low:.4f}, {high:.4f}] "
      f"({repeats} repeats, 95% bootstrap CI)")
