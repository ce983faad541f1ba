"""Synthetic graph generators for tests and benchmarks.

No reference counterpart (the reference always downloads via DGL,
experiment_setup.py:153-181); needed here because benchmark/CI environments
have no network egress.  ``synthetic_planetoid`` emits the exact framework
data contract tuple ``(G, labels, features, train, valid, test)``
(README.md:14-17) with class structure that rewards propagation, so accuracy
numbers are meaningful.
"""
from __future__ import annotations

import numpy as np


def synthetic_planetoid(n_nodes: int = 2708, n_classes: int = 7,
                        n_features: int = 128, avg_degree: float = 4.0,
                        homophily: float = 0.9, seed: int = 0,
                        train_per_class: int = 20, n_valid: int = 500):
    """Stochastic-block-model citation-style graph with noisy class-indicator
    features.  Returns ``(G, labels, features, train, valid, test)``."""
    import networkx as nx

    rng = np.random.RandomState(seed)
    labels = rng.randint(0, n_classes, size=n_nodes)
    n_edges = int(n_nodes * avg_degree / 2)
    src = rng.randint(0, n_nodes, size=3 * n_edges)
    dst = rng.randint(0, n_nodes, size=3 * n_edges)
    same = labels[src] == labels[dst]
    keep = rng.rand(src.shape[0]) < np.where(same, homophily, 1 - homophily)
    keep &= src != dst
    src, dst = src[keep][:n_edges], dst[keep][:n_edges]

    centers = rng.randn(n_classes, n_features) * 1.2
    features = centers[labels] + rng.randn(n_nodes, n_features)
    features = features.astype(np.float32)

    G = nx.DiGraph()
    G.add_nodes_from(range(n_nodes))
    G.add_edges_from(zip(src.tolist(), dst.tolist()))

    order = rng.permutation(n_nodes)
    train, count = [], {}
    for i in order:
        c = labels[i]
        if count.get(c, 0) < train_per_class:
            train.append(int(i))
            count[c] = count.get(c, 0) + 1
    rest = [int(i) for i in order if int(i) not in set(train)]
    # clamp so small graphs keep a non-empty test split
    n_valid = min(n_valid, len(rest) // 2)
    valid = rest[:n_valid]
    test = rest[n_valid:]
    return G, labels, features, train, valid, test


def random_power_law_edges(n_nodes: int, n_edges: int, alpha: float = 0.8,
                           seed: int = 0):
    """Power-law-ish degree distribution edge list (benchmark graphs at
    ogbn-arxiv scale)."""
    rng = np.random.RandomState(seed)
    # preferential-attachment-flavored sampling via Zipf over node ranks
    ranks = rng.zipf(1.0 + alpha, size=2 * n_edges).astype(np.int64)
    ids = np.minimum(ranks - 1, n_nodes - 1)
    perm = rng.permutation(n_nodes)
    src = perm[ids[:n_edges]]
    dst = perm[(ids[n_edges:] + rng.randint(1, n_nodes, n_edges)) % n_nodes]
    mask = src != dst
    return src[mask], dst[mask]
