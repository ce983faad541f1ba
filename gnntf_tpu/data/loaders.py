"""Dataset loading + split utilities
(reference: experiments/experiment_setup.py — the de-facto data layer).

The framework-wide data contract is the tuple
``(G, labels, features, train, valid, test)`` (README.md:14-17):
a directed networkx graph, numpy label/feature arrays in graph-iteration
order, and three index lists.
"""
from __future__ import annotations

import os
import pickle
import random
from typing import Optional

import numpy as np


def dgl_setup(dataset_name: str, data_dir: str = "data"):
    """Canonical loader (reference experiment_setup.py:153-181): DGL
    Cora/Citeseer/Pubmed with a pickle cache.  Fallback order here:
    pickle cache -> DGL (if installed) -> citeseer-style files on disk ->
    deterministic synthetic stand-in (flagged via env
    ``GNNTF_TPU_ALLOW_SYNTHETIC=1``) -> error."""
    import networkx as nx

    cache = os.path.join(data_dir, dataset_name + ".dat")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    try:
        from dgl.data import (CiteseerGraphDataset, CoraGraphDataset,
                              PubmedGraphDataset)
        loaders = {"cora": CoraGraphDataset, "citeseer": CiteseerGraphDataset,
                   "pubmed": PubmedGraphDataset}
        if dataset_name not in loaders:
            raise ValueError("Invalid dataset name")
        data = loaders[dataset_name](verbose=False)
        g = data[0]
        features = g.ndata["feat"].numpy()
        labels = g.ndata["label"].numpy()
        G = nx.DiGraph()
        U, V = g.edges()
        G.add_nodes_from(g.nodes().numpy().tolist())
        G.add_edges_from(zip(U.numpy().tolist(), V.numpy().tolist()))
        ret = (G, labels, features,
               np.where(g.ndata["train_mask"])[0].tolist(),
               np.where(g.ndata["val_mask"])[0].tolist(),
               np.where(g.ndata["test_mask"])[0].tolist())
        os.makedirs(data_dir, exist_ok=True)
        with open(cache, "wb") as f:
            pickle.dump(ret, f)
        return ret
    except ImportError:
        pass
    cites = os.path.join(data_dir, dataset_name + ".cites")
    if os.path.exists(cites):
        G, features, labels = load(dataset_name, data_dir=data_dir)
        feats = np.array([features[u] for u in G], np.float32)
        label_ids = {l: i for i, l in enumerate(sorted(set(labels.values())))}
        labs = np.array([label_ids[labels[u]] for u in G])
        train, valid, test = custom_splits(labs, num_validation=500)
        return G, labs, feats, train, valid, test
    if os.environ.get("GNNTF_TPU_ALLOW_SYNTHETIC") == "1":
        from .synthetic import synthetic_planetoid
        sizes = {"cora": (2708, 7, 1433), "citeseer": (3327, 6, 3703),
                 "pubmed": (19717, 3, 500)}
        n, c, f = sizes.get(dataset_name, (2708, 7, 256))
        return synthetic_planetoid(n_nodes=n, n_classes=c,
                                   n_features=min(f, 512))
    raise FileNotFoundError(
        f"No cached/offline data for {dataset_name!r} and DGL is not "
        f"installed; place a pickle at {cache} or set "
        f"GNNTF_TPU_ALLOW_SYNTHETIC=1 for a synthetic stand-in")


def ogb_setup(dataset_name: str = "ogbn-arxiv", data_dir: str = "data"):
    """OGB node-property loader at array scale (BASELINE config 5 uses
    ogbn-arxiv for the multi-host scaling benchmark).

    Unlike :func:`dgl_setup` this returns the graph as a framework
    :class:`~gnntf_tpu.graph.coo.Graph` (COO arrays) rather than a networkx
    object — at 10^5+ nodes the Python-object graph is not a useful
    intermediate on the TPU path.  Tuple shape otherwise matches the data
    contract: ``(graph, labels, features, train, valid, test)``.

    Fallback order: npz cache -> ``ogb`` package (if installed) ->
    deterministic synthetic stand-in of the same scale (gated by
    ``GNNTF_TPU_ALLOW_SYNTHETIC=1``) -> error.
    """
    from ..graph import from_edges

    cache = os.path.join(data_dir, dataset_name.replace("-", "_") + ".npz")
    if os.path.exists(cache):
        z = np.load(cache)
        graph = from_edges(z["src"], z["dst"], n_nodes=int(z["n_nodes"]),
                           directed=False)
        return (graph, z["labels"], z["features"],
                z["train"].tolist(), z["valid"].tolist(), z["test"].tolist())
    try:
        from ogb.nodeproppred import NodePropPredDataset
        dataset = NodePropPredDataset(name=dataset_name, root=data_dir)
        split = dataset.get_idx_split()
        g, labels = dataset[0]
        src, dst = g["edge_index"]
        features = g["node_feat"].astype(np.float32)
        labels = labels.reshape(-1).astype(np.int64)
        os.makedirs(data_dir, exist_ok=True)
        np.savez_compressed(
            cache, src=src, dst=dst, n_nodes=np.int64(g["num_nodes"]),
            labels=labels, features=features,
            train=np.asarray(split["train"]),
            valid=np.asarray(split["valid"]),
            test=np.asarray(split["test"]))
        graph = from_edges(src, dst, n_nodes=int(g["num_nodes"]),
                           directed=False)
        return (graph, labels, features, split["train"].tolist(),
                split["valid"].tolist(), split["test"].tolist())
    except Exception as exc:  # noqa: BLE001 — ogb missing OR its download/IO
        # failed (e.g. no egress): both fall through to the synthetic
        # stand-in so the loader chain matches its documented behavior
        ogb_error = exc
    if os.environ.get("GNNTF_TPU_ALLOW_SYNTHETIC") == "1":
        from .synthetic import random_power_law_edges
        sizes = {"ogbn-arxiv": (169_343, 1_166_243, 128, 40)}
        n, e, f, c = sizes.get(dataset_name, (100_000, 800_000, 128, 16))
        rng = np.random.RandomState(0)
        src, dst = random_power_law_edges(n, e, seed=0)
        graph = from_edges(src, dst, n_nodes=n, directed=False)
        labels = rng.randint(0, c, size=n).astype(np.int64)
        features = rng.randn(n, f).astype(np.float32)
        order = rng.permutation(n)
        n_tr, n_va = int(0.54 * n), int(0.18 * n)
        return (graph, labels, features, order[:n_tr].tolist(),
                order[n_tr:n_tr + n_va].tolist(),
                order[n_tr + n_va:].tolist())
    raise FileNotFoundError(
        f"No cached/offline data for {dataset_name!r} and the ogb loader "
        f"failed ({ogb_error!r}); place an npz at {cache} or set "
        f"GNNTF_TPU_ALLOW_SYNTHETIC=1 for a synthetic stand-in")


_loaded = {}


def load(dataset_name: str, data_dir: str = "data"):
    """citeseer-style ``.cites``/``.content`` or ``.npz`` CSR loader with
    in-memory memo (reference experiment_setup.py:260-323)."""
    if dataset_name in _loaded:
        G, features, labels = _loaded[dataset_name]
        return G.copy(), features, labels
    if ".npz" in dataset_name:
        G, features, labels = _np_load(dataset_name, data_dir)
    else:
        G, features, labels = _dataload(dataset_name, data_dir)
    _loaded[dataset_name] = (G, features, labels)
    return G, features, labels


def _np_load(dataset_name, data_dir):
    import networkx as nx
    from scipy.sparse import csr_matrix

    loc = np.load(os.path.join(data_dir, dataset_name), allow_pickle=True)
    adj = csr_matrix((loc["adj_matrix.data"], loc["adj_matrix.indices"],
                      loc["adj_matrix.indptr"]), shape=loc["adj_matrix.shape"],
                     dtype=float)
    attr = csr_matrix((loc["attr_matrix.data"], loc["attr_matrix.indices"],
                       loc["attr_matrix.indptr"]),
                      shape=loc["attr_matrix.shape"], dtype=float)
    G = nx.from_scipy_sparse_array(adj, create_using=nx.DiGraph)
    attr = np.asarray(attr.todense())
    features = {u: attr[u].tolist() for u in range(len(G))}
    labels = {u: label for u, label in enumerate(loc["labels"])}
    return G, features, labels


def _dataload(dataset_name, data_dir):
    import networkx as nx

    G = nx.DiGraph()
    with open(os.path.join(data_dir, dataset_name + ".cites")) as file:
        for line in file:
            edge = line.rstrip("\n").split("\t")
            if len(edge) < 2:
                continue
            u = edge[-2].split(":")[-1]
            v = edge[-1].split(":")[-1]
            if u != v:
                G.add_edge(u, v)
    features, labels = {}, {}
    feature_map = None
    with open(os.path.join(data_dir, dataset_name + ".content")) as file:
        for line in file:
            line = line.rstrip("\n").split("\t")
            if line[0] == "NODE":
                continue
            if ":label" in line[0]:
                feature_map = [var.split(":")[1] for var in line[2:]]
                continue
            if line[0] not in G:
                continue
            if feature_map is not None:
                line_feats = {val.split("=")[0]: val.split("=")[1]
                              for val in line[2:]}
                line_feats["summary"] = 0
                features[line[0]] = [float(line_feats.get(val, 0))
                                     for val in feature_map]
                labels[line[0]] = line[1]
            else:
                features[line[0]] = [float(val) for val in line[1:-1]]
                labels[line[0]] = line[-1]
    for u in list(G):
        if u not in features:
            G.remove_node(u)
    return G, features, labels


def custom_splits(labels, examples_per_class: int = 20,
                  num_validation: Optional[int] = 500, seed: int = 0):
    """Planetoid-style splits: ``examples_per_class`` train nodes per class,
    ``num_validation`` validation nodes, rest test
    (reference experiment_setup.py:183-201)."""
    random.seed(seed)
    labels = np.asarray(labels)
    order = list(range(labels.shape[0]))
    random.shuffle(order)
    count, training_idx = {}, []
    for pos in order:
        if labels[pos] == -1:
            continue
        if count.get(labels[pos], 0) < examples_per_class:
            training_idx.append(pos)
            count[labels[pos]] = count.get(labels[pos], 0) + 1
    test_idx = list(set(pos for pos in range(labels.shape[0])
                        if labels[pos] != -1) - set(training_idx))
    random.shuffle(test_idx)
    if num_validation is None:
        num_validation = len(count) * examples_per_class
    valid_idx = test_idx[:num_validation]
    test_idx = test_idx[num_validation:]
    return training_idx, valid_idx, test_idx


def random_splits(labels, training: float = 0.6, validation: float = 0.2,
                  seed: int = 0):
    """Fraction-based random splits (reference experiment_setup.py:204-210)."""
    random.seed(seed)
    labels = np.asarray(labels)
    order = list(range(labels.shape[0]))
    random.shuffle(order)
    sep_training = int(len(order) * training)
    sep_valid = int(len(order) * (training + validation))
    return order[:sep_training], order[sep_training:sep_valid], order[sep_valid:]


def sample_edges(G):
    """Link-prediction dataset builder: per edge, 1 positive + 2 structured
    negatives (corrupt head / corrupt tail)
    (reference experiment_setup.py:25-41)."""
    node2id = {u: idx for idx, u in enumerate(G)}
    nodes = list(G)
    edges = [[node2id[u], node2id[v]] for u, v in G.edges() if u != v]
    labels = [1] * len(edges) + [0] * (2 * len(edges))
    for u, v in G.edges():
        if u == v:
            continue
        neg = v
        while neg == u or neg == v or G.has_edge(u, neg):
            neg = random.choice(nodes)
        edges.append([node2id[u], node2id[neg]])
        neg = v
        while neg == u or neg == v or G.has_edge(neg, v):
            neg = random.choice(nodes)
        edges.append([node2id[neg], node2id[v]])
    return np.array(edges), np.array(labels)


def enrich_features(features, positional: bool = True, labels=None,
                    train=None):
    """Optional label one-hots for train nodes + binary positional encodings
    (reference experiment_setup.py:7-22)."""
    features = np.asarray(features)
    if labels is not None:
        labels = np.asarray(labels)
        num_classes = len(set(labels.tolist()))
        label_features = np.zeros((features.shape[0], num_classes))
        for i in train:
            label_features[i][labels[i]] = 1
        features = np.concatenate((features, label_features), axis=1)
    if positional:
        num_positions = int(1.5 + np.log2(features.shape[0] + 1))
        positional_features = np.zeros((features.shape[0], num_positions))
        for i in range(features.shape[0]):
            bits = bin(i + 1)[2:]
            norm = sum(float(val) for val in bits)
            for pos, val in enumerate(bits):
                positional_features[i][num_positions - 1 - pos] = \
                    float(val) / norm
        features = np.concatenate((features, positional_features), axis=1)
    return features


def tpl_setup(app_csv=None, library_csv=None, min_df: int = 3,
              min_out_degree: int = 10, n_apps: int = 200,
              n_libraries: int = 120, seed: int = 0):
    """Android app<->library bipartite graph from CSVs with bag-of-words
    features (reference experiment_setup.py:70-122: min-df 3 token filter,
    app out-degree >= 10 filter).  Without CSV paths, synthesizes an
    equivalent bipartite graph with planted app communities so demos and
    tests run in egress-free environments.

    Returns ``(nx.DiGraph, app_ids, library_ids, features)`` with apps
    numbered first (the layout ``Structural(bipartite=len(apps))`` expects,
    reference demos/development/library_recommendation.py:46-48).
    """
    import networkx as nx

    if app_csv is not None:
        import csv

        usage = {}
        tokens = {}
        with open(app_csv) as f:
            for row in csv.reader(f):
                app, libs, words = row[0], row[1].split(";"), row[2].split()
                usage[app] = [l for l in libs if l]
                tokens[app] = words
        usage = {a: ls for a, ls in usage.items()
                 if len(ls) >= min_out_degree}
        df = {}
        for words in tokens.values():
            for w in set(words):
                df[w] = df.get(w, 0) + 1
        vocab = sorted(w for w, c in df.items() if c >= min_df)
        apps = sorted(usage)
        libraries = sorted({l for ls in usage.values() for l in ls})
        app_id = {a: i for i, a in enumerate(apps)}
        lib_id = {l: len(apps) + i for i, l in enumerate(libraries)}
        G = nx.DiGraph()
        G.add_nodes_from(range(len(apps) + len(libraries)))
        for a, ls in usage.items():
            for l in ls:
                G.add_edge(app_id[a], lib_id[l])
        widx = {w: i for i, w in enumerate(vocab)}
        features = np.zeros((len(apps) + len(libraries), len(vocab)),
                            np.float32)
        for a in apps:
            for w in tokens[a]:
                if w in widx:
                    features[app_id[a], widx[w]] = 1.0
        return G, list(range(len(apps))), \
            list(range(len(apps), len(apps) + len(libraries))), features

    # synthetic stand-in: apps pick libraries from their community's pool
    rng = np.random.RandomState(seed)
    n_comm = 6
    G = nx.DiGraph()
    G.add_nodes_from(range(n_apps + n_libraries))
    lib_comm = rng.randint(0, n_comm, n_libraries)
    for a in range(n_apps):
        comm = a % n_comm
        pool = n_apps + np.flatnonzero(lib_comm == comm)
        other = n_apps + np.arange(n_libraries)
        picks = set(rng.choice(pool, size=min(8, len(pool)), replace=False))
        picks |= set(rng.choice(other, size=3, replace=False))
        for l in picks:
            G.add_edge(a, int(l))
    features = np.zeros((n_apps + n_libraries, 0), np.float32)
    return G, list(range(n_apps)), \
        list(range(n_apps, n_apps + n_libraries)), features
