"""One-command real-data onboarding (VERDICT r4 item 8).

The container has zero network egress (BASELINE.md "acquisition
attempts"), so real Planetoid/OGB files must arrive out of band.  This
script converts whatever arrives into the cache files the loaders
(``gnntf_tpu/data/loaders.py``) already read, so the moment files exist
every accuracy/benchmark config runs unchanged:

  * ``planetoid``: kimiyoung/planetoid raw ``ind.<name>.{x,tx,allx,y,ty,
    ally,graph,test.index}`` -> ``data/<name>.dat`` pickle with the
    ``dgl_setup`` tuple ``(nx.DiGraph, labels, features, train, valid,
    test)`` (reference data contract, experiment_setup.py:153-181).
  * ``cites``: citeseer-style ``<name>.cites``/``<name>.content`` -> the
    loaders parse these directly; ingest verifies + warms the ``.dat``
    cache through the real parser.
  * ``ogb``: an OGB node-prop dataset directory (processed csv.gz files:
    ``edge.csv.gz``, ``node-feat.csv.gz``, ``node-label.csv.gz``,
    ``split/*/{train,valid,test}.csv.gz``) OR a raw npz with
    src/dst/features/labels/train/valid/test arrays ->
    ``data/<name>.npz`` in the exact ``ogb_setup`` cache schema.

Usage:
  python scripts/ingest.py planetoid <dir-with-ind.cora.*> cora [--data-dir data]
  python scripts/ingest.py cites <dir-with-name.cites> citeseer
  python scripts/ingest.py ogb <ogb-dataset-dir-or-npz> ogbn-arxiv
  python scripts/ingest.py selftest          # fixture round-trip, no files
"""
import argparse
import gzip
import os
import pickle
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _planetoid_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def ingest_planetoid(src_dir: str, name: str, data_dir: str) -> str:
    """Raw kimiyoung ``ind.*`` files -> ``<name>.dat`` (dgl_setup cache)."""
    import networkx as nx
    import scipy.sparse as sp

    def load(part):
        return _planetoid_pickle(os.path.join(src_dir, f"ind.{name}.{part}"))

    x, tx, allx = (sp.csr_matrix(load(p)) for p in ("x", "tx", "allx"))
    y, ty, ally = (np.asarray(load(p)) for p in ("y", "ty", "ally"))
    graph = load("graph")
    test_idx = np.loadtxt(
        os.path.join(src_dir, f"ind.{name}.test.index"), dtype=np.int64)
    test_sorted = np.sort(test_idx)

    n = int(allx.shape[0] + tx.shape[0])
    features = sp.vstack([allx, tx]).tolil()
    features[test_idx, :] = features[test_sorted, :]
    features = np.asarray(features.todense(), np.float32)
    onehot = np.vstack([ally, ty])
    onehot[test_idx, :] = onehot[test_sorted, :]
    labels = onehot.argmax(1).astype(np.int64)

    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    for u, nbrs in graph.items():
        for v in nbrs:
            G.add_edge(int(u), int(v))

    train = list(range(y.shape[0]))
    valid = list(range(y.shape[0], y.shape[0] + 500))
    test = test_sorted.tolist()
    ret = (G, labels, features, train, valid, test)

    os.makedirs(data_dir, exist_ok=True)
    out = os.path.join(data_dir, f"{name}.dat")
    with open(out, "wb") as f:
        pickle.dump(ret, f)
    return out


def ingest_cites(src_dir: str, name: str, data_dir: str) -> str:
    """Verify citeseer-style files parse, then warm the ``.dat`` cache by
    running them through the production loader chain."""
    import shutil

    os.makedirs(data_dir, exist_ok=True)
    for ext in (".cites", ".content"):
        src = os.path.join(src_dir, name + ext)
        dst = os.path.join(data_dir, name + ext)
        if not os.path.exists(src):
            raise FileNotFoundError(src)
        if os.path.abspath(src) != os.path.abspath(dst):
            shutil.copyfile(src, dst)
    from gnntf_tpu.data import dgl_setup
    root = os.path.dirname(os.path.abspath(data_dir)) or "."
    tup = dgl_setup(name, data_dir=data_dir)
    out = os.path.join(data_dir, f"{name}.dat")
    with open(out, "wb") as f:
        pickle.dump(tup, f)
    return out


def _read_csv_gz(path, dtype):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def ingest_ogb(src: str, name: str, data_dir: str) -> str:
    """OGB processed directory (csv.gz) or raw npz -> ``ogb_setup`` npz."""
    if os.path.isfile(src) and src.endswith(".npz"):
        z = np.load(src)
        need = ("src", "dst", "features", "labels", "train", "valid", "test")
        missing = [k for k in need if k not in z]
        if missing:
            raise ValueError(f"npz missing keys {missing}")
        arrays = {k: z[k] for k in need}
        arrays["n_nodes"] = np.int64(
            z["n_nodes"]) if "n_nodes" in z else np.int64(
            arrays["features"].shape[0])
    else:
        def find(*cands):
            for c in cands:
                p = os.path.join(src, c)
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(f"{cands} under {src}")

        edges = _read_csv_gz(find("raw/edge.csv.gz", "edge.csv.gz",
                                  "raw/edge.csv", "edge.csv"), np.int64)
        feats = _read_csv_gz(find("raw/node-feat.csv.gz", "node-feat.csv.gz",
                                  "raw/node-feat.csv", "node-feat.csv"),
                             np.float32)
        labels = _read_csv_gz(find("raw/node-label.csv.gz",
                                   "node-label.csv.gz", "raw/node-label.csv",
                                   "node-label.csv"), np.int64).reshape(-1)
        split_dir = None
        sd = os.path.join(src, "split")
        if os.path.isdir(sd):
            subs = sorted(os.listdir(sd))
            if subs:
                split_dir = os.path.join(sd, subs[0])
        if split_dir is None:
            raise FileNotFoundError(f"no split/ directory under {src}")

        def split(part):
            return _read_csv_gz(os.path.join(
                split_dir, f"{part}.csv.gz"), np.int64).reshape(-1)

        arrays = dict(src=edges[:, 0], dst=edges[:, 1], features=feats,
                      labels=labels, train=split("train"),
                      valid=split("valid"), test=split("test"),
                      n_nodes=np.int64(feats.shape[0]))
    os.makedirs(data_dir, exist_ok=True)
    out = os.path.join(data_dir, name.replace("-", "_") + ".npz")
    np.savez_compressed(out, **arrays)
    return out


def selftest(tmp_root: str = None) -> None:
    """Round-trip tiny synthetic fixtures of each format through ingest +
    the production loaders (no external files needed)."""
    import shutil
    import tempfile

    import networkx as nx
    import scipy.sparse as sp

    root = tmp_root or tempfile.mkdtemp(prefix="gnntf_ingest_")
    data_dir = os.path.join(root, "data")

    # -- planetoid fixture ------------------------------------------------
    raw = os.path.join(root, "raw_planetoid")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.RandomState(0)
    n_train, n_test, n_other, f, c = 12, 9, 550, 8, 3
    n = n_train + n_other + n_test
    # per-NODE ground truth; raw files store test rows in test.index order
    feat_true = rng.rand(n, f).astype(np.float32)
    lab = rng.randint(0, c, n)
    onehot = np.eye(c, dtype=np.int64)[lab]
    test_index = rng.permutation(np.arange(n_train + n_other, n))
    allx = sp.csr_matrix(feat_true[:n_train + n_other])
    tx = sp.csr_matrix(feat_true[test_index])
    x = allx[:n_train]
    ally = onehot[:n_train + n_other]
    ty = onehot[test_index]
    y = ally[:n_train]
    graph = {i: [int(j) for j in rng.randint(0, n, 3)] for i in range(n)}
    for part, obj in (("x", x), ("tx", tx), ("allx", allx), ("y", y),
                      ("ty", ty), ("ally", ally), ("graph", graph)):
        with open(os.path.join(raw, f"ind.tiny.{part}"), "wb") as fh:
            pickle.dump(obj, fh)
    np.savetxt(os.path.join(raw, "ind.tiny.test.index"), test_index,
               fmt="%d")
    out = ingest_planetoid(raw, "tiny", data_dir)
    from gnntf_tpu.data import dgl_setup, ogb_setup
    G, labels, features, train, valid, test = dgl_setup(
        "tiny", data_dir=data_dir)
    assert features.shape == (n, f) and len(labels) == n
    assert list(train) == list(range(n_train))
    assert len(valid) == 500 and len(test) == n_test
    assert np.array_equal(labels, lab), "label permutation broken"
    print(f"planetoid fixture ok -> {out} "
          f"({G.number_of_nodes()} nodes, {G.number_of_edges()} arcs)")

    # -- ogb npz fixture --------------------------------------------------
    raw_npz = os.path.join(root, "tiny_ogb_raw.npz")
    n2, e2 = 40, 120
    np.savez(raw_npz, src=rng.randint(0, n2, e2),
             dst=rng.randint(0, n2, e2),
             features=rng.rand(n2, 6).astype(np.float32),
             labels=rng.randint(0, 4, n2),
             train=np.arange(0, 20), valid=np.arange(20, 30),
             test=np.arange(30, 40))
    out2 = ingest_ogb(raw_npz, "ogbn-tiny", data_dir)
    g2, lab2, feat2, tr2, va2, te2 = ogb_setup("ogbn-tiny",
                                               data_dir=data_dir)
    assert g2.n_nodes == n2 and feat2.shape == (n2, 6)
    assert len(tr2) == 20 and len(va2) == 10 and len(te2) == 10
    print(f"ogb npz fixture ok -> {out2} ({g2.n_edges} symmetrized edges)")

    # -- ogb csv.gz directory fixture ------------------------------------
    ogb_dir = os.path.join(root, "ogbn_tiny2")
    os.makedirs(os.path.join(ogb_dir, "raw"), exist_ok=True)
    os.makedirs(os.path.join(ogb_dir, "split", "time"), exist_ok=True)

    def _gz(path, arr, fmt):
        with gzip.open(path, "wt") as fh:
            np.savetxt(fh, arr, delimiter=",", fmt=fmt)

    _gz(os.path.join(ogb_dir, "raw", "edge.csv.gz"),
        np.stack([rng.randint(0, n2, e2), rng.randint(0, n2, e2)], 1), "%d")
    _gz(os.path.join(ogb_dir, "raw", "node-feat.csv.gz"),
        rng.rand(n2, 5).astype(np.float32), "%.6f")
    _gz(os.path.join(ogb_dir, "raw", "node-label.csv.gz"),
        rng.randint(0, 4, (n2, 1)), "%d")
    for part, sl in (("train", slice(0, 20)), ("valid", slice(20, 30)),
                     ("test", slice(30, 40))):
        _gz(os.path.join(ogb_dir, "split", "time", f"{part}.csv.gz"),
            np.arange(n2)[sl].reshape(-1, 1), "%d")
    out3 = ingest_ogb(ogb_dir, "ogbn-tiny2", data_dir)
    g3, lab3, feat3, tr3, va3, te3 = ogb_setup("ogbn-tiny2",
                                               data_dir=data_dir)
    assert g3.n_nodes == n2 and feat3.shape == (n2, 5) and len(te3) == 10
    print(f"ogb csv fixture ok -> {out3}")

    if tmp_root is None:
        shutil.rmtree(root, ignore_errors=True)
    print("ingest selftest OK")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=["planetoid", "cites", "ogb", "selftest"])
    ap.add_argument("source", nargs="?", help="source dir / npz file")
    ap.add_argument("name", nargs="?", help="dataset name (cora, ...)")
    ap.add_argument("--data-dir", default=os.path.join(_REPO, "data"))
    args = ap.parse_args()
    if args.kind == "selftest":
        selftest()
        return
    if not args.source or not args.name:
        ap.error("source and name are required")
    fn = {"planetoid": ingest_planetoid, "cites": ingest_cites,
          "ogb": ingest_ogb}[args.kind]
    out = fn(args.source, args.name, args.data_dir)
    print(f"wrote {out}; loaders will now read "
          f"{args.name!r} from {args.data_dir}")


if __name__ == "__main__":
    main()
