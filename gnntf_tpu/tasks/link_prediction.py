"""Link prediction task heads + negative sampling
(reference: gnntf/core/gnn/graph_predictor.py:34-204).
"""
from __future__ import annotations

import random
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import measures
from .base import Predictor


def _adjacent_to(graph, node):
    """All neighbors of ``node`` in either direction."""
    linked = set(graph.neighbors(node))
    if graph.is_directed():
        linked.update(graph.predecessors(node))
    return linked


def recommend_all(node, graph=None, positive_edges=None, negative_nodes=None):
    """Candidate edge list for one node: its positives (kept in given
    order) followed by every non-adjacent negative (in ``negative_nodes``
    order); output contract = reference graph_predictor.py:34-49."""
    if positive_edges is None:
        positive_edges = [[node, nb] for nb in graph.neighbors(node)]
    if negative_nodes is None:
        negative_nodes = list(graph)
    pos = [[u, v] for u, v in positive_edges if node in (u, v)]
    linked = set() if graph is None else _adjacent_to(graph, node)
    neg = [[node, c] for c in negative_nodes
           if c != node and c not in linked]
    return np.array(pos + neg), [1] * len(pos) + [0] * len(neg)


class negative_sampling:
    """Stateful sampler: per positive edge emits 1 positive + ``samples``
    negatives, interleaved (reference graph_predictor.py:52-98).  Negatives
    are redrawn on every call, rejecting self-edges and existing edges.

    TPU-native differences:

    * rejection sampling runs against a hashed edge set — in C++ when the
      native extension is available (``native/gnntf_native.cc``) — instead
      of the reference's per-candidate ``graph.has_edge`` Python loop (the
      CPU hot spot flagged in SURVEY §3.5);
    * with ``prefetch=True`` (default) every call also kicks a background
      thread that samples the NEXT epoch's negatives into a spare buffer;
      the following call just swaps buffers.  The ctypes sampler call
      releases the GIL, so sampling for epoch e+1 overlaps the device
      step of epoch e and the sampler leaves the epoch's critical path
      entirely (reference hot spot graph_predictor.py:84-94 runs
      *synchronously inside* its loss).  Thread seeds are drawn on the
      calling thread, so realizations stay deterministic under
      ``set_seed`` regardless of scheduling."""

    def __init__(self, positive_edges, graph, samples: int = 1,
                 negative_nodes=None, pool: Optional[int] = None,
                 prefetch: bool = True):
        self.positive_edges = [(int(u), int(v)) for u, v in positive_edges]
        self.samples = samples
        self.graph = graph
        self.negative_nodes = np.asarray(
            list(graph) if negative_nodes is None else negative_nodes,
            dtype=np.int64)
        self.labels = np.tile(np.array([1.0] + [0.0] * samples),
                              len(self.positive_edges))
        self._edge_set = {(int(u), int(v)) for u, v in graph.edges()}
        self._edge_set |= {(v, u) for u, v in self._edge_set}
        self.pool = pool
        if pool is None:
            self._negative_pool = None
        else:
            self._negative_pool = {}
            for u in {u for u, _ in self.positive_edges}:
                self._negative_pool[u] = [
                    self._draw_negative(u, -1) for _ in range(pool)]
        self.edges = np.empty(((1 + samples) * len(self.positive_edges), 2),
                              dtype=np.int64)
        self._first_sample()
        self.prefetch = prefetch
        self._pending = None   # (thread, buffer) of an in-flight prefetch
        self._spare = None

    def _draw_negative(self, u: int, v: int, rng=random) -> int:
        cand = self.negative_nodes
        while True:
            vneg = int(cand[rng.randrange(len(cand))])
            if vneg != u and vneg != v and (u, vneg) not in self._edge_set:
                return vneg

    def _first_sample(self):
        i = 0
        for u, v in self.positive_edges:
            self.edges[i] = (u, v)
            i += 1
            for _ in range(self.samples):
                self.edges[i] = (u, -1)
                i += 1

    def _fill(self, buf: np.ndarray, seed: int):
        """Redraw the negative slots of ``buf`` (positive rows are already
        in place).  All randomness comes from ``seed`` — safe to run on a
        background thread without touching the global RNG stream."""
        try:
            from ..utils.native import negative_sample_native
            filled = negative_sample_native(self, out=buf, seed=seed)
            if filled is not None:
                return
        except ImportError:
            pass
        rng = random.Random(seed)
        i = 0
        for u, v in self.positive_edges:
            i += 1
            if self._negative_pool is not None:
                cands = self._negative_pool[u]
                for _ in range(self.samples):
                    vneg = cands[rng.randrange(len(cands))]
                    while vneg == u or vneg == v:
                        vneg = cands[rng.randrange(len(cands))]
                    buf[i, 1] = vneg
                    i += 1
            else:
                for _ in range(self.samples):
                    buf[i, 1] = self._draw_negative(u, v, rng)
                    i += 1

    def _resample(self):
        self._fill(self.edges, random.randrange(2 ** 62))

    def __call__(self):
        import threading
        if self._pending is not None:
            thread, buf = self._pending
            thread.join()
            self._pending = None
            self.edges, self._spare = buf, self.edges
        else:
            self._resample()
        if self.prefetch:
            if self._spare is None:
                self._spare = self.edges.copy()
            seed = random.randrange(2 ** 62)  # drawn HERE: deterministic
            thread = threading.Thread(target=self._fill,
                                      args=(self._spare, seed), daemon=True)
            thread.start()
            self._pending = (thread, self._spare)
            self._spare = None
        return self.edges, self.labels


class LinkPrediction(Predictor):
    """Edge scoring by (relational) dot product or cosine similarity, with
    BPR ("diff") or binary-cross-entropy loss
    (reference graph_predictor.py:101-151).

    * ``edges`` may be a callable sampler — resampled at every
      predict/loss/evaluate (reference ``_update_labels``).
    * ``gnn`` enables a DistMult-style diagonal relation vector ``r``
      (ones-init, shared name "distmult") registered on the model; its value
      reaches the jitted loss through the ``params`` argument.
    * "diff" loss pairs even/odd rows — assumes the sampler interleaves
      1 positive + 1 negative (negative_sampling with samples=1).
    """

    def __init__(self, edges, labels=None, gnn=None, similarity: str = "dot",
                 loss: str = "diff", regularize: float = 0,
                 batch_size: Union[int, float] = float("inf")):
        if callable(edges):
            self.edge_sampler = edges
            edges, labels = edges()
        else:
            self.edge_sampler = None
        self.batch_size = batch_size
        self.edges = np.asarray(edges)
        self.loss_func = loss
        self.labels = None if labels is None else np.asarray(
            labels, np.float32).reshape(-1)
        self.r = None if gnn is None else gnn.create_var(
            shape=(gnn.top_shape()[1], 1), regularize=0,
            shared_name="distmult", normalization="ones", trainable=True)
        self.similarity = similarity
        self.regularize = regularize
        self._batch_idx = None

    @property
    def static(self) -> bool:
        return self.edge_sampler is None and \
            self.batch_size >= self.edges.shape[0]

    @property
    def supports_stacking(self) -> bool:
        """Sampled tasks with static per-epoch SHAPES can pre-draw a block
        of epochs and hand the trainer a stacked batch to scan over
        (train/trainer._fit_fused) — the per-epoch host round-trip then
        amortizes over the block exactly like the static-task fused path."""
        return self.edge_sampler is not None

    def stack_batches(self, n: int):
        """Draw ``n`` epochs' batches and stack them with a leading epoch
        axis: ``(edges (n, B, 2) int32, labels (n, B) or None)``."""
        edges, labels = [], []
        for _ in range(n):
            self.refresh()
            e = self.edges
            l = self.labels
            if self._batch_idx is not None:
                e = e[self._batch_idx]
                l = None if l is None else l[self._batch_idx]
            edges.append(np.asarray(e, np.int32).copy())
            labels.append(None if l is None else np.asarray(l, np.float32))
        return (jnp.asarray(np.stack(edges)),
                None if labels[0] is None else jnp.asarray(np.stack(labels)))

    # -- host-side state ----------------------------------------------------
    def refresh(self):
        if self.edge_sampler is not None:
            edges, labels = self.edge_sampler()
            self.edges = np.asarray(edges)
            self.labels = None if labels is None else np.asarray(
                labels, np.float32).reshape(-1)
        n_edges = self.edges.shape[0]
        if self.batch_size < n_edges:
            # host-side subsample (reference draws inside loss(),
            # graph_predictor.py:132-133; we draw per refresh for a static
            # device shape)
            self._batch_idx = np.asarray(
                random.sample(range(n_edges), int(self.batch_size)))
        else:
            self._batch_idx = None

    def batch(self):
        edges = self.edges
        labels = self.labels
        if self._batch_idx is not None:
            edges = edges[self._batch_idx]
            labels = None if labels is None else labels[self._batch_idx]
        return (jnp.asarray(edges, jnp.int32),
                None if labels is None else jnp.asarray(labels))

    # -- device-side math ---------------------------------------------------
    def _logits(self, acts, edges, params):
        from ..ops.spmm import edge_dot
        if self.similarity == "cos":
            sumsq = jnp.sum(jnp.square(acts), axis=1, keepdims=True)
            acts = acts * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-12))
        if self.r is None:
            # SDDMM on the candidate edge list
            return edge_dot(edges[:, 0], edges[:, 1], acts)
        # DistMult: <acts[u] * r, acts[v]> — fold r into the left operand
        r = params[self.r]
        return edge_dot(edges[:, 0], edges[:, 1], acts * r[:, 0][None, :],
                        acts)

    def loss(self, acts, batch, params=None):
        edges, labels = batch
        logits = self._logits(acts, edges, params)
        if self.loss_func == "diff":
            # BPR: -mean(log sigma(pos - neg)) over interleaved pairs
            return -jnp.mean(jax.nn.log_sigmoid(logits[0::2] - logits[1::2]))
        per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        return jnp.mean(per)

    def predict(self, acts, batch=None, params=None, to_logits: bool = False):
        edges = self.batch()[0] if batch is None else batch[0]
        logits = self._logits(acts, edges, params)
        return logits if to_logits else jax.nn.sigmoid(logits)

    def evaluate(self, acts, batch=None, params=None):
        b = self.batch() if batch is None else batch
        _, labels = b
        preds = self.predict(acts, b, params)
        return measures.auc(np.asarray(labels), np.asarray(preds))


class MeanLinkPrediction(LinkPrediction):
    """Per-node recommendation evaluation: for every positive node, score
    its positives against all non-adjacent negatives; report mean node-level
    AUC / MAP / precision@k / recall@k / F1@k and catalog coverage, return
    mean F1 (reference graph_predictor.py:154-204)."""

    def __init__(self, *args, graph, positive_nodes=None, negative_nodes=None,
                 k: int = 5, **kwargs):
        super().__init__(*args, **kwargs)
        self.positive_nodes = positive_nodes
        self.negative_nodes = negative_nodes
        self.k = k
        self.graph = graph
        self.parsed_edges = {}
        for u, v in self.edges:
            self.parsed_edges.setdefault(int(u), []).append(int(v))
            self.parsed_edges.setdefault(int(v), []).append(int(u))

    def evaluate(self, acts, batch=None, params=None, verbose: bool = True):
        """Vectorized: per positive node the candidate negatives come from
        one ``isin`` over a hashed symmetric edge table and the scores from
        one matvec against the (relation-weighted) feature matrix — no
        per-candidate ``graph.has_edge`` Python loop (the reference's
        slowest path, graph_predictor.py:182-203; semantics preserved)."""
        k = self.k
        feats = np.asarray(acts)
        if self.similarity == "cos":
            feats = feats / np.sqrt(
                np.maximum((feats ** 2).sum(1, keepdims=True), 1e-12))
        r = None if self.r is None or params is None \
            else np.asarray(params[self.r])
        # logits for (u, t) = <feats[u] * feats[t], r> = (feats[u] * r) . feats[t]
        query = feats if r is None else feats * r[:, 0][None, :]

        positive_nodes = list(self.parsed_edges) \
            if self.positive_nodes is None else self.positive_nodes
        pool = set(v for nbrs in self.parsed_edges.values() for v in nbrs) \
            if self.negative_nodes is None else set(self.negative_nodes)
        neg_pool = np.fromiter(pool, np.int64, len(pool))

        # symmetric edge table of the rejection graph, hashed as u*n + v
        n_ids = feats.shape[0]
        arcs = np.asarray([(int(u), int(v)) for u, v in self.graph.edges()],
                          np.int64).reshape(-1, 2)
        linked = np.unique(np.concatenate([
            arcs[:, 0] * n_ids + arcs[:, 1],
            arcs[:, 1] * n_ids + arcs[:, 0]])) if arcs.size else \
            np.empty(0, np.int64)

        aucs, precs, recs, f1s, maps = [], [], [], [], []
        cov: set = set()
        for node in positive_nodes:
            if node not in self.parsed_edges:
                raise ValueError("Node not found")
            pos_t = np.asarray(self.parsed_edges[node], np.int64)
            keep = (neg_pool != node) & ~np.isin(
                node * n_ids + neg_pool, linked, assume_unique=True)
            targets = np.concatenate([pos_t, neg_pool[keep]])
            labels = np.zeros(targets.shape[0])
            labels[: pos_t.shape[0]] = 1.0
            logits = feats[targets] @ query[node]
            prediction = 1.0 / (1.0 + np.exp(-logits))
            aucs.append(measures.auc(labels, prediction))
            maps.append(measures.avprec(labels, prediction, k))
            precs.append(measures.prec(labels, prediction, k))
            recs.append(measures.rec(labels, prediction, k))
            f1s.append(measures.f1(labels, prediction, k))
            cov.update(targets[np.argsort(prediction)[-k:]].tolist())
        if verbose:
            print(f"Average node AUC {float(np.mean(aucs)):.3f}\t "
                  f"MAP {float(np.mean(maps)):.3f}\t"
                  f"Precision {float(np.mean(precs)):.3f}\t"
                  f"Recall {float(np.mean(recs)):.3f}\t "
                  f"F1 {float(np.mean(f1s)):.3f}\t "
                  f"Coverage {float(len(cov) / len(pool)):.3f}")
        return float(np.mean(f1s))
