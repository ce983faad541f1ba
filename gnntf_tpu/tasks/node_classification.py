"""Node classification task head (reference graph_predictor.py:10-31)."""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import Predictor


class NodeClassification(Predictor):
    """Softmax classification over a set of node ids.

    Loss parity note: the reference applies ``log_softmax`` and then
    softmax-CE *from logits on top of the log-softmax outputs*
    (graph_predictor.py:24-25).  That composition is reproduced literally —
    it is mathematically identical (in value and gradient) to plain softmax
    cross-entropy, but keeping the literal form documents the contract.
    """

    def __init__(self, nodes, labels=None,
                 loss_transform: Optional[Callable] = None):
        self.nodes = jnp.asarray(np.asarray(nodes), jnp.int32)
        self.labels = None if labels is None else jnp.asarray(
            np.asarray(labels), jnp.int32)
        self.loss_transform = loss_transform

    def batch(self):
        return (self.nodes, self.labels)

    def loss(self, acts, batch, params=None):
        nodes, labels = batch
        if labels is None:
            raise ValueError("Evaluation requires node labels")
        feats = acts
        if self.loss_transform is not None:
            feats = self.loss_transform(feats)
        logits = jax.nn.log_softmax(feats[nodes], axis=1)
        # SparseCategoricalCrossentropy(from_logits=True) on log-softmax input
        z = jax.nn.log_softmax(logits, axis=1)
        per_example = -jnp.take_along_axis(z, labels[:, None], axis=1)[:, 0]
        return jnp.mean(per_example)

    def predict(self, acts, batch=None, params=None):
        nodes = self.nodes if batch is None else batch[0]
        return jnp.argmax(acts[nodes], axis=1)

    def evaluate(self, acts, batch=None, params=None):
        nodes, labels = (self.nodes, self.labels) if batch is None else batch
        if labels is None:
            raise ValueError("Evaluation requires node labels")
        preds = jnp.argmax(acts[nodes], axis=1)
        return 1 - jnp.count_nonzero(preds - labels) / preds.shape[0]
