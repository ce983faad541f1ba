"""Evaluation measures + global seeding (reference: gnntf/measures.py).

Formula parity notes (reference file:line):
  acc      :13-14  fraction of exact matches
  auc      :17-19  sklearn ROC AUC
  avprec   :22-27  average precision @k, normalized by sum of labels in top-k
  rec      :30-32  recall @k
  prec     :35-37  mean of labels in top-k
  f1       :40-45  harmonic mean of prec/rec @k
"""
from __future__ import annotations

import random

import numpy as np

_GLOBAL_SEED_STATE = {"counter": 0, "seed": None}


def set_seed(seed: int) -> None:
    """Seed python/numpy plus the framework's JAX key stream
    (reference measures.py:7-10 seeds python/numpy/TF)."""
    random.seed(seed)
    np.random.seed(seed)
    _GLOBAL_SEED_STATE["seed"] = int(seed)
    _GLOBAL_SEED_STATE["counter"] = 0


def next_seed() -> int:
    """Draw a deterministic fresh seed for train()/init() calls, so repeated
    experiments under ``set_seed(k)`` are reproducible like the reference."""
    if _GLOBAL_SEED_STATE["seed"] is None:
        return int(np.random.randint(0, 2**31 - 1))
    _GLOBAL_SEED_STATE["counter"] += 1
    return (_GLOBAL_SEED_STATE["seed"] * 1000003
            + _GLOBAL_SEED_STATE["counter"]) % (2**31 - 1)


def acc(predictions, labels):
    predictions = np.asarray(predictions)
    labels = np.asarray(labels)
    return 1 - np.count_nonzero(predictions - labels) / predictions.shape[0]


def auc(labels, predictions):
    from sklearn import metrics

    fpr, tpr, _ = metrics.roc_curve(labels, predictions, pos_label=1)
    return metrics.auc(fpr, tpr)


def avprec(labels, predictions, k: int = 5):
    """Average precision @k with the reference's own normalization: the
    label-weighted reciprocal-rank sum over the top-k, divided by the sum
    of labels *in the top-k* (not min(k, positives) — that quirk IS the
    spec, reference measures.py:27)."""
    labels = np.asarray(labels)
    predictions = np.asarray(predictions)
    top_desc = np.argsort(predictions)[-k:][::-1]
    hits = labels[top_desc].astype(np.float64)
    nom = float(np.sum(hits / (np.arange(hits.shape[0]) + 1.0)))
    return 0 if nom == 0 else nom / np.sum(hits)


def rec(labels, predictions, k: int = 5):
    labels = np.asarray(labels)
    top = np.argsort(np.asarray(predictions))[-k:]
    return np.sum(labels[top]) / np.sum(labels)


def prec(labels, predictions, k: int = 5):
    labels = np.asarray(labels)
    top = np.argsort(np.asarray(predictions))[-k:]
    return np.mean(labels[top])


def f1(labels, predictions, k: int = 5):
    precision = prec(labels, predictions, k)
    recall = rec(labels, predictions, k)
    if precision + recall == 0:
        return 0
    return 2 * precision * recall / (precision + recall)


def bootstrap_ci(values, confidence: float = 0.95, n_boot: int = 10000,
                 seed: int = 0):
    """Bootstrap confidence interval over repeated-experiment results
    (the reference's experiment methodology, test_experiments.py:8-22:
    N repeats with set_seed(i), then a bootstrap CI of the mean).

    Returns ``(mean, low, high)``.
    """
    values = np.asarray(values, np.float64)
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, len(values), size=(n_boot, len(values)))
    means = values[idx].mean(axis=1)
    alpha = (1.0 - confidence) / 2
    return (float(values.mean()),
            float(np.quantile(means, alpha)),
            float(np.quantile(means, 1 - alpha)))
