"""The Predictor protocol: predictive tasks decoupled from architectures.

This is the framework's central idea inherited from the reference
(README.md:1-4, trainable.py:5-13): an architecture is bound to one graph +
feature matrix, and *tasks* are passed to ``train()``/``predict()`` — train,
valid and test tasks may differ.

TPU-native split: each task separates its *device-side pure math*
(``loss(acts, batch)`` — jitted inside the training step) from *host-side
state* (``refresh()`` resampling + ``batch()`` producing fixed-shape device
arrays), so samplers never run Python inside the hot loop.
"""
from __future__ import annotations

from typing import Any

import jax


class Predictor:
    """Task interface (reference trainable.py:5-13)."""

    def refresh(self) -> None:
        """Host-side per-use resampling hook (e.g. negative sampling)."""

    @property
    def static(self) -> bool:
        """True when ``batch()`` is identical across epochs — enables the
        fused multi-epoch on-device training path (fit(block_epochs=N))."""
        return True

    def batch(self) -> Any:
        """Fixed-shape pytree of device arrays consumed by loss/predict."""
        return ()

    def loss(self, acts: jax.Array, batch: Any, params=None) -> jax.Array:
        """Pure, jittable loss over the full-graph activations.  ``params``
        is the model's parameter pytree, for heads owning model parameters
        (e.g. LinkPrediction's DistMult relation vector)."""
        raise NotImplementedError(
            "Predictors need to implement a loss method")

    def predict(self, acts: jax.Array, batch: Any, params=None):
        raise NotImplementedError(
            "Predictors need to implement a predict method")

    def evaluate(self, acts: jax.Array, batch: Any, params=None):
        raise NotImplementedError(
            "Predictors need to implement an evaluate method")
