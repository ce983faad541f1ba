"""Dropout with the reference's exact semantics.

``tf.nn.dropout(x, rate)`` zeroes entries with probability ``rate`` and
scales survivors by ``1/(1-rate)`` (reference gnntf/core/nn/layered.py:44-50).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(rng: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    """Inverted dropout; ``rate`` is the drop probability (static)."""
    if rate == 0.0:
        return x
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"dropout rate must be in [0, 1), got {rate}")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros((), x.dtype))
