"""Parameter initialization schemes.

Named schemes and exact formulas follow the reference variable store
(`gnntf/core/nn/variables.py:17-36` ``WrappedVariable.reset``):

  float x     -> U(-x, x)
  'zero'      -> zeros
  'eye'       -> identity
  'ones'      -> ones
  'xavier'    -> Glorot uniform, limit = sqrt(6 / (fan_in + fan_out))
  'he'        -> He uniform,     limit = sqrt(6 / fan_in)
  'bernouli'  -> +-1/sqrt(shape[1]) with p=1/2   [sic — reference spelling]
  'small'     -> U(-s, s) with s = 1/sqrt(shape[1])   (the default)

Unlike the reference — which allocates zeros at construction and only
materializes real values on ``reset()`` (variables.py:6,:17) — initialization
here is a pure function of an RNG key, the JAX idiom.  ``train()`` draws a
fresh init every call, preserving the reference's reset-on-train semantics
(trainable.py:53).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _fans(shape):
    if len(shape) < 2:
        return (shape[0] if shape else 1, shape[0] if shape else 1)
    return shape[-2], shape[-1]


def init_param(rng: jax.Array, shape, scheme, dtype=jnp.float32) -> jax.Array:
    shape = tuple(shape)
    if hasattr(scheme, "shape"):  # a concrete array (e.g. wrapped-module init)
        return jnp.asarray(scheme, dtype).reshape(shape)
    if isinstance(scheme, (int, float)) and not isinstance(scheme, bool):
        s = float(scheme)
        return jax.random.uniform(rng, shape, dtype, minval=-s, maxval=s)
    if scheme == "zero":
        return jnp.zeros(shape, dtype)
    if scheme == "eye":
        if len(shape) != 2:
            raise ValueError("'eye' init needs a 2D shape")
        return jnp.eye(shape[0], shape[1], dtype=dtype)
    if scheme == "ones":
        return jnp.ones(shape, dtype)
    if scheme == "xavier":
        fan_in, fan_out = _fans(shape)
        limit = (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(rng, shape, dtype, minval=-limit, maxval=limit)
    if scheme == "he":
        fan_in, _ = _fans(shape)
        limit = (6.0 / fan_in) ** 0.5
        return jax.random.uniform(rng, shape, dtype, minval=-limit, maxval=limit)
    if scheme == "bernouli":
        signs = jnp.round(jax.random.uniform(rng, shape, dtype)) * 2.0 - 1.0
        return signs / (shape[1] ** 0.5)
    if scheme == "small":
        s = 1.0 / (shape[1] ** 0.5)
        return jax.random.uniform(rng, shape, dtype, minval=-s, maxval=s)
    raise ValueError(f"Invalid normalization type: {scheme!r}")
