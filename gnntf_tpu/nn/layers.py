"""The generic NN layer zoo (reference: gnntf/core/nn/layers.py).

Every layer here reproduces the corresponding reference layer's math; flow
control (Branch/Resume/Concatenate/Tradeoff) becomes functional indexing into
the per-trace activation list instead of mutable ``.value`` caches.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from .core import Forward, Layer, Network

relu = jax.nn.relu


class Dense(Layer):
    """W (in, out) 'small'-init + optional zero-init bias;
    ``activation(x @ W + b)`` then output dropout
    (reference layers.py:125-136).  ``outputs=None`` defaults to the input
    width; ``regularize`` feeds the global L2 term."""

    def build(self, net: Network, outputs: Optional[int] = None,
              activation: Callable = lambda x: x, bias: bool = True,
              dropout: float = 0.0, regularize: bool = True):
        n, d = net.top_shape()
        if outputs is None:
            outputs = d
        self.W = net.create_param((d, outputs), regularize=regularize)
        self.b = net.create_param((1, outputs), "zero", regularize=regularize) \
            if bias else None
        self.activation = activation
        self.dropout_rate = dropout
        return (n, outputs)

    def apply(self, fw: Forward, x):
        y = jnp.dot(x, fw.param(self.W), preferred_element_type=x.dtype)
        if self.b is not None:
            y = y + fw.param(self.b)
        return fw.dropout(self.activation(y), self.dropout_rate)


class Dropout(Layer):
    """Mode-aware feature dropout (reference layers.py:175-181)."""

    def build(self, net: Network, rate: float = 0.5):
        self.rate = rate
        return net.top_shape()

    def apply(self, fw: Forward, x):
        return fw.dropout(x, self.rate)


class Activation(Layer):
    """String-dispatched activations incl. learnable variants
    (reference layers.py:139-172):

      relu / linear / tanh / exp / softmax(axis=1)
      scale      — x * (1 + s), s zero-init learnable scalar
      kernel     — log(sum of 3 learnable exp-affine maps)
      softthresh — soft threshold, fixed or learnable theta
    """

    def build(self, net: Network, activation: str = "relu", **kwargs):
        self.kind = activation
        if activation == "scale":
            self.s = net.create_param((1, 1), "zero", regularize=False)
        elif activation == "kernel":
            self.scales = [
                net.create_param((1, 1), "ones", regularize=False),
                net.create_param((1, 1), "zero", regularize=False),
                net.create_param((1, 1), "zero", regularize=False),
                net.create_param((1, 1), "zero", regularize=False),
                net.create_param((1, 1), "zero", regularize=False),
                net.create_param((1, 1), "zero", regularize=False),
            ]
        elif activation == "softthresh":
            if "threshold" in kwargs:
                self.theta = float(kwargs["threshold"])
                self.theta_param = None
            else:
                self.theta = None
                self.theta_param = net.create_param((1, 1), "zero",
                                                    regularize=False)
        return net.top_shape()

    def apply(self, fw: Forward, x):
        k = self.kind
        if k == "relu":
            return jax.nn.relu(x)
        if k == "linear":
            return x
        if k == "tanh":
            return jnp.tanh(x)
        if k == "exp":
            return jnp.exp(x)
        if k == "softmax":
            return jax.nn.softmax(x, axis=1)
        if k == "scale":
            return x * (1.0 + fw.param(self.s))
        if k == "kernel":
            s1, s2, s3, s4, s5, s6 = (fw.param(p) for p in self.scales)
            return jnp.log(jnp.exp(x * s1 + s4) + jnp.exp(x * s2 + s5)
                           + jnp.exp(x * s3 + s6))
        if k == "softthresh":
            theta = self.theta if self.theta is not None \
                else fw.param(self.theta_param)
            return jax.nn.relu(x - theta) - jax.nn.relu(theta - x)
        raise ValueError(f"Unknown activation {k!r}")


class Branch(Layer):
    """Injects a constant tensor, ignoring the running features
    (reference layers.py:68-74) — restarts the trunk from external data."""

    def build(self, net: Network, features):
        self.features = jnp.asarray(features)
        return tuple(self.features.shape)

    def apply(self, fw: Forward, x):
        return self.features


class Resume(Layer):
    """Re-emits another layer's output from this forward pass
    (reference layers.py:77-83) — restarts the trunk at an earlier point."""

    def build(self, net: Network, H0: Layer):
        self.H0 = H0
        return H0.output_shape

    def apply(self, fw: Forward, x):
        return fw.value_of(self.H0)


class Concatenate(Layer):
    """Feature-wise concatenation with other layers' outputs.

    The reference declares axis-1 shapes in ``__build__`` (layers.py:93,:96)
    but concatenates on axis 0 in ``__forward__`` (:100-101) and, in list
    form, drops the running features — a latent bug its own NGCF model hits.
    We implement the declared axis-1 contract: pair form concatenates
    ``[x, H0]`` feature-wise; list form concatenates all listed layers'
    outputs feature-wise (the NGCF paper's layer-embedding concat).
    """

    def build(self, net: Network, H0: Union[Layer, List[Layer]]):
        self.H0 = H0
        n = net.top_shape()[0]
        if isinstance(H0, list):
            for H in H0:
                if H.output_shape[0] != n:
                    raise ValueError(
                        f"Mismatching first dimension to concatenate: "
                        f"{net.top_shape()} vs {H.output_shape}")
            width = sum(H.output_shape[1] for H in H0)
            return (n, width)
        if H0.output_shape[0] != n:
            raise ValueError(
                f"Mismatching first dimension to concatenate: "
                f"{net.top_shape()} vs {H0.output_shape}")
        return (n, net.top_shape()[1] + H0.output_shape[1])

    def apply(self, fw: Forward, x):
        if isinstance(self.H0, list):
            return jnp.concatenate([fw.value_of(H) for H in self.H0], axis=1)
        return jnp.concatenate([x, fw.value_of(self.H0)], axis=1)


class Tradeoff(Layer):
    """Learnable sigmoid-weighted convex combination of layer outputs
    (reference layers.py:104-122, minus its per-forward debug print)."""

    def build(self, net: Network, layers: Sequence[Layer], weights=None,
              trainable: bool = True):
        shape = layers[0].output_shape
        for layer in layers:
            if layer.output_shape != shape:
                raise ValueError("Mismatching trade-off dimensions")
        self.sources = list(layers)
        if weights is None:
            self.weight_params = [
                net.create_param((1, 1), "zero", trainable=trainable,
                                 regularize=True)
                for _ in layers]
            self.fixed_weights = None
        else:
            self.weight_params = None
            self.fixed_weights = [jnp.asarray(w) for w in weights]
        return shape

    def apply(self, fw: Forward, x):
        if self.weight_params is not None:
            ws = [jax.nn.sigmoid(fw.param(p)) for p in self.weight_params]
        else:
            ws = [jax.nn.sigmoid(w) for w in self.fixed_weights]
        total = sum(ws)
        out = 0.0
        for w, layer in zip(ws, self.sources):
            out = out + w * fw.value_of(layer) / total
        return out


class Wrap(Layer):
    """Adapt an external module (reference layers.py:45-65 wraps Keras
    layers; here we wrap any flax ``linen.Module`` or a plain
    ``(init_fn, apply_fn)`` pair).  The wrapped parameters join the model's
    pytree under one name; per-parameter regularization can be set via
    ``regularize``."""

    def build(self, net: Network, module, *args, dropout: float = 0.0,
              regularize: bool = False, rng: int = 0, **kwargs):
        import numpy as np
        n, d = net.top_shape()
        if isinstance(module, type):
            mod = module(*args, **kwargs)  # a flax Module class
        else:
            mod = module  # an already-constructed module instance
        dummy = jnp.zeros((1, d), net.dtype)
        variables = mod.init(jax.random.PRNGKey(rng), dummy)
        out = mod.apply(variables, dummy)
        self.module = mod
        self._template = variables
        leaves, treedef = jax.tree_util.tree_flatten(variables)
        self._treedef = treedef
        self.leaf_names = []
        for i, leaf in enumerate(leaves):
            reg_shape = np.shape(leaf) if np.ndim(leaf) >= 2 \
                else (1,) + tuple(np.shape(leaf))
            # register with the module's own concrete init values so init()
            # reproduces them (parameter re-inits on every train() still
            # restart from these, matching Wrap's no-op reset,
            # reference layers.py:51-54)
            name = net.create_param(
                reg_shape, np.asarray(leaf).reshape(reg_shape),
                regularize=regularize, name=f"wrap{self.index}_{i}")
            self.leaf_names.append((name, np.shape(leaf)))
        self.dropout_rate = dropout
        return (n, int(out.shape[-1]))

    def apply(self, fw: Forward, x):
        leaves = [fw.param(name).reshape(shape)
                  for name, shape in self.leaf_names]
        variables = jax.tree_util.tree_unflatten(self._treedef, leaves)
        return fw.dropout(self.module.apply(variables, x), self.dropout_rate)


class LSTM(Layer):
    """LSTM over integer token sequences with an embedding table, emitting
    ``[h; c]`` (reference layers.py:5-42).  The reference version is
    eager-only (calls ``.numpy()`` in forward); this one is a ``lax.scan``
    and therefore jit/TPU compatible."""

    def build(self, net: Network, dims: int, dict_size: int):
        v = net.create_param
        self.Wf, self.Uf = v((dims, dims), regularize=100), v((dims, dims), regularize=100)
        self.bf = v((1, dims), "zero", regularize=False)
        self.Wi, self.Ui = v((dims, dims), regularize=100), v((dims, dims), regularize=100)
        self.bi = v((1, dims), "zero", regularize=False)
        self.Wo, self.Uo = v((dims, dims), regularize=100), v((dims, dims), regularize=100)
        self.bo = v((1, dims), "zero", regularize=False)
        self.Wc, self.Uc = v((dims, dims), regularize=100), v((dims, dims), regularize=100)
        self.bc = v((1, dims), "zero", regularize=False)
        self.embeddings = v((dict_size, dims))
        self.dims = dims
        return (net.top_shape()[0], dims * 2)

    def apply(self, fw: Forward, tokens):
        p = fw.param
        emb = p(self.embeddings)
        tokens = tokens.astype(jnp.int32)
        batch = tokens.shape[0]
        h0 = jnp.zeros((batch, self.dims), emb.dtype)
        c0 = jnp.zeros((batch, self.dims), emb.dtype)

        def step(carry, xt_idx):
            h, c = carry
            xt = emb[xt_idx]
            f = jax.nn.sigmoid(xt @ p(self.Wf) + h @ p(self.Uf) + p(self.bf))
            o = jax.nn.sigmoid(xt @ p(self.Wo) + h @ p(self.Uo) + p(self.bo))
            i = jax.nn.sigmoid(xt @ p(self.Wi) + h @ p(self.Ui) + p(self.bi))
            g = jnp.tanh(xt @ p(self.Wc) + h @ p(self.Uc) + p(self.bc))
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), None

        (h, c), _ = jax.lax.scan(step, (h0, c0), tokens.T)
        return jnp.concatenate([h, c], axis=1)

    def loss(self, fw, value):
        return 0.0  # reference overrides loss() to 0 (layers.py:41-42)
