"""Graph propagation layers (reference: gnntf/core/gnn/architectures/*.py).

All aggregation funnels through ``ops.spmm`` — the framework's hot op — and
the per-layer normalized adjacency comes from ``fw.adjacency`` with a fresh
edge-dropout mask per layer per step (reference semantics).
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ..nn.core import Forward, Layer, Network
from ..ops.spmm import spmm

_identity = lambda x: x


class PPRIteration(Layer):
    """One personalized-PageRank propagation step
    (reference filter.py:6-22):

        out = act( dropout( (1-a) * (A_hat @ X) + a * H0 ) )

    ``restart_probability`` may be a float or the name of a learnable scalar
    parameter (APPNP's ``a=None`` mode); ``restart_transform`` hooks its
    post-processing."""

    def build(self, net: Network, H0: Layer,
              restart_probability: Union[float, str] = 0.1,
              activation: Callable = _identity, dropout: float = 0.0,
              graph_dropout: float = 0.5,
              restart_transform: Callable = _identity):
        self.H0 = H0
        self.restart_probability = restart_probability
        self.activation = activation
        self.dropout_rate = dropout
        self.graph_dropout = graph_dropout
        self.restart_transform = restart_transform
        return net.top_shape()

    def apply(self, fw: Forward, x):
        adj = fw.adjacency(self.graph_dropout)
        propagated = spmm(adj, x)
        a = self.restart_probability
        if isinstance(a, str):  # learnable (1,1) scalar parameter
            a = fw.param(a)
        a = self.restart_transform(a)
        out = propagated * (1.0 - a) + fw.value_of(self.H0) * a
        return self.activation(fw.dropout(out, self.dropout_rate))


class GCNLayer(Layer):
    """Aggregate-then-transform GCN convolution
    (reference gcn.py:77-89):  out = dropout(act(A_hat @ X @ W + b))."""

    def build(self, net: Network, outputs: int,
              activation: Callable = jax.nn.relu, bias: bool = True,
              dropout: float = 0.0, graph_dropout: float = 0.0):
        n, d = net.top_shape()
        self.W = net.create_param((d, outputs))
        self.b = net.create_param((1, outputs), "zero") if bias else None
        self.activation = activation
        self.dropout_rate = dropout
        self.graph_dropout = graph_dropout
        return (n, outputs)

    def apply(self, fw: Forward, x):
        adj = fw.adjacency(self.graph_dropout)
        W = fw.param(self.W)
        # A(XW) == (AX)W: run the SpMM at the narrower feature width — on a
        # 1433->64 input layer that is 22x less gather traffic per edge
        if W.shape[0] > W.shape[1]:
            y = spmm(adj, jnp.dot(x, W, preferred_element_type=x.dtype))
        else:
            y = jnp.dot(spmm(adj, x), W, preferred_element_type=x.dtype)
        if self.b is not None:
            y = y + fw.param(self.b)
        return fw.dropout(self.activation(y), self.dropout_rate)


class GCNSpectralPreservingLayer(Layer):
    """GCN variant emitting 2*(dropout(act(..) - b))
    (reference gcn.py:95-113)."""

    def build(self, net: Network, outputs: int,
              activation: Callable = jax.nn.relu, bias: bool = True,
              dropout: float = 0.0, graph_dropout: float = 0.0):
        n, d = net.top_shape()
        self.W = net.create_param((d, outputs))
        self.b = net.create_param((1, outputs), "zero") if bias else None
        self.activation = activation
        self.dropout_rate = dropout
        self.graph_dropout = graph_dropout
        return (n, outputs)

    def apply(self, fw: Forward, x):
        adj = fw.adjacency(self.graph_dropout)
        W = fw.param(self.W)
        b = fw.param(self.b) if self.b is not None else 0.0
        if W.shape[0] > W.shape[1]:  # SpMM at the narrower width (see GCNLayer)
            y = spmm(adj, jnp.dot(x, W, preferred_element_type=x.dtype)) + b
        else:
            y = jnp.dot(spmm(adj, x), W, preferred_element_type=x.dtype) + b
        return 2.0 * fw.dropout(self.activation(y) - b, self.dropout_rate)


class GCNIILayer(Layer):
    """GCNII convolution with initial residual + identity mapping
    (reference gcn.py:7-27):

        beta = log1p(l / (k+1))
        out  = dropout( act( ((1-a)*A_hat@X + a*H0) @ ((1-beta)I + beta*W) ) )

    W is zero-initialized (gcn.py:11)."""

    def build(self, net: Network, H0: Layer, a: float, l: float, k: int = 0,
              activation: Callable = _identity,
              beta_transformer: Callable = jnp.log1p,
              dropout: float = 0.5, graph_dropout: float = 0.5,
              regularization: bool = True):
        n, d = net.top_shape()
        self.W = net.create_param((d, d), "zero", regularize=regularization)
        self.H0 = H0
        self.a, self.l, self.k = a, l, k
        self.activation = activation
        self.beta_transformer = beta_transformer
        self.dropout_rate = dropout
        self.graph_dropout = graph_dropout
        return (n, d)

    def apply(self, fw: Forward, x):
        b = self.beta_transformer(self.l / (self.k + 1))
        adj = fw.adjacency(self.graph_dropout)
        agg = spmm(adj, x)
        tradeoff = (1.0 - self.a) * agg + self.a * fw.value_of(self.H0)
        W = fw.param(self.W)
        mix = (1.0 - b) * jnp.eye(W.shape[1], dtype=W.dtype) + b * W
        y = jnp.dot(tradeoff, mix, preferred_element_type=x.dtype)
        return fw.dropout(self.activation(y), self.dropout_rate)


class GCNIISpectralPreservingLayer(Layer):
    """GCNII variant with bias, emitting 2*(dropout(act(..)-bias))
    (reference gcn.py:30-52)."""

    def build(self, net: Network, H0: Layer, a: float, l: float, k: int = 0,
              activation: Callable = _identity,
              beta_transformer: Callable = jnp.log1p,
              dropout: float = 0.5, graph_dropout: float = 0.5,
              regularization: bool = True):
        n, d = net.top_shape()
        self.W = net.create_param((d, d), "zero", regularize=regularization)
        self.bias = net.create_param((1, d), "zero")
        self.H0 = H0
        self.a, self.l, self.k = a, l, k
        self.activation = activation
        self.beta_transformer = beta_transformer
        self.dropout_rate = dropout
        self.graph_dropout = graph_dropout
        return (n, d)

    def apply(self, fw: Forward, x):
        b = self.beta_transformer(self.l / (self.k + 1))
        adj = fw.adjacency(self.graph_dropout)
        agg = spmm(adj, x)
        tradeoff = (1.0 - self.a) * agg + self.a * fw.value_of(self.H0)
        W = fw.param(self.W)
        bias = fw.param(self.bias)
        mix = (1.0 - b) * jnp.eye(W.shape[1], dtype=W.dtype) + b * W
        y = jnp.dot(tradeoff, mix, preferred_element_type=x.dtype) + bias
        return 2.0 * fw.dropout(self.activation(y) - bias, self.dropout_rate)


class NGCFLayer(Layer):
    """NGCF recommendation convolution (reference gcn.py:116-135).

        out = l2_normalize(dropout( act((X (.) A_hat X) W1 + b1)
                                  + act((A_hat X) W2 + b2) ))

    Uses bipartite (D^-1 A) normalization.  Unlike every other layer, the
    reference computes its adjacency ONCE at build time (gcn.py:127); here
    the adjacency is deterministic inside the trace whenever
    ``node_dropout=0`` (the default), which XLA hoists/CSEs — same effect,
    still functional.  With ``node_dropout>0`` we redraw per step (the
    reference would instead freeze one dropout draw at construction — an
    artifact of eager building we deliberately do not reproduce)."""

    def build(self, net: Network, outputs: int,
              activation: Callable = None, bias: bool = True,
              dropout: float = 0.0, node_dropout: float = 0.0,
              regularize: float = 1.0):
        n, d = net.top_shape()
        fan_in = n
        scale = 1.0 / (fan_in ** 0.5)
        self.W1 = net.create_param((d, outputs), scale, regularize=regularize)
        self.W2 = net.create_param((d, outputs), scale, regularize=regularize)
        self.b1 = net.create_param((1, outputs), scale) if bias else None
        self.b2 = net.create_param((1, outputs), scale) if bias else None
        self.activation = activation if activation is not None \
            else (lambda x: jax.nn.leaky_relu(x, negative_slope=0.2))
        self.dropout_rate = dropout
        self.node_dropout = node_dropout
        return (n, outputs)

    def apply(self, fw: Forward, x):
        adj = fw.adjacency(self.node_dropout, normalized="bipartite",
                           add_eye="none")
        agg = spmm(adj, x)
        y1 = jnp.dot(x * agg, fw.param(self.W1),
                     preferred_element_type=x.dtype)
        y2 = jnp.dot(agg, fw.param(self.W2), preferred_element_type=x.dtype)
        if self.b1 is not None:
            y1 = y1 + fw.param(self.b1)
            y2 = y2 + fw.param(self.b2)
        out = self.activation(y1) + self.activation(y2)
        out = fw.dropout(out, self.dropout_rate)
        # tf.math.l2_normalize: x * rsqrt(max(sum(x^2), 1e-12))
        sumsq = jnp.sum(jnp.square(out), axis=1, keepdims=True)
        return out * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-12))
