"""The layer engine: imperative model *builder* over a purely functional core.

The reference composes models imperatively (``model.add(Dense(64))``) with
eager shape inference, mutable ``tf.Variable`` state, and per-layer cached
``.value`` outputs that skip/residual layers read back
(gnntf/core/nn/layered.py — ``Layered``/``Layer``).

The TPU-native re-design keeps the builder ergonomics but separates
*structure* from *state*:

  * ``add()`` performs eager shape inference exactly like the reference
    (``top_shape()`` contract, layered.py:17-29) and registers parameter
    *specs* — no arrays are allocated at build time.
  * ``init(seed)`` is a pure function producing the parameter pytree
    (a flat dict keyed by stable names, ordered like the reference's
    ``VariableGenerator`` list so parity tests can copy weights across).
  * ``apply(params, x, rng=..., training=...)`` is a pure function of
    ``(params, inputs, rng)`` — jitted end-to-end by the trainer.  The
    reference's load-bearing ``.value`` cache becomes an explicit list of
    per-layer activations threaded through the forward pass, which residual
    layers index functionally.

Everything in ``apply`` is trace-compatible: static Python control flow only,
static shapes, per-layer RNG keys derived by ``fold_in`` so dropout masks are
fresh per layer per step (matching the reference's per-call mask redraw).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .initializers import init_param

Params = Dict[str, jax.Array]


class ParamSpec:
    """Metadata for one parameter (reference: WrappedVariable fields,
    variables.py:4-10)."""

    __slots__ = ("name", "shape", "init", "trainable", "regularize")

    def __init__(self, name, shape, init="small", trainable=True, regularize=True):
        self.name = name
        self.shape = tuple(int(s) for s in shape)
        self.init = init
        self.trainable = bool(trainable)
        # per-parameter L2 weight; booleans coerce to 0/1 like the reference
        # (variables.py:7 ``self.regularize = float(regularize)``)
        self.regularize = float(regularize)


class Layer:
    """Base layer protocol.

    Subclasses implement ``build(net) -> output_shape`` (register params via
    ``net.create_param``; must return a shape — layered.py:66-67 contract)
    and ``apply(fw, x) -> y``.
    """

    def __init__(self, *args, output_regularize: float = 0.0, **kwargs):
        self._args = args
        self._kwargs = kwargs
        self.output_regularize = float(output_regularize)
        self.index: Optional[int] = None
        self.output_shape: Optional[Tuple[int, ...]] = None

    # -- build-time ---------------------------------------------------------
    def late_init(self, net: "Network") -> None:
        prev = len(net.param_specs)
        self.output_shape = self.build(net, *self._args, **self._kwargs)
        if self.output_shape is None:
            raise ValueError(
                f"{type(self).__name__}.build must return an output shape")
        self.output_shape = tuple(int(s) for s in self.output_shape)
        self.param_names = [s.name for s in net.param_specs[prev:]]
        self._args = None
        self._kwargs = None

    def build(self, net: "Network", *args, **kwargs):
        raise NotImplementedError(
            f"{type(self).__name__} must implement build()")

    # -- trace-time ---------------------------------------------------------
    def apply(self, fw: "Forward", x: jax.Array) -> jax.Array:
        raise NotImplementedError(
            f"{type(self).__name__} must implement apply()")

    def loss(self, fw: "Forward", value: jax.Array):
        """Per-layer activation-regularization loss
        (reference Layer.loss, layered.py:83-86: output_regularize * l2_loss).
        Override for custom layer losses (e.g. FastReg)."""
        if self.output_regularize == 0.0:
            return 0.0
        return self.output_regularize * 0.5 * jnp.sum(
            jnp.square(value.astype(jnp.float32)))


class Forward:
    """Per-trace forward context (replaces the reference's mutable
    training-mode flag and ``.value`` caches with explicit state)."""

    __slots__ = ("net", "params", "training", "acts", "extra_losses",
                 "graph", "_base_rng", "_layer_rng", "_counter")

    def __init__(self, net: "Network", params: Params, training: bool,
                 rng: Optional[jax.Array], graph=None):
        self.net = net
        self.params = params
        self.graph = graph if graph is not None else getattr(net, "graph", None)
        self.training = bool(training)
        self.acts: List[jax.Array] = []
        self.extra_losses: List[jax.Array] = []
        self._base_rng = rng
        self._layer_rng = None
        self._counter = 0

    # -- rng ----------------------------------------------------------------
    def begin_layer(self, index: int) -> None:
        if self._base_rng is not None:
            self._layer_rng = jax.random.fold_in(self._base_rng, index)
        self._counter = 0

    def next_rng(self) -> jax.Array:
        if self._layer_rng is None:
            raise ValueError(
                "Stochastic op requested without an RNG key; pass rng= to "
                "apply() when training=True")
        key = jax.random.fold_in(self._layer_rng, self._counter)
        self._counter += 1
        return key

    # -- state accessors ----------------------------------------------------
    def param(self, ref) -> jax.Array:
        return self.params[ref]

    def value_of(self, layer: Layer) -> jax.Array:
        """Another layer's output in *this* forward pass (the functional
        analogue of reading ``layer.value``, layered.py:79-81)."""
        if layer.index is None or layer.index >= len(self.acts):
            raise ValueError(
                "value_of() may only reference layers earlier in the stack")
        return self.acts[layer.index]

    def add_loss(self, value) -> None:
        self.extra_losses.append(value)

    # -- mode-aware ops (reference Layered.dropout / sparse_dropout) --------
    def dropout(self, x: jax.Array, rate: float = 0.5) -> jax.Array:
        if not self.training or rate == 0.0:
            return x
        from ..ops.dropout import dropout as _dropout
        return _dropout(self.next_rng(), x, rate)

    def adjacency(self, graph_dropout: float = 0.5, normalized: str = "symmetric",
                  add_eye: str = "none"):
        """The per-layer normalized adjacency (reference GNN.get_adjacency,
        gnn.py:36-50): fresh edge-dropout mask per call, renormalized after
        dropout."""
        graph = self.graph
        if graph is None:
            raise ValueError("adjacency() requires a graph-bearing model (GNN)")
        from ..ops.normalize import normalize_adjacency
        rng = self.next_rng() if (self.training and graph_dropout != 0.0) else None
        return normalize_adjacency(
            graph, graph_dropout=graph_dropout if self.training else 0.0,
            normalized=normalized, add_eye=add_eye, rng=rng)


class Network:
    """Ordered layer container + parameter registry.

    Mirrors ``Layered(VariableGenerator)`` (layered.py:5-55, variables.py:48-67)
    as a *builder*; the runtime surface is the pure ``init``/``apply`` pair.
    """

    def __init__(self, input_shape: Sequence[int]):
        self.input_shape = tuple(int(s) for s in input_shape)
        self._layers: List[Layer] = []
        self.param_specs: List[ParamSpec] = []
        self._shared: Dict[str, str] = {}
        self.dtype = jnp.float32

    # -- builder API --------------------------------------------------------
    def layers(self) -> List[Layer]:
        return self._layers

    def top_shape(self) -> Tuple[int, ...]:
        if not self._layers:
            return self.input_shape
        return self._layers[-1].output_shape

    def top_layer(self) -> Layer:
        return self._layers[-1]

    def add(self, layer: Layer) -> Layer:
        if layer.index is None:
            layer.index = len(self._layers)
            layer.late_init(self)
        else:
            # re-adding an already-built layer re-emits it (reference allows
            # duplicate membership, layered.py:25-29)
            layer = _Alias(layer)
            layer.index = len(self._layers)
            layer.late_init(self)
        self._layers.append(layer)
        return layer

    def create_param(self, shape, normalization="small", trainable=True,
                     regularize=True, name=None, shared_name=None) -> str:
        """Register a parameter spec; returns its stable name (the handle
        layers store).  ``shared_name`` memoizes like the reference
        (variables.py:56-58)."""
        if shared_name is not None and shared_name in self._shared:
            return self._shared[shared_name]
        pname = name or f"p{len(self.param_specs)}"
        if any(s.name == pname for s in self.param_specs):
            pname = f"{pname}_{len(self.param_specs)}"
        spec = ParamSpec(pname, shape, normalization, trainable, regularize)
        self.param_specs.append(spec)
        if shared_name is not None:
            self._shared[shared_name] = pname
        return pname

    # alias matching the reference method name (create_var, variables.py:55)
    def create_var(self, shape=None, normalization="small", trainable=True,
                   regularize=True, name=None, shared_name=None):
        if shape is None:
            # reference APPNP passes create_var() for a learnable restart
            # probability; give it a well-defined (1, 1) scalar shape.
            shape = (1, 1)
        return self.create_param(shape, normalization, trainable, regularize,
                                 name=name, shared_name=shared_name)

    # -- functional API -----------------------------------------------------
    def init(self, rng: Union[int, jax.Array]) -> Params:
        """Pure parameter initialization (the reference's ``reset()``,
        variables.py:65-67, as a function of an RNG key)."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        params: Params = {}
        for i, spec in enumerate(self.param_specs):
            params[spec.name] = init_param(
                jax.random.fold_in(rng, i), spec.shape, spec.init, self.dtype)
        return params

    def apply(self, params: Params, x: jax.Array, *, rng=None,
              training: bool = False, return_ctx: bool = False, graph=None,
              remat: bool = False):
        """Sequential forward fold (layered.py:52-55), trace-compatible.

        ``graph`` overrides the model-bound adjacency for this trace — used
        by the distributed path to feed a sharded (traced) Graph instead of
        the closure-captured constant.

        ``remat=True`` wraps each layer in ``jax.checkpoint``: the
        backward pass recomputes layer internals (SpMM partials, dropout
        products) instead of storing them, trading FLOPs for HBM — the
        enabler for deep stacks (GCNII-64 holds ~3 E-or-N-sized
        intermediates per layer otherwise).  Cross-layer reads
        (``value_of``) become checkpoint residuals automatically; layers
        that emit ``add_loss`` side outputs are incompatible and raise."""
        fw = Forward(self, params, training, rng, graph=graph)
        h = x
        for i, layer in enumerate(self._layers):
            fw.begin_layer(i)
            if remat:
                n_losses = len(fw.extra_losses)

                def run(h, _layer=layer):
                    return _layer.apply(fw, h)

                h = jax.checkpoint(run)(h)
                if len(fw.extra_losses) != n_losses:
                    raise ValueError(
                        f"{type(layer).__name__} emits add_loss() side "
                        "outputs, which cannot escape a remat scope — "
                        "train with remat=False")
            else:
                h = layer.apply(fw, h)
            fw.acts.append(h)
        if return_ctx:
            return h, fw
        return h

    def layer_losses(self, fw: Forward):
        """Sum of per-layer output-regularization + custom layer losses
        (trainable.py:72-74 semantics)."""
        total = 0.0
        for layer, act in zip(self._layers, fw.acts):
            total = total + layer.loss(fw, act)
        for extra in fw.extra_losses:
            total = total + extra
        return total

    def weight_l2(self, params: Params):
        """sum_var reg_weight * l2_loss(var); the trainer multiplies by the
        global ``regularization`` factor (trainable.py:75-77)."""
        total = 0.0
        for spec in self.param_specs:
            if spec.regularize != 0.0:
                w = params[spec.name]
                total = total + spec.regularize * 0.5 * jnp.sum(
                    jnp.square(w.astype(jnp.float32)))
        return total

    def trainable_mask(self, params: Params) -> Dict[str, bool]:
        by_name = {s.name: s.trainable for s in self.param_specs}
        return {k: by_name.get(k, True) for k in params}


class _Alias(Layer):
    """Wrapper emitted when the same layer object is add()ed twice."""

    def __init__(self, inner: Layer):
        super().__init__()
        self.inner = inner

    def build(self, net):
        return self.inner.output_shape

    def apply(self, fw, x):
        return self.inner.apply(fw, x)
