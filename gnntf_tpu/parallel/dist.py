"""Multi-chip distributed training via mesh sharding (GSPMD path).

TPU-native scale-out design (SURVEY §5.7-5.8, BASELINE north star): no NCCL /
MPI layer — the device mesh + sharding annotations are the entire distributed
backend; XLA lowers the induced collectives (psum for edge-partial combines
and gradient sync, all-gathers for the tensor-parallel dense layers) onto
ICI.

Mesh axes:
  * ``edge``  — edge-list sharding: each device owns a contiguous slice of
                the destination-sorted COO arrays; the SpMM segment-sum
                produces partial rows combined by an XLA-inserted
                reduce-scatter/all-reduce.  (The GNN analogue of data
                parallelism — the batch IS the edge set.)
  * ``feat``  — tensor/feature parallelism: hidden Dense/GCN weight matrices
                are column-sharded, activations sharded on the feature axis
                (sequence-parallel analogue for the node dimension is the
                ``edge`` axis).

Parameters are replicated except 2D hidden weights (sharded on columns when
divisible); gradients sync implicitly through GSPMD.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.coo import Graph
from ..nn.core import Network, Params
from .partition import pad_graph

EDGE_AXIS = "edge"
FEAT_AXIS = "feat"


def make_mesh(n_edge: Optional[int] = None, n_feat: int = 1,
              devices=None) -> Mesh:
    """Build an (edge, feat) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_edge is None:
        n_edge = n // n_feat
    if n_edge * n_feat != n:
        raise ValueError(f"mesh {n_edge}x{n_feat} != {n} devices")
    arr = np.asarray(devices).reshape(n_edge, n_feat)
    return Mesh(arr, (EDGE_AXIS, FEAT_AXIS))


def shard_graph(graph: Graph, mesh: Mesh) -> Graph:
    """Pad the edge list to the edge-axis size and place the COO arrays
    sharded on the ``edge`` mesh axis."""
    n_edge = mesh.shape[EDGE_AXIS]
    graph = pad_graph(graph, n_edge)
    sh = NamedSharding(mesh, P(EDGE_AXIS))
    return Graph(
        row=jax.device_put(graph.row, sh),
        col=jax.device_put(graph.col, sh),
        val=jax.device_put(graph.val, sh),
        n_nodes=graph.n_nodes,
        num_self_loop=graph.num_self_loop,
        sorted_by_row=graph.sorted_by_row,
    )


def graph_shardings(mesh: Mesh, graph: Graph) -> Graph:
    """A Graph-shaped pytree of shardings (for jit in_shardings).  The
    static dataclass fields are part of the treedef, so they must mirror the
    concrete graph's."""
    sh = NamedSharding(mesh, P(EDGE_AXIS))
    return Graph(row=sh, col=sh, val=sh, n_nodes=graph.n_nodes,
                 num_self_loop=graph.num_self_loop,
                 sorted_by_row=graph.sorted_by_row)


def param_shardings(model: Network, mesh: Mesh) -> dict:
    """Column-shard 2D hidden weights over ``feat`` when divisible;
    replicate everything else (classifier heads, biases, scalars)."""
    n_feat = mesh.shape[FEAT_AXIS]
    out = {}
    for spec in model.param_specs:
        if (len(spec.shape) == 2 and n_feat > 1
                and spec.shape[1] % n_feat == 0 and spec.shape[1] >= n_feat
                and spec.shape[0] > 1):
            out[spec.name] = NamedSharding(mesh, P(None, FEAT_AXIS))
        else:
            out[spec.name] = NamedSharding(mesh, P())
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_train_step_raw(model, task, tx, regularization: float = 5e-4):
    """The UNJITTED distributed train-step body
    ``step(params, opt_state, rng, deg, features, graph, batch)`` —
    shared by the per-epoch jit (:func:`make_distributed_train_step`) and
    the fused multi-epoch ``lax.scan`` path (train/trainer._fit_fused),
    which traces it inside its own program and relies on the committed
    shardings of the carried arrays for GSPMD propagation."""
    trainable = {s.name: s.trainable for s in model.param_specs}

    def step(params, opt_state, rng, deg, features, graph, batch):
        def loss_fn(p):
            out, fw = model.apply(p, features, rng=rng, training=True,
                                  return_ctx=True, graph=graph)
            loss = task.loss(out, batch, params=p)
            loss = loss + model.layer_losses(fw)
            loss = loss + regularization * model.weight_l2(p)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = {k: (g * deg if trainable.get(k, True) else jnp.zeros_like(g))
                 for k, g in grads.items()}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_distributed_train_step(model, task, mesh: Mesh, tx, graph: Graph,
                                regularization: float = 5e-4):
    """A jitted full training step (forward, loss, backward, Adam update)
    with the graph edge-sharded and hidden weights feature-sharded:
    ``step(params, opt_state, rng, deg, features, graph, batch)``.
    """
    p_sh = param_shardings(model, mesh)
    g_sh = graph_shardings(mesh, graph)
    rep = replicated(mesh)
    step = make_train_step_raw(model, task, tx, regularization)
    jitted = jax.jit(
        step,
        in_shardings=(p_sh, None, rep, rep, rep, g_sh, None),
        out_shardings=(p_sh, None, rep),
    )
    return jitted


def make_eval_raw(model):
    """The unjitted distributed clean-forward body (see
    :func:`make_train_step_raw`)."""
    def eval_fn(params, features, graph):
        return model.apply(params, features, training=False, graph=graph)
    return eval_fn


def make_distributed_eval(model, mesh: Mesh, graph: Graph):
    g_sh = graph_shardings(mesh, graph)
    rep = replicated(mesh)
    p_sh = param_shardings(model, mesh)
    return jax.jit(make_eval_raw(model), in_shardings=(p_sh, rep, g_sh),
                   out_shardings=rep)


def place_state(model, mesh: Mesh, params: Params, opt_state=None):
    """device_put params (sharded per param_shardings) + replicate features."""
    p_sh = param_shardings(model, mesh)
    params = {k: jax.device_put(v, p_sh[k]) for k, v in params.items()}
    features = jax.device_put(model.features, replicated(mesh))
    return params, features
