"""Multi-chip sharding on the 8-device virtual CPU mesh (SURVEY §4c)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnntf_tpu as gt
from gnntf_tpu.parallel import (make_distributed_eval,
                                make_distributed_train_step, make_mesh,
                                pad_graph, shard_graph)
from gnntf_tpu.train.trainer import keras_adam


@pytest.fixture(scope="module")
def setup():
    from gnntf_tpu.data import synthetic_planetoid
    G, labels, features, train, valid, test = synthetic_planetoid(
        n_nodes=160, n_classes=4, n_features=32, avg_degree=6.0, seed=11)
    return dict(G=G, labels=labels, features=features, train=train,
                adj=gt.graph2adj(G))


def test_mesh_shapes():
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"edge": 4, "feat": 2}
    with pytest.raises(ValueError):
        make_mesh(3, 2)


def test_pad_graph_preserves_spmm(setup):
    g = setup["adj"]
    padded = pad_graph(g, 8)
    assert padded.n_edges % 8 == 0
    x = jnp.asarray(np.random.RandomState(0).randn(g.n_nodes, 5),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(gt.spmm(g, x)),
                               np.asarray(gt.spmm(padded, x)),
                               rtol=1e-5, atol=1e-5)


def test_distributed_forward_matches_single(setup):
    mesh = make_mesh(4, 2)
    model = gt.APPNP(setup["adj"], setup["features"], num_classes=4,
                     iterations=3)
    params = model.init(0)
    single = np.asarray(model.apply(params, model.features, training=False))
    sharded = shard_graph(setup["adj"], mesh)
    eval_fn = make_distributed_eval(model, mesh, sharded)
    dist = np.asarray(eval_fn(params, model.features, sharded))
    np.testing.assert_allclose(dist, single, rtol=1e-4, atol=1e-5)


def test_distributed_train_step_runs_and_learns(setup):
    mesh = make_mesh(4, 2)
    labels = setup["labels"]
    model = gt.APPNP(setup["adj"], setup["features"], num_classes=4,
                     iterations=3)
    task = gt.NodeClassification(setup["train"], labels[setup["train"]])
    tx = keras_adam(0.01)
    params = model.init(0)
    opt_state = tx.init(params)
    sharded = shard_graph(setup["adj"], mesh)
    step = make_distributed_train_step(model, task, mesh, tx, sharded)
    losses = []
    deg = jnp.float32(1.0)
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, jax.random.PRNGKey(i), deg,
            model.features, sharded, task.batch())
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_distributed_gcn_step(setup):
    mesh = make_mesh(8, 1)
    labels = setup["labels"]
    model = gt.GCN(setup["adj"], setup["features"], num_classes=4)
    task = gt.NodeClassification(setup["train"], labels[setup["train"]])
    tx = keras_adam(0.01)
    params = model.init(0)
    opt_state = tx.init(params)
    sharded = shard_graph(setup["adj"], mesh)
    step = make_distributed_train_step(model, task, mesh, tx, sharded)
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(0),
                                   jnp.float32(1.0), model.features, sharded,
                                   task.batch())
    assert np.isfinite(float(loss))
