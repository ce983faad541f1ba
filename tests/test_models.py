"""Model zoo: shapes, determinism, and end-to-end training quality."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnntf_tpu as gt


@pytest.fixture(scope="module")
def data(request):
    from gnntf_tpu.data import synthetic_planetoid
    G, labels, features, train, valid, test = synthetic_planetoid(
        n_nodes=200, n_classes=4, n_features=24, avg_degree=6.0, seed=3,
        train_per_class=10, n_valid=40)
    return dict(G=G, labels=labels, features=features, train=train,
                valid=valid, test=test, adj=gt.graph2adj(G),
                num_classes=len(set(labels.tolist())))


ALL_MODELS = ["appnp", "gcn", "gcnii", "mlp", "gat", "ngcf", "appnp2",
              "sage", "gin"]


def build(name, d):
    C = d["num_classes"]
    if name == "appnp":
        return gt.APPNP(d["adj"], d["features"], num_classes=C, iterations=4)
    if name == "gcn":
        return gt.GCN(d["adj"], d["features"], num_classes=C)
    if name == "gcnii":
        return gt.GCNII(d["adj"], d["features"], num_classes=C, iterations=4)
    if name == "mlp":
        return gt.MLP(d["features"], num_classes=C)
    if name == "gat":
        return gt.GAT(d["adj"], d["features"], num_classes=C, heads=2)
    if name == "ngcf":
        return gt.NGCF(d["adj"], d["features"], num_classes=C)
    if name == "appnp2":
        return gt.APPNP2(d["adj"], d["features"], num_classes=C, iterations=3)
    if name == "sage":
        return gt.GraphSAGE(d["adj"], d["features"], num_classes=C)
    if name == "gin":
        return gt.GIN(d["adj"], d["features"], num_classes=C)
    raise ValueError(name)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_shape_and_determinism(name, data):
    model = build(name, data)
    C = data["num_classes"]
    n = data["features"].shape[0]
    params = model.init(0)
    out1 = model.apply(params, model.features, training=False)
    out2 = model.apply(params, model.features, training=False)
    expected_cols = C * 3 if name == "ngcf" else C
    assert out1.shape == (n, expected_cols)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.all(np.isfinite(np.asarray(out1)))


@pytest.mark.parametrize("name", ALL_MODELS)
def test_training_dropout_is_stochastic_but_seeded(name, data):
    model = build(name, data)
    params = model.init(0)
    k = jax.random.PRNGKey(7)
    out1 = model.apply(params, model.features, training=True, rng=k)
    out2 = model.apply(params, model.features, training=True, rng=k)
    out3 = model.apply(params, model.features, training=True,
                       rng=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))


def test_appnp_learns_synthetic(data):
    gt.set_seed(0)
    model = build("appnp", data)
    labels = data["labels"]
    model.train(train=gt.NodeClassification(data["train"],
                                            labels[data["train"]]),
                valid=gt.NodeClassification(data["valid"],
                                            labels[data["valid"]]),
                patience=30, epochs=150, seed=0)
    pred = model.predict(gt.NodeClassification(data["test"]))
    acc = gt.acc(np.asarray(pred), labels[data["test"]])
    assert acc > 0.6, f"APPNP failed to learn: acc={acc}"


def test_gcn_learns_synthetic(data):
    gt.set_seed(0)
    model = build("gcn", data)
    labels = data["labels"]
    model.train(train=gt.NodeClassification(data["train"],
                                            labels[data["train"]]),
                valid=gt.NodeClassification(data["valid"],
                                            labels[data["valid"]]),
                patience=30, epochs=150, seed=0)
    pred = model.predict(gt.NodeClassification(data["test"]))
    acc = gt.acc(np.asarray(pred), labels[data["test"]])
    assert acc > 0.6, f"GCN failed to learn: acc={acc}"


def test_structural_preprocessor(data):
    model = gt.GNN(data["adj"], np.zeros((200, 0), np.float32),
                   preprocessor=gt.Structural(dims=8))
    model.add(gt.Dense(4))
    out = model.apply(model.init(0), model.features)
    assert out.shape == (200, 4)


def test_structural_bipartite_split(data):
    pre = gt.Structural(dims=8, bipartite=50, l2_contraint=True)
    model = gt.GNN(data["adj"], data["features"], preprocessor=pre)
    params = model.init(0)
    out = model.apply(params, model.features)
    assert out.shape == (200, 8 + 24)
    emb = np.asarray(out[:, :8])
    np.testing.assert_allclose((emb ** 2).sum(1), np.ones(200), rtol=1e-4)


def test_gcnii_zero_init_identity_start(data):
    """At init (W=0), a GCNII layer is a pure (1-b)I mix — output finite and
    dependent only on propagation (reference gcn.py:11 zero-init)."""
    model = build("gcnii", data)
    params = model.init(0)
    for spec in model.param_specs:
        if spec.shape == (64, 64):
            assert np.all(np.asarray(params[spec.name]) == 0)


def test_custom_composed_gnn(data):
    """The custom-composition extension API (demos/custom_layers.py)."""
    C = data["num_classes"]
    gnn = gt.GNN(data["adj"], data["features"])
    gnn.add(gt.Dense(16, activation=jax.nn.relu, dropout=0.4))
    H0 = gnn.add(gt.Dense(C, activation=jax.nn.relu, regularize=False))
    for _ in range(4):
        gnn.add(gt.PPRIteration(H0, 0.1))
    out = gnn.apply(gnn.init(0), gnn.features)
    assert out.shape == (200, C)


def test_learnable_restart_probability(data):
    model = gt.APPNP(data["adj"], data["features"],
                     num_classes=data["num_classes"], a=None, iterations=3)
    params = model.init(0)
    out = model.apply(params, model.features)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pprsweep_and_fastreg(data):
    C = data["num_classes"]
    model = gt.GNN(data["adj"], data["features"])
    model.add(gt.PPRSweep())
    model.add(gt.FastReg())
    model.add(gt.Dense(C))
    params = model.init(0)
    out, fw = model.apply(params, model.features, training=False,
                          return_ctx=True)
    assert out.shape == (200, C)
    assert len(fw.extra_losses) == 1  # FastReg contributed its -lambda loss


def test_gat_attention_normalized(data):
    """Each destination's incoming attention weights sum to 1 per head."""
    import jax
    import jax.numpy as jnp
    from gnntf_tpu.graph.coo import add_self_loops
    from gnntf_tpu.ops.segment import segment_softmax

    g = add_self_loops(data["adj"])
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.randn(g.n_edges, 4), jnp.float32)
    alpha = segment_softmax(scores, g.row, g.n_nodes)
    sums = jax.ops.segment_sum(alpha, g.row, num_segments=g.n_nodes)
    # self-loops guarantee every node has >= 1 incoming edge
    np.testing.assert_allclose(np.asarray(sums), 1.0, atol=1e-5)


def test_gat_learns_synthetic(data):
    import gnntf_tpu as gt

    labels, features = data["labels"], data["features"]
    train, valid, test = data["train"], data["valid"], data["test"]
    gt.set_seed(0)
    m = gt.GAT(data["adj"], features, num_classes=len(set(labels)),
               heads=2, latent_dims=(8,))
    m.train(train=gt.NodeClassification(train, labels[train]),
            valid=gt.NodeClassification(valid, labels[valid]),
            epochs=150, patience=30, seed=0, block_epochs=25)
    pred = m.predict(gt.NodeClassification(test))
    assert gt.acc(np.asarray(pred), labels[test]) > 0.7


def test_gat_head_modes(data):
    import gnntf_tpu as gt
    from gnntf_tpu.models import GATLayer

    m = gt.GNN(data["adj"], data["features"])
    m.add(GATLayer(6, heads=3, concat_heads=True))
    assert m.top_shape()[1] == 18
    m.add(GATLayer(5, heads=4, concat_heads=False))
    assert m.top_shape()[1] == 5
    params = m.init(0)
    out = m.apply(params, m.features)
    assert out.shape == (data["features"].shape[0], 5)
    assert np.all(np.isfinite(np.asarray(out)))


def _sage_neighbor_mean(graph, features):
    """Run a SAGELayer with W_self := 0, W_neigh := I; returns its output."""
    import gnntf_tpu as gt
    from gnntf_tpu.models import SAGELayer

    d = features.shape[1]
    m = gt.GNN(graph, features)
    m.add(SAGELayer(d, activation=None, bias=False))
    params = dict(m.init(0))
    names = sorted(k for k in params if params[k].shape == (d, d))
    assert len(names) == 2  # W_self, W_neigh (creation order)
    params[names[0]] = jnp.zeros((d, d), jnp.float32)
    params[names[1]] = jnp.eye(d, dtype=jnp.float32)
    return np.asarray(m.apply(params, m.features, training=False))


def _dense_row_mean(g, x):
    n = g.n_nodes
    dense = np.zeros((n, n))
    np.add.at(dense, (np.asarray(g.row), np.asarray(g.col)), np.asarray(g.val))
    deg = dense.sum(axis=1, keepdims=True)
    return np.divide(dense @ x, deg, out=np.zeros_like(dense @ x),
                     where=deg != 0)


def test_sage_mean_aggregation_invariant(data):
    """With identity weights forced in, the neighbor branch of SAGELayer must
    equal the exact per-node neighbor mean ('row' normalization,
    ops/normalize.py)."""
    out = _sage_neighbor_mean(data["adj"], data["features"])
    expected = _dense_row_mean(data["adj"],
                               np.asarray(data["features"], np.float64))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_sage_mean_correct_on_directed_graph():
    """The neighbor mean must be exact on *directed* graphs too — the case
    where colsum-based ('bipartite') normalization silently computes the
    wrong mean."""
    import gnntf_tpu as gt

    rng = np.random.RandomState(4)
    src = rng.randint(0, 30, 90)
    dst = rng.randint(0, 30, 90)
    g = gt.from_edges(src, dst, n_nodes=30, directed=True)
    feats = rng.rand(30, 6).astype(np.float32)
    out = _sage_neighbor_mean(g, feats)
    expected = _dense_row_mean(g, np.asarray(feats, np.float64))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_sage_learns_synthetic(data):
    import gnntf_tpu as gt

    labels = data["labels"]
    gt.set_seed(0)
    m = gt.GraphSAGE(data["adj"], data["features"],
                     num_classes=data["num_classes"], latent_dims=(32,))
    m.train(train=gt.NodeClassification(data["train"], labels[data["train"]]),
            valid=gt.NodeClassification(data["valid"], labels[data["valid"]]),
            epochs=150, patience=30, seed=0, block_epochs=25)
    pred = m.predict(gt.NodeClassification(data["test"]))
    assert gt.acc(np.asarray(pred), labels[data["test"]]) > 0.6


def test_gin_learns_synthetic_and_eps_trains(data):
    import gnntf_tpu as gt

    labels = data["labels"]
    gt.set_seed(0)
    m = gt.GIN(data["adj"], data["features"],
               num_classes=data["num_classes"], latent_dims=(32,))
    p0 = {k: np.asarray(v) for k, v in dict(m.init(0)).items()}
    m.train(train=gt.NodeClassification(data["train"], labels[data["train"]]),
            valid=gt.NodeClassification(data["valid"], labels[data["valid"]]),
            epochs=150, patience=30, seed=0, block_epochs=25)
    pred = m.predict(gt.NodeClassification(data["test"]))
    assert gt.acc(np.asarray(pred), labels[data["test"]]) > 0.6
    # the learnable eps scalar moved away from its zero init
    eps_keys = [k for k, v in p0.items() if v.shape == (1, 1)]
    assert eps_keys
    trained = dict(m.params)
    assert any(abs(np.asarray(trained[k]).item()) > 1e-3 for k in eps_keys)
