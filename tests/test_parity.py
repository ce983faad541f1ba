"""Golden-parity tests vs the actual TF reference implementation
(BASELINE north star: per-layer activation allclose; SURVEY §4b).

The reference library at /root/reference is imported directly, its
variables are initialised by its own ``reset()``, copied into our param
pytree (both frameworks register parameters in identical creation order),
and dropout-free forwards/losses are compared.
"""
import sys

import numpy as np
import pytest

REF_PATH = "/root/reference"


def _load_reference():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import warnings
    warnings.filterwarnings("ignore")
    try:
        import tensorflow as tf  # noqa: F401
        import gnntf as ref
        return ref
    except Exception:  # pragma: no cover
        return None


ref = _load_reference()
requires_ref = pytest.mark.skipif(ref is None,
                                  reason="TF reference unavailable")


@pytest.fixture(scope="module")
def tiny_graph():
    import networkx as nx
    G = nx.gnm_random_graph(40, 120, seed=1, directed=False)
    feats = np.random.RandomState(0).rand(40, 8).astype(np.float32)
    return G, feats


def _ref_vars(model):
    """The reference's ordered WrappedVariable list (variables.py:48-67)."""
    return model._VariableGenerator__vars


def _copy_ref_params(ref_model, our_model):
    """Copy reference variable values into our param pytree by creation
    order (both builders register params in the same sequence)."""
    rvars = [np.asarray(v.var.numpy()) for v in _ref_vars(ref_model)]
    specs = our_model.param_specs
    assert len(rvars) == len(specs), (
        f"param count mismatch: ref {len(rvars)} vs ours "
        f"{[s.name for s in specs]}")
    params = {}
    import jax.numpy as jnp
    for spec, rv in zip(specs, rvars):
        assert tuple(spec.shape) == rv.shape, \
            f"{spec.name}: {spec.shape} vs {rv.shape}"
        params[spec.name] = jnp.asarray(rv)
    return params


def _parity_case(ref_builder, our_builder, tiny_graph, atol=2e-5):
    import tensorflow as tf
    import gnntf_tpu as gt

    G, feats = tiny_graph
    ref_model = ref_builder(ref.graph2adj(G), tf.constant(feats))
    ref_model.reset()
    # a fresh reference model starts with training_mode=True
    # (layered.py:9) — switch dropout off for the clean comparison
    ref_model.training_mode(False)
    ref_out = np.asarray(ref_model(tf.constant(feats)))

    our_model = our_builder(gt.graph2adj(G), feats)
    params = _copy_ref_params(ref_model, our_model)
    our_out = np.asarray(our_model.apply(params, our_model.features,
                                         training=False))
    scale = np.abs(ref_out).max() + 1e-9
    np.testing.assert_allclose(our_out, ref_out, atol=atol * scale, rtol=2e-5)
    return ref_model, our_model, params, ref_out


@requires_ref
def test_appnp_forward_parity(tiny_graph):
    import gnntf_tpu as gt
    _parity_case(lambda a, f: ref.APPNP(a, f, num_classes=3),
                 lambda a, f: gt.APPNP(a, f, num_classes=3), tiny_graph)


@requires_ref
def test_gcn_forward_parity(tiny_graph):
    import gnntf_tpu as gt
    _parity_case(lambda a, f: ref.GCN(a, f, num_classes=3),
                 lambda a, f: gt.GCN(a, f, num_classes=3), tiny_graph)


@requires_ref
def test_gcnii_forward_parity(tiny_graph):
    import gnntf_tpu as gt
    _parity_case(lambda a, f: ref.GCNII(a, f, num_classes=3, iterations=8),
                 lambda a, f: gt.GCNII(a, f, num_classes=3, iterations=8),
                 tiny_graph)


@requires_ref
def test_gcn_spectral_preserving_forward_parity(tiny_graph):
    """The 2*(act(..)-b) spectral-preserving GCN variant
    (reference gcn.py:93-106) as GCN's layer_type."""
    import gnntf_tpu as gt
    from gnntf.core.gnn.architectures.gcn import GCNSpectralPreservingLayer \
        as RefSpectral
    _parity_case(
        lambda a, f: ref.GCN(a, f, num_classes=3, layer_type=RefSpectral),
        lambda a, f: gt.GCN(a, f, num_classes=3,
                            layer_type=gt.GCNSpectralPreservingLayer),
        tiny_graph)


@requires_ref
def test_gcnii_spectral_preserving_forward_parity(tiny_graph):
    """The biased spectral-preserving GCNII variant (reference gcn.py:30-52)
    as GCNII's layer_type."""
    import gnntf_tpu as gt
    from gnntf.core.gnn.architectures.gcn import GCNIISpectralPreservingLayer \
        as RefSpectral
    _parity_case(
        lambda a, f: ref.GCNII(a, f, num_classes=3, iterations=6,
                               layer_type=RefSpectral),
        lambda a, f: gt.GCNII(a, f, num_classes=3, iterations=6,
                              layer_type=gt.GCNIISpectralPreservingLayer),
        tiny_graph)


@requires_ref
def test_mlp_forward_parity(tiny_graph):
    import tensorflow as tf
    import gnntf_tpu as gt
    _, feats = tiny_graph
    ref_model = ref.MLP(tf.constant(feats), num_classes=3)
    ref_model.reset()
    ref_model.training_mode(False)
    ref_out = np.asarray(ref_model(tf.constant(feats)))
    our_model = gt.MLP(feats, num_classes=3)
    params = _copy_ref_params(ref_model, our_model)
    our_out = np.asarray(our_model.apply(params, our_model.features,
                                         training=False))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5, rtol=2e-5)


@requires_ref
def test_node_classification_loss_parity(tiny_graph):
    """The exact log_softmax + softmax-CE composition
    (reference graph_predictor.py:24-25)."""
    import tensorflow as tf
    import gnntf_tpu as gt

    G, feats = tiny_graph
    rng = np.random.RandomState(3)
    nodes = rng.choice(40, 15, replace=False)
    labels = rng.randint(0, 3, 15)

    ref_model, our_model, params, ref_out = _parity_case(
        lambda a, f: ref.APPNP(a, f, num_classes=3),
        lambda a, f: gt.APPNP(a, f, num_classes=3), tiny_graph)

    ref_task = ref.NodeClassification(np.asarray(nodes), np.asarray(labels))
    ref_loss = float(ref_task.loss(tf.constant(ref_out)))

    our_task = gt.NodeClassification(nodes, labels)
    acts = our_model.apply(params, our_model.features, training=False)
    our_loss = float(our_task.loss(acts, our_task.batch(), params=params))
    assert our_loss == pytest.approx(ref_loss, rel=1e-5)


@requires_ref
def test_normalization_parity(tiny_graph):
    """D^-1/2 A D^-1/2 entries equal the reference's get_adjacency output
    with dropout off (reference gnn.py:36-50)."""
    import tensorflow as tf
    import gnntf_tpu as gt
    from gnntf_tpu.ops import normalize_adjacency

    G, feats = tiny_graph
    ref_model = ref.GNN(ref.graph2adj(G), tf.constant(feats))
    ref_adj = ref_model.get_adjacency(graph_dropout=0)  # SparseTensor
    ref_dense = np.asarray(tf.sparse.to_dense(tf.sparse.reorder(ref_adj)))

    ours = normalize_adjacency(gt.graph2adj(G), graph_dropout=0.0)
    our_dense = np.asarray(ours.to_dense())
    np.testing.assert_allclose(our_dense, ref_dense, atol=1e-6)


@requires_ref
def test_link_prediction_loss_parity(tiny_graph):
    import tensorflow as tf
    import gnntf_tpu as gt

    G, feats = tiny_graph
    rng = np.random.RandomState(5)
    edges = np.stack([rng.randint(0, 40, 20), rng.randint(0, 40, 20)], 1)
    labels = (np.arange(20) % 2 == 0).astype(np.float32)

    acts = rng.rand(40, 6).astype(np.float32)
    ref_task = ref.LinkPrediction(edges.tolist(), labels.tolist(),
                                  loss="bce")
    ref_loss = float(ref_task.loss(tf.constant(acts)))
    our_task = gt.LinkPrediction(edges, labels, loss="bce")
    our_loss = float(our_task.loss(np.asarray(acts), our_task.batch()))
    assert our_loss == pytest.approx(ref_loss, rel=1e-5)

    # BPR ("diff") with interleaved pos/neg rows
    inter = np.stack([rng.randint(0, 40, 16), rng.randint(0, 40, 16)], 1)
    lab = np.tile([1.0, 0.0], 8)
    ref_task = ref.LinkPrediction(inter.tolist(), lab.tolist(), loss="diff")
    ref_loss = float(ref_task.loss(tf.constant(acts)))
    our_task = gt.LinkPrediction(inter, lab, loss="diff")
    our_loss = float(our_task.loss(np.asarray(acts), our_task.batch()))
    assert our_loss == pytest.approx(ref_loss, rel=1e-5)


@requires_ref
def test_metrics_parity():
    """Every measure matches the reference's formula on random data
    (reference measures.py:13-45)."""
    import gnntf_tpu as gt
    sys.path.insert(0, REF_PATH)
    from gnntf import measures as ref_measures

    rng = np.random.RandomState(7)
    labels = rng.randint(0, 2, 60).astype(float)
    preds = rng.rand(60)
    for k in (3, 5, 10):
        assert gt.avprec(labels, preds, k) == pytest.approx(
            ref_measures.avprec(labels, preds, k))
        assert gt.prec(labels, preds, k) == pytest.approx(
            ref_measures.prec(labels, preds, k))
        assert gt.rec(labels, preds, k) == pytest.approx(
            ref_measures.rec(labels, preds, k))
        assert gt.f1(labels, preds, k) == pytest.approx(
            ref_measures.f1(labels, preds, k))
    assert gt.auc(labels, preds) == pytest.approx(
        ref_measures.auc(labels, preds))
    cls_pred = rng.randint(0, 4, 60)
    cls_lab = rng.randint(0, 4, 60)
    assert gt.acc(cls_pred, cls_lab) == pytest.approx(
        float(ref_measures.acc(np.asarray(cls_pred), np.asarray(cls_lab))))


# ---------------------------------------------------------------------------
# Training-trajectory golden parity: the reference's actual train() loop
# (trainable.py:41-103) vs our fit(), from identical copied initialization.
# ---------------------------------------------------------------------------

def _freeze_ref_reset(ref_model):
    """Snapshot the reference model's post-reset variables and replace its
    ``reset`` with a restore of that snapshot, so the internal reset at the
    top of ``train()`` (trainable.py:53) re-produces the same init."""
    rvars = _ref_vars(ref_model)
    snaps = [v.var.numpy().copy() for v in rvars]

    def frozen_reset():
        for v, s in zip(rvars, snaps):
            v.var.assign(s)

    ref_model.reset = frozen_reset
    return snaps


def _record_losses(task):
    """Wrap a reference Predictor's loss to record every call.  The train
    loop calls valid.loss exactly once per epoch on the clean forward
    (trainable.py:83-84), so the record IS the valid-loss trajectory."""
    rec = []
    orig = task.loss

    def wrapped(feats):
        out = orig(feats)
        rec.append(float(out))
        return out

    task.loss = wrapped
    return rec


def _trajectory_case(ref_builder, our_builder, tiny_graph, *, epochs,
                     patience=100000, n_classes=3):
    """Train reference + ours from copied init (dropout-off models) and
    return (ref_valid_losses, ref_final_vars, our_history, our_model)."""
    import tensorflow as tf
    import gnntf_tpu as gt

    G, feats = tiny_graph
    rng = np.random.RandomState(3)
    tr_nodes = rng.choice(40, 16, replace=False)
    tr_labels = rng.randint(0, n_classes, 16)
    va_nodes = rng.choice(40, 12, replace=False)
    va_labels = rng.randint(0, n_classes, 12)

    ref_model = ref_builder(ref.graph2adj(G), tf.constant(feats))
    ref_model.reset()
    snaps = _freeze_ref_reset(ref_model)
    ref_valid = ref.NodeClassification(va_nodes, va_labels)
    ref_vl = _record_losses(ref_valid)
    ref_model.train(train=ref.NodeClassification(tr_nodes, tr_labels),
                    valid=ref_valid, epochs=epochs, patience=patience)
    ref_final = [v.var.numpy() for v in _ref_vars(ref_model)]

    our_model = our_builder(gt.graph2adj(G), feats)
    import jax.numpy as jnp
    assert len(snaps) == len(our_model.param_specs)
    params = {s.name: jnp.asarray(rv)
              for s, rv in zip(our_model.param_specs, snaps)}
    hist = our_model.train(
        train=gt.NodeClassification(tr_nodes, tr_labels),
        valid=gt.NodeClassification(va_nodes, va_labels),
        epochs=epochs, patience=patience, init_params=params)
    return ref_vl, ref_final, hist, our_model


def _assert_trajectory_match(ref_vl, ref_final, hist, our_model,
                             atol_loss=1e-5, atol_param=1e-5):
    np.testing.assert_allclose(np.asarray(hist["valid_loss"]),
                               np.asarray(ref_vl), atol=atol_loss, rtol=1e-4)
    for spec, rv in zip(our_model.param_specs, ref_final):
        ov = np.asarray(our_model.params[spec.name])
        scale = np.abs(rv).max() + 1e-9
        np.testing.assert_allclose(
            ov, rv, atol=atol_param * scale, rtol=1e-4,
            err_msg=f"best-params mismatch at {spec.name}")


@requires_ref
def test_training_trajectory_parity_gcnii(tiny_graph):
    """25 epochs of the reference's train() vs our fit() on GCNII with
    dropout=0 (its graph_dropout is hardcoded 0, so training is fully
    deterministic): per-epoch validation losses and final best params
    allclose.  Validates the whole trainer transitively — forward, task
    loss, layer/weight regularization, Keras-Adam update, best-restore."""
    import gnntf_tpu as gt
    ref_vl, ref_final, hist, our_model = _trajectory_case(
        lambda a, f: ref.GCNII(a, f, num_classes=3, iterations=4,
                               latent_dims=[8], dropout=0),
        lambda a, f: gt.GCNII(a, f, num_classes=3, iterations=4,
                              latent_dims=(8,), dropout=0),
        tiny_graph, epochs=25)
    assert len(ref_vl) == len(hist["valid_loss"]) == 25
    _assert_trajectory_match(ref_vl, ref_final, hist, our_model)


@requires_ref
def test_training_trajectory_parity_appnp_propagation(tiny_graph):
    """Same trajectory comparison through the SpMM propagation path: a
    deterministic APPNP-style stack (Dense -> H0 -> 6x PPRIteration with
    graph_dropout=0) hand-built identically in both frameworks."""
    import tensorflow as tf
    import gnntf_tpu as gt
    from gnntf.core.gnn.architectures.filter import PPRIteration as RefPPR
    from gnntf.core.nn import Dense as RefDense

    def ref_builder(adj, feats):
        m = ref.GNN(adj, feats)
        m.add(RefDense(16, activation=tf.nn.relu))
        H0 = m.add(RefDense(3, regularize=False))
        for _ in range(6):
            m.add(RefPPR(H0, 0.1, graph_dropout=0))
        return m

    def our_builder(adj, feats):
        import jax
        m = gt.GNN(adj, feats)
        m.add(gt.Dense(16, activation=jax.nn.relu))
        H0 = m.add(gt.Dense(3, regularize=False))
        for _ in range(6):
            m.add(gt.PPRIteration(H0, 0.1, graph_dropout=0.0))
        return m

    ref_vl, ref_final, hist, our_model = _trajectory_case(
        ref_builder, our_builder, tiny_graph, epochs=20)
    _assert_trajectory_match(ref_vl, ref_final, hist, our_model)


@requires_ref
def test_training_early_stopping_parity(tiny_graph):
    """Patience-driven early stopping fires at the same epoch in both
    frameworks and both restore the same best snapshot
    (trainable.py:90-102)."""
    import gnntf_tpu as gt
    ref_vl, ref_final, hist, our_model = _trajectory_case(
        lambda a, f: ref.GCNII(a, f, num_classes=3, iterations=4,
                               latent_dims=[8], dropout=0),
        lambda a, f: gt.GCNII(a, f, num_classes=3, iterations=4,
                              latent_dims=(8,), dropout=0),
        tiny_graph, epochs=400, patience=8)
    # identical stopping epoch: one valid-loss record per epoch run
    assert len(ref_vl) == hist["epochs_run"]
    _assert_trajectory_match(ref_vl, ref_final, hist, our_model,
                             atol_loss=5e-5, atol_param=5e-5)


@requires_ref
def test_training_accuracy_parity_with_dropout():
    """Stochastic (dropout-on) APPNP: both frameworks trained with full
    default dropout on the same synthetic-planetoid graph reach the same
    test accuracy within run-to-run noise (BASELINE configs 1-2 as far as
    they are measurable without the real datasets)."""
    import tensorflow as tf
    import gnntf_tpu as gt
    from gnntf_tpu.data import synthetic_planetoid

    G, labels, features, train, valid, test = synthetic_planetoid(
        n_nodes=200, n_classes=4, n_features=24, avg_degree=6.0, seed=5,
        train_per_class=10, n_valid=40)

    ref_accs, our_accs = [], []
    for rep in range(3):
        ref.measures.set_seed(rep)
        rm = ref.APPNP(ref.graph2adj(G), tf.constant(features), num_classes=4)
        rm.train(train=ref.NodeClassification(train, labels[train]),
                 valid=ref.NodeClassification(valid, labels[valid]),
                 epochs=100, patience=20)
        pred = np.asarray(rm.predict(ref.NodeClassification(test)))
        ref_accs.append(float(np.mean(pred == labels[test])))

        gt.set_seed(rep)
        om = gt.APPNP(gt.graph2adj(G), features, num_classes=4)
        om.train(train=gt.NodeClassification(train, labels[train]),
                 valid=gt.NodeClassification(valid, labels[valid]),
                 epochs=100, patience=20)
        pred = np.asarray(om.predict(gt.NodeClassification(test)))
        our_accs.append(float(np.mean(pred == labels[test])))

    ref_mean, our_mean = np.mean(ref_accs), np.mean(our_accs)
    assert abs(our_mean - ref_mean) < 0.06, (ref_accs, our_accs)
    assert our_mean >= ref_mean - 0.03  # at least reference-level accuracy


@requires_ref
def test_ngcf_layer_parity(tiny_graph):
    """Per-layer activation parity for the NGCF stack.  The reference's
    final Concatenate is axis-buggy (layers.py:99-101, SURVEY §2.1) and is
    deliberately fixed here, so the comparison is per NGCF layer (their
    cached .value vs our per-layer activations)."""
    import tensorflow as tf
    import gnntf_tpu as gt

    G, feats = tiny_graph
    ref_model = ref.NGCF(ref.graph2adj(G), tf.constant(feats), num_classes=4)
    ref_model.reset()
    ref_model.training_mode(False)
    ref_model(tf.constant(feats))  # populates each layer's .value

    our_model = gt.NGCF(gt.graph2adj(G), feats, num_classes=4)
    params = _copy_ref_params(ref_model, our_model)
    _, fw = our_model.apply(params, our_model.features, training=False,
                            return_ctx=True)

    ref_layers = [l for l in ref_model.layers()
                  if type(l).__name__ == "NGCFLayer"]
    our_idx = [i for i, l in enumerate(our_model.layers())
               if type(l).__name__ == "NGCFLayer"]
    assert len(ref_layers) == len(our_idx) > 0
    for rl, oi in zip(ref_layers, our_idx):
        ref_act = np.asarray(rl.value)
        our_act = np.asarray(fw.acts[oi])
        np.testing.assert_allclose(our_act, ref_act, atol=2e-5, rtol=2e-4)
