"""Training runtime semantics: patience, best-restore, valid=train fallback,
degradation, frozen params (reference trainable.py:41-103)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gnntf_tpu as gt


@pytest.fixture(scope="module")
def setup():
    from gnntf_tpu.data import synthetic_planetoid
    G, labels, features, train, valid, test = synthetic_planetoid(
        n_nodes=120, n_classes=3, n_features=16, avg_degree=5.0, seed=5,
        train_per_class=10, n_valid=30)
    adj = gt.graph2adj(G)
    return dict(adj=adj, labels=labels, features=features, train=train,
                valid=valid, test=test)


def make_model(s):
    return gt.MLP(s["features"], num_classes=3, latent_dims=[8])


def test_best_params_restored(setup):
    model = make_model(setup)
    tr = gt.NodeClassification(setup["train"], setup["labels"][setup["train"]])
    va = gt.NodeClassification(setup["valid"], setup["labels"][setup["valid"]])
    hist = model.train(train=tr, valid=va, patience=10, epochs=80, seed=0)
    # final params reproduce the minimum recorded validation loss
    final_valid = float(model.loss(va))
    assert final_valid == pytest.approx(min(hist["valid_loss"]), rel=1e-5)


def test_patience_stops_early(setup):
    model = make_model(setup)
    tr = gt.NodeClassification(setup["train"], setup["labels"][setup["train"]])
    hist = model.train(train=tr, patience=5, epochs=500, seed=0)
    # with tiny patience it must stop long before 500
    assert hist["epochs_run"] < 400


def test_valid_defaults_to_train(setup):
    model = make_model(setup)
    tr = gt.NodeClassification(setup["train"], setup["labels"][setup["train"]])
    hist = model.train(train=tr, patience=5, epochs=30, seed=0)
    assert len(hist["valid_loss"]) == len(hist["train_loss"])


def test_degradation_scales_updates(setup):
    model = make_model(setup)
    tr = gt.NodeClassification(setup["train"], setup["labels"][setup["train"]])
    before = model.init(0)
    model.params = before
    model.train(train=tr, patience=3, epochs=3,
                degradation=lambda e: 0.0, seed=0)
    # zero degradation -> zero gradients -> params never move from init
    after = model.params
    for k in before:
        np.testing.assert_allclose(np.asarray(before[k]),
                                   np.asarray(after[k]), atol=1e-7)


def test_frozen_params_never_move(setup):
    model = gt.MLP(setup["features"], num_classes=3, latent_dims=[8])
    frozen = model.create_param((4, 4), "ones", trainable=False)
    tr = gt.NodeClassification(setup["train"], setup["labels"][setup["train"]])
    model.train(train=tr, patience=5, epochs=10, seed=0)
    np.testing.assert_allclose(np.asarray(model.params[frozen]), np.ones((4, 4)))


def test_custom_optimizer(setup):
    model = make_model(setup)
    tr = gt.NodeClassification(setup["train"], setup["labels"][setup["train"]])
    hist = model.train(train=tr, patience=5, epochs=10, seed=0,
                       optimizer=optax.sgd(0.1))
    assert len(hist["train_loss"]) >= 1


def test_batches_repeats_step(setup):
    model = make_model(setup)
    tr = gt.NodeClassification(setup["train"], setup["labels"][setup["train"]])
    hist = model.train(train=tr, patience=3, epochs=3, batches=2, seed=0)
    assert len(hist["train_loss"]) >= 1


def test_reset_reinitializes(setup):
    model = make_model(setup)
    model.reset(seed=1)
    p1 = model.params
    model.reset(seed=2)
    p2 = model.params
    diffs = [not np.array_equal(np.asarray(p1[k]), np.asarray(p2[k]))
             for k in p1 if p1[k].size > 1 and np.asarray(p1[k]).any()]
    assert any(diffs)


def test_callbacks_can_stop(setup):
    model = make_model(setup)
    tr = gt.NodeClassification(setup["train"], setup["labels"][setup["train"]])
    hist = model.train(train=tr, patience=50, epochs=100, seed=0,
                       callbacks=[lambda **kw: kw["epoch"] >= 4])
    assert len(hist["train_loss"]) <= 6


def test_block_epochs_matches_host_loop(small_dataset):
    """The fused lax.scan path must reproduce the host loop exactly:
    same best params (identical predictions), same early-stop epoch."""
    import gnntf_tpu as gt

    G, labels, features, train, valid, test = small_dataset
    adj = gt.graph2adj(G)

    def run(block_epochs):
        gt.set_seed(0)
        m = gt.APPNP(adj, features, num_classes=len(set(labels)),
                     iterations=3)
        h = m.train(train=gt.NodeClassification(train, labels[train]),
                    valid=gt.NodeClassification(valid, labels[valid]),
                    epochs=30, patience=5, seed=11,
                    block_epochs=block_epochs)
        import numpy as np
        return np.asarray(m.predict(gt.NodeClassification(test))), h

    pred_host, h_host = run(1)
    pred_fused, h_fused = run(8)
    np.testing.assert_array_equal(pred_host, pred_fused)
    np.testing.assert_allclose(h_host["valid_loss"],
                               h_fused["valid_loss"][:len(h_host["valid_loss"])],
                               rtol=2e-5)
    assert h_host["best_epoch"] == h_fused["best_epoch"]


def test_block_epochs_patience_gating(small_dataset):
    """Epochs after patience exhaustion inside a block must not affect the
    returned best params."""
    import gnntf_tpu as gt

    G, labels, features, train, valid, test = small_dataset
    adj = gt.graph2adj(G)

    def run(block_epochs):
        gt.set_seed(0)
        m = gt.MLP(features, num_classes=len(set(labels)))
        m.train(train=gt.NodeClassification(train, labels[train]),
                valid=gt.NodeClassification(valid, labels[valid]),
                epochs=40, patience=2, seed=3, block_epochs=block_epochs)
        import numpy as np
        return np.asarray(m.predict(gt.NodeClassification(test)))

    np.testing.assert_array_equal(run(1), run(40))


def test_block_epochs_callback_best_loss(small_dataset):
    """Callbacks in the fused path see the same running best_loss stream
    as the host loop."""
    import gnntf_tpu as gt
    from gnntf_tpu.utils import TrainLogger

    G, labels, features, train, valid, _ = small_dataset
    def run(block_epochs):
        gt.set_seed(0)
        m = gt.MLP(features, num_classes=len(set(labels)))
        log = TrainLogger()
        m.train(train=gt.NodeClassification(train, labels[train]),
                valid=gt.NodeClassification(valid, labels[valid]),
                epochs=12, patience=50, seed=2, block_epochs=block_epochs,
                callbacks=[log])
        return [round(r["best_loss"], 5) for r in log.records]

    assert run(1) == run(4)


class TestRemat:
    """Layer-wise rematerialization (fit(remat=True)): identical math,
    lower memory — the enabler for GCNII-64 at large scale."""

    def _setup(self):
        from gnntf_tpu.data import synthetic_planetoid
        import gnntf_tpu as gt
        G, labels, features, train, valid, test = synthetic_planetoid(
            n_nodes=150, n_classes=3, n_features=16, avg_degree=6.0,
            seed=13)
        adj = gt.graph2adj(G)
        task = gt.NodeClassification(train, labels[train])
        return gt, adj, features, task

    def test_remat_matches_plain_trajectory(self):
        gt, adj, features, task = self._setup()

        def make():
            return gt.GCNII(adj, features, num_classes=3, iterations=6)

        plain = make()
        plain.reset(0)
        init = dict(plain.params)
        h0 = plain.train(train=task, epochs=5, patience=10, seed=0,
                         init_params=init)
        rem = make()
        h1 = rem.train(train=task, epochs=5, patience=10, seed=0,
                       init_params=dict(init), remat=True)
        np.testing.assert_allclose(h1["train_loss"], h0["train_loss"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1["valid_loss"], h0["valid_loss"],
                                   rtol=1e-5, atol=1e-6)

    def test_remat_rejects_add_loss_layers(self):
        gt, adj, features, task = self._setup()
        from gnntf_tpu.models.experimental import FastReg
        from gnntf_tpu.nn.layers import Dense

        class RegModel(gt.GNN):
            def __init__(self, graph, feats, num_classes):
                super().__init__(graph, feats)
                self.add(Dense(8))
                self.add(FastReg())
                self.add(Dense(num_classes, regularize=False))

        model = RegModel(adj, features, 3)
        with pytest.raises(ValueError, match="add_loss"):
            model.train(train=task, epochs=2, patience=5, seed=0,
                        remat=True)


def test_fused_sampled_link_prediction_matches_host_loop(small_dataset):
    """r5: sampled tasks with static shapes fuse via stacked batches
    (Predictor.stack_batches) — the block pre-draws the sampler in the
    same call order as the host loop, so the trajectory matches."""

    G, labels, features, train, valid, test = small_dataset
    adj = gt.graph2adj(G)
    edges = [tuple(e) for e in list(G.edges())[:120]]

    def run(block_epochs):
        gt.set_seed(3)
        m = gt.APPNP(adj, features, num_classes=8, iterations=3)
        sampler = gt.negative_sampling(edges, G, samples=1, prefetch=False)
        task = gt.LinkPrediction(sampler, loss="diff")
        assert task.supports_stacking and not task.static
        vtask = gt.LinkPrediction(np.asarray(edges),
                                  labels=np.ones(len(edges), np.float32),
                                  loss="bce")
        h = m.train(train=task, valid=vtask, epochs=12, patience=6,
                    seed=5, block_epochs=block_epochs)
        return h

    h_host = run(1)
    h_fused = run(4)
    k = len(h_host["train_loss"])  # fused blocks record gated post-stop
    np.testing.assert_allclose(h_fused["train_loss"][:k],
                               h_host["train_loss"], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(h_fused["valid_loss"][:k],
                               h_host["valid_loss"], rtol=2e-5, atol=1e-6)
    assert h_fused["best_epoch"] == h_host["best_epoch"]
