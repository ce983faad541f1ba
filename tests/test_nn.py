"""Layer engine + generic layer zoo unit tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnntf_tpu as gt
from gnntf_tpu.nn import (Activation, Branch, Concatenate, Dense, Dropout,
                          Network, Resume, Tradeoff)


def make_net(n=5, d=4):
    return Network((n, d))


def test_dense_shapes_and_forward():
    net = make_net()
    net.add(Dense(3))
    assert net.top_shape() == (5, 3)
    params = net.init(0)
    x = jnp.ones((5, 4))
    out = net.apply(params, x)
    W = params[net.layers()[0].W]
    b = params[net.layers()[0].b]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ W + b),
                               rtol=1e-6)


def test_dense_default_width_and_no_bias():
    net = make_net()
    net.add(Dense(bias=False))
    assert net.top_shape() == (5, 4)
    params = net.init(0)
    assert len(params) == 1  # only W


def test_param_init_schemes():
    from gnntf_tpu.nn.initializers import init_param
    k = jax.random.PRNGKey(0)
    assert np.all(np.asarray(init_param(k, (3, 4), "zero")) == 0)
    assert np.all(np.asarray(init_param(k, (3, 4), "ones")) == 1)
    eye = np.asarray(init_param(k, (3, 3), "eye"))
    np.testing.assert_allclose(eye, np.eye(3))
    small = np.asarray(init_param(k, (100, 16), "small"))
    assert np.abs(small).max() <= 1 / 4.0 + 1e-6
    bern = np.asarray(init_param(k, (50, 16), "bernouli"))
    assert set(np.round(np.unique(np.abs(bern)), 6)) == {round(1 / 4.0, 6)}
    u = np.asarray(init_param(k, (50, 16), 0.3))
    assert np.abs(u).max() <= 0.3
    with pytest.raises(ValueError):
        init_param(k, (3, 3), "nope")


def test_dropout_off_in_eval_mode():
    net = make_net()
    net.add(Dropout(0.9))
    params = net.init(0)
    x = jnp.ones((5, 4))
    out = net.apply(params, x, training=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    out_t = net.apply(params, x, training=True, rng=jax.random.PRNGKey(0))
    assert np.asarray(out_t).mean() != pytest.approx(1.0)


def test_dropout_requires_rng_when_training():
    net = make_net()
    net.add(Dropout(0.5))
    params = net.init(0)
    with pytest.raises(ValueError):
        net.apply(params, jnp.ones((5, 4)), training=True)


def test_activation_variants():
    x = jnp.array([[-1.0, 0.5]])
    for kind, fn in [("relu", lambda v: np.maximum(v, 0)),
                     ("linear", lambda v: v),
                     ("tanh", np.tanh),
                     ("exp", np.exp)]:
        net = Network((1, 2))
        net.add(Activation(kind))
        out = net.apply(net.init(0), x)
        np.testing.assert_allclose(np.asarray(out), fn(np.asarray(x)),
                                   rtol=1e-6)
    # softmax rows sum to 1
    net = Network((1, 2))
    net.add(Activation("softmax"))
    out = np.asarray(net.apply(net.init(0), x))
    assert out.sum() == pytest.approx(1.0)
    # scale starts as identity (s=0)
    net = Network((1, 2))
    net.add(Activation("scale"))
    out = np.asarray(net.apply(net.init(0), x))
    np.testing.assert_allclose(out, np.asarray(x), rtol=1e-6)
    # softthresh with fixed threshold — the reference formula
    # relu(x-t) - relu(t-x) reduces to x - t (layers.py:162-167)
    net = Network((1, 2))
    net.add(Activation("softthresh", threshold=0.2))
    out = np.asarray(net.apply(net.init(0), x))
    np.testing.assert_allclose(out, [[-1.2, 0.3]], rtol=1e-5)


def test_branch_resume_concatenate():
    const = jnp.arange(10.0).reshape(5, 2)
    net = make_net()
    d1 = net.add(Dense(3))
    net.add(Branch(const))
    net.add(Resume(d1))
    assert net.top_shape() == (5, 3)
    net.add(Concatenate(d1))
    assert net.top_shape() == (5, 6)
    params = net.init(0)
    out, fw = net.apply(params, jnp.ones((5, 4)), return_ctx=True)
    np.testing.assert_allclose(np.asarray(fw.acts[1]), np.asarray(const))
    np.testing.assert_allclose(np.asarray(out[:, :3]),
                               np.asarray(fw.acts[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 3:]),
                               np.asarray(fw.acts[0]), rtol=1e-6)


def test_concatenate_list_form():
    net = make_net()
    d1 = net.add(Dense(3))
    d2 = net.add(Dense(2))
    net.add(Concatenate([d1, d2]))
    assert net.top_shape() == (5, 5)
    out, fw = net.apply(net.init(0), jnp.ones((5, 4)), return_ctx=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.concatenate([np.asarray(fw.acts[0]),
                                               np.asarray(fw.acts[1])], 1),
                               rtol=1e-6)


def test_tradeoff_equal_weights_at_init():
    net = make_net()
    d1 = net.add(Dense(3))
    d2 = net.add(Dense(3))
    net.add(Tradeoff([d1, d2]))
    out, fw = net.apply(net.init(0), jnp.ones((5, 4)), return_ctx=True)
    expected = 0.5 * (np.asarray(fw.acts[0]) + np.asarray(fw.acts[1]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_output_regularize_loss():
    net = make_net()
    net.add(Dense(3, output_regularize=2.0))
    params = net.init(0)
    out, fw = net.apply(params, jnp.ones((5, 4)), return_ctx=True)
    expected = 2.0 * 0.5 * np.sum(np.asarray(out) ** 2)
    assert float(net.layer_losses(fw)) == pytest.approx(expected, rel=1e-5)


def test_weight_l2_respects_per_param_weight():
    net = make_net()
    net.add(Dense(3, regularize=False))
    net.create_param((2, 2), "ones", regularize=7)
    params = net.init(0)
    assert float(net.weight_l2(params)) == pytest.approx(7 * 0.5 * 4)


def test_shared_param_memoization():
    net = make_net()
    a = net.create_param((2, 2), shared_name="shared")
    b = net.create_param((3, 3), shared_name="shared")
    assert a == b
    assert len(net.param_specs) == 1


def test_lstm_forward_shape():
    from gnntf_tpu.nn import LSTM
    net = Network((3, 6))
    net.add(LSTM(4, dict_size=10))
    assert net.top_shape() == (3, 8)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 10, (3, 6)))
    out = net.apply(net.init(0), tokens)
    assert out.shape == (3, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_wrap_flax_module():
    import flax.linen as fnn
    net = make_net()
    net.add(gt.Wrap(fnn.Dense, 7))
    assert net.top_shape() == (5, 7)
    out = net.apply(net.init(0), jnp.ones((5, 4)))
    assert out.shape == (5, 7)


def test_batches_generator():
    """API-surface parity for the reference's batching util."""
    import numpy as np
    from gnntf_tpu.nn import batches

    data = {"x": np.arange(10), "y": np.arange(10) * 2}
    out = list(batches(data, 4))
    assert [len(b["x"]) for b in out] == [4, 4, 2]
    np.testing.assert_array_equal(out[1]["y"], np.arange(4, 8) * 2)
