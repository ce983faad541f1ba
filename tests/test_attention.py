"""GAT attention kernels (ops/attention.py): the ELL-grid formulation
must match the per-edge segment path bit-for-bit in semantics (duplicate
edges keep separate softmax contributions), including gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnntf_tpu as gt
from gnntf_tpu.graph import from_edges
from gnntf_tpu.ops import attention
from gnntf_tpu.ops.attention import (_gat_attention_ell,
                                     _gat_attention_segment, gat_attention)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    n, e = 80, 600
    src = rng.randint(0, n, e)
    dst = rng.randint(0, n, e)
    graph = from_edges(src, dst, n_nodes=n, directed=False)  # duplicates
    h = jnp.asarray(rng.randn(n, 4, 8), jnp.float32)
    s_src = jnp.asarray(rng.randn(n, 4), jnp.float32)
    s_dst = jnp.asarray(rng.randn(n, 4), jnp.float32)
    return graph, h, s_src, s_dst


def test_ell_matches_segment(setup):
    graph, h, s_src, s_dst = setup
    a = _gat_attention_segment(graph, h, s_src, s_dst, negative_slope=0.2,
                               attn_dropout=0.0, salt=None,
                               sorted_by_row=graph.sorted_by_row)
    b = _gat_attention_ell(graph, h, s_src, s_dst, negative_slope=0.2,
                           attn_dropout=0.0, salt=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_ell_matches_segment_gradients(setup):
    graph, h, s_src, s_dst = setup

    def loss(fn, h, ss, sd):
        return jnp.sum(fn(graph, h, ss, sd, negative_slope=0.2,
                          attn_dropout=0.0, salt=None) ** 2)

    ga = jax.grad(lambda *a: loss(
        lambda g, h, ss, sd, **kw: _gat_attention_segment(
            g, h, ss, sd, sorted_by_row=g.sorted_by_row, **kw), *a),
        argnums=(0, 1, 2))(h, s_src, s_dst)
    gb = jax.grad(lambda *a: loss(_gat_attention_ell, *a),
                  argnums=(0, 1, 2))(h, s_src, s_dst)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-5)


def test_dropout_realization_identical_across_paths(setup):
    """Counter-based attention dropout (advisor r4): for the same RNG key
    the grid path and the segment fallback must realize the IDENTICAL
    per-(edge, head) mask — values and gradients."""
    from gnntf_tpu.ops.stochastic import salts_from_key
    graph, h, s_src, s_dst = setup
    salt = salts_from_key(jax.random.PRNGKey(7))
    a = _gat_attention_segment(graph, h, s_src, s_dst, negative_slope=0.2,
                               attn_dropout=0.4, salt=salt,
                               sorted_by_row=graph.sorted_by_row)
    b = _gat_attention_ell(graph, h, s_src, s_dst, negative_slope=0.2,
                           attn_dropout=0.4, salt=salt)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)

    def loss(fn, h, ss, sd):
        return jnp.sum(fn(graph, h, ss, sd, negative_slope=0.2,
                          attn_dropout=0.4, salt=salt) ** 2)

    ga = jax.grad(lambda *a: loss(
        lambda g, h, ss, sd, **kw: _gat_attention_segment(
            g, h, ss, sd, sorted_by_row=g.sorted_by_row, **kw), *a),
        argnums=(0, 1, 2))(h, s_src, s_dst)
    gb = jax.grad(lambda *a: loss(_gat_attention_ell, *a),
                  argnums=(0, 1, 2))(h, s_src, s_dst)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4,
                                   atol=1e-4)


def test_dispatch_threshold(setup, monkeypatch):
    graph, h, s_src, s_dst = setup
    ref = _gat_attention_segment(graph, h, s_src, s_dst, negative_slope=0.2,
                                 attn_dropout=0.0, salt=None,
                                 sorted_by_row=graph.sorted_by_row)
    # below threshold: segment path
    out_small = gat_attention(graph, h, s_src, s_dst)
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # patched threshold: grid path, same numbers
    monkeypatch.setattr(attention, "_MIN_EDGES", 8)
    out_grid = gat_attention(graph, h, s_src, s_dst)
    np.testing.assert_allclose(np.asarray(out_grid), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gat_model_trains_through_grid_path(monkeypatch):
    """Full GAT training with the grid attention path engaged."""
    monkeypatch.setattr(attention, "_MIN_EDGES", 8)
    from gnntf_tpu.data import synthetic_planetoid
    G, labels, features, train, valid, test = synthetic_planetoid(
        n_nodes=120, n_classes=3, n_features=16, avg_degree=6.0, seed=9)
    model = gt.GAT(gt.graph2adj(G), features, num_classes=3,
                   latent_dims=[8], heads=2)
    tr = gt.NodeClassification(train, labels[train])
    hist = model.train(train=tr, patience=15, epochs=40, seed=0)
    assert hist["valid_loss"][-1] < hist["valid_loss"][0]
    pred = model.predict(gt.NodeClassification(train))
    assert np.mean(np.asarray(pred) == labels[train]) > 0.5


def test_isolated_destinations_no_nan(monkeypatch):
    monkeypatch.setattr(attention, "_MIN_EDGES", 8)
    # node 9 has no incoming edges
    graph = from_edges([0, 1, 2], [1, 2, 0], n_nodes=10, directed=False)
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.randn(10, 2, 4), jnp.float32)
    s = jnp.asarray(rng.randn(10, 2), jnp.float32)
    out = gat_attention(graph, h, s, s)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.allclose(np.asarray(out)[9], 0.0)
