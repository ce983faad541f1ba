"""Lazy counter-based edge dropout (ops/stochastic.py).

The contract under test: above ``stochastic.MIN_EDGES`` the training-path
edge dropout becomes a *symbolic* draw (salts on the Graph) and every
consumer — grid SpMM, grid degrees, materialized fallback — realizes the
IDENTICAL mask from the edge ids.  Equivalence is checked against the
per-edge materialized computation (which is itself the reference
dropout -> renormalize -> propagate semantics, gnn.py:36-50, validated in
test_graph.py/test_parity.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnntf_tpu as gt
from gnntf_tpu.graph import from_edges
from gnntf_tpu.graph.coo import add_self_loops
from gnntf_tpu.ops import normalize_adjacency, spmm
from gnntf_tpu.ops.normalize import edge_dropout
from gnntf_tpu.ops.spmm import prepare_spmm, spmm_impl, spmm_segment
from gnntf_tpu.ops import stochastic


@pytest.fixture(scope="module")
def big_graph():
    """Smallest graph over stochastic.MIN_EDGES (so the lazy path engages)
    with duplicates and skewed degrees."""
    rng = np.random.RandomState(0)
    n = 20_000
    e = 40_000
    src = rng.zipf(1.6, e).clip(max=n) - 1
    dst = rng.randint(0, n, e)
    return from_edges(src, dst, n_nodes=n, directed=False)


def test_threshold_engages_lazy(big_graph, small_graph):
    key = jax.random.PRNGKey(0)
    lazy = edge_dropout(big_graph, 0.5, key)
    assert lazy.dropped and lazy.drop_keep == 0.5
    assert lazy.drop_n == big_graph.n_edges
    assert lazy.val is big_graph.val  # raw values untouched
    eager = edge_dropout(small_graph, 0.5, key)
    assert not eager.dropped  # small graphs keep the bernoulli path


def test_mask_statistics(big_graph):
    for rate in (0.25, 0.5, 0.75):
        lazy = edge_dropout(big_graph, rate, jax.random.PRNGKey(1))
        val = np.asarray(stochastic.materialize_dropped(lazy))
        kept = val != 0
        assert abs(kept.mean() - (1 - rate)) < 0.01
        # survivors carry val/keep exactly
        np.testing.assert_allclose(
            val[kept], np.asarray(big_graph.val)[kept] / (1 - rate),
            rtol=1e-6)
    # same key -> identical realization; different keys -> decorrelated
    a = np.asarray(stochastic.materialize_dropped(
        edge_dropout(big_graph, 0.5, jax.random.PRNGKey(2)))) != 0
    b = np.asarray(stochastic.materialize_dropped(
        edge_dropout(big_graph, 0.5, jax.random.PRNGKey(2)))) != 0
    c = np.asarray(stochastic.materialize_dropped(
        edge_dropout(big_graph, 0.5, jax.random.PRNGKey(3)))) != 0
    assert (a == b).all()
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.02


def test_mask_hash_quality():
    """The counter-based mask must behave like iid Bernoulli draws over
    sequential edge ids: uniform across id-range buckets (no positional
    structure) and independent across layer salts (adjacent fold_in keys,
    the exact pattern Forward.next_rng produces)."""
    n = 1 << 16
    eids = jnp.arange(n, dtype=jnp.uint32)
    base = jax.random.PRNGKey(42)
    keys = [jax.random.fold_in(base, i) for i in range(6)]
    masks = np.stack([
        np.asarray(stochastic.keep_mask(eids, stochastic.salts_from_key(k),
                                        0.5, n))
        for k in keys])
    # per-layer keep rate
    rates = masks.mean(axis=1)
    assert (np.abs(rates - 0.5) < 0.01).all(), rates
    # uniformity across 64 sequential-id buckets (chi-square ~ N(63, 126))
    for m in masks:
        kept = m.reshape(64, -1).sum(axis=1)
        expect = m.mean() * (n // 64)
        chi2 = float(((kept - expect) ** 2 / expect).sum() * 2)
        assert chi2 < 63 + 6 * np.sqrt(126), chi2
    # pairwise independence across layers: P(keep_i & keep_j) ~ 0.25
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            joint = (masks[i] & masks[j]).mean()
            assert abs(joint - rates[i] * rates[j]) < 0.01, (i, j, joint)


def test_mask_hash_structured_keys():
    """Adjacent raw PRNGKeys have key data (0, i) — salts differing in a
    couple of LOW bits.  Single-round hash finishers fail exactly here
    (`fmix(e^s0)^s1`: identical masks for adjacent keys; `(..)*C`:
    |corr|~0.5 — see keep_mask's comment), so this gate pins the
    requirement that both salts pass through a full avalanche round."""
    n = 1 << 16
    eids = jnp.arange(n, dtype=jnp.uint32)

    def mask_of(key):
        return np.asarray(stochastic.keep_mask(
            eids, stochastic.salts_from_key(key), 0.5, n))

    pairs = [(jax.random.PRNGKey(2), jax.random.PRNGKey(3)),
             (jax.random.PRNGKey(0), jax.random.PRNGKey(1)),
             (jax.random.PRNGKey(7), jax.random.fold_in(
                 jax.random.PRNGKey(7), 0))]
    for ka, kb in pairs:
        a, b = mask_of(ka), mask_of(kb)
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.02


def test_self_loops_never_dropped(big_graph):
    withloops = add_self_loops(big_graph)
    lazy = edge_dropout(withloops, 0.9, jax.random.PRNGKey(4))
    assert lazy.drop_n == withloops.n_edges - withloops.n_nodes
    val = np.asarray(stochastic.materialize_dropped(lazy))
    np.testing.assert_array_equal(val[lazy.drop_n:],
                                  np.asarray(withloops.val)[lazy.drop_n:])


def test_spmm_matches_materialized(big_graph):
    """Grid SpMM on the lazy graph == segment SpMM on the realized edges
    (same masks) — including lazy normalization scales around it."""
    x = jnp.asarray(np.random.RandomState(5).randn(big_graph.n_nodes, 16),
                    jnp.float32)
    adj = normalize_adjacency(big_graph, graph_dropout=0.5,
                              rng=jax.random.PRNGKey(6))
    assert adj.dropped and adj.scaled
    got = spmm(adj, x)
    want = spmm_segment(adj.materialized(), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_degree_matches_edge_list(big_graph):
    lazy = edge_dropout(big_graph, 0.5, jax.random.PRNGKey(7))
    realized = stochastic.materialize_dropped(lazy)
    want_col = jax.ops.segment_sum(realized, lazy.col,
                                   num_segments=lazy.n_nodes)
    got_col = stochastic.stochastic_degree(lazy, by="col")
    np.testing.assert_allclose(np.asarray(got_col), np.asarray(want_col),
                               rtol=1e-5, atol=1e-5)
    want_row = jax.ops.segment_sum(realized, lazy.row,
                                   num_segments=lazy.n_nodes)
    got_row = stochastic.stochastic_degree(lazy, by="row")
    np.testing.assert_allclose(np.asarray(got_row), np.asarray(want_row),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_materialized(big_graph):
    """The custom VJP (gather-based transpose through the column grid)
    agrees with autodiff of the per-edge path."""
    x = jnp.asarray(np.random.RandomState(8).randn(big_graph.n_nodes, 8),
                    jnp.float32)
    t = jnp.asarray(np.random.RandomState(9).randn(big_graph.n_nodes, 8),
                    jnp.float32)
    key = jax.random.PRNGKey(10)

    def loss_lazy(x):
        adj = normalize_adjacency(big_graph, graph_dropout=0.5, rng=key)
        return jnp.sum((spmm(adj, x) - t) ** 2)

    def loss_mat(x):
        adj = normalize_adjacency(big_graph, graph_dropout=0.5, rng=key)
        return jnp.sum((spmm_segment(adj.materialized(), x) - t) ** 2)

    g_lazy = jax.grad(loss_lazy)(x)
    g_mat = jax.grad(loss_mat)(x)
    np.testing.assert_allclose(np.asarray(g_lazy), np.asarray(g_mat),
                               rtol=2e-3, atol=2e-4)


def test_training_step_equivalence(big_graph):
    """A full APPNP train step through the lazy grid path equals the same
    step with the segment impl forced (which realizes the identical masks
    per edge) — end-to-end: forward, loss, gradients."""
    import optax
    from gnntf_tpu.train.trainer import _total_loss, keras_adam

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(big_graph.n_nodes, 16), jnp.float32)
    model = gt.APPNP(big_graph, x, num_classes=5, iterations=3)
    nodes = rng.choice(big_graph.n_nodes, 500, replace=False)
    task = gt.NodeClassification(nodes, rng.randint(0, 5, 500))
    batch = task.batch()
    params = model.init(0)
    key = jax.random.PRNGKey(12)

    def run():
        loss, grads = jax.value_and_grad(
            lambda p: _total_loss(model, task, p, model.features, key,
                                  batch, 5e-4))(params)
        return loss, grads

    loss_a, grads_a = run()
    with spmm_impl("segment"):
        loss_b, grads_b = run()
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for k in grads_a:
        np.testing.assert_allclose(np.asarray(grads_a[k]),
                                   np.asarray(grads_b[k]),
                                   rtol=5e-3, atol=1e-5)


def test_grids_built_inside_jit_stay_trace_safe(big_graph):
    """Regression: grids are built lazily on first use, which may happen
    INSIDE a jit trace.  A second, different jit must be able to reuse the
    cached grids (numpy leaves — tracer-polluted caches raise
    UnexpectedTracerError here)."""
    stochastic._GRIDS_CACHE.clear()
    x = jnp.asarray(np.random.RandomState(20).randn(big_graph.n_nodes, 4),
                    jnp.float32)
    key = jax.random.PRNGKey(21)

    @jax.jit
    def first(x):  # builds the grids mid-trace
        adj = normalize_adjacency(big_graph, graph_dropout=0.5, rng=key)
        return spmm(adj, x)

    @jax.jit
    def second(x):  # must reuse them from the cache
        adj = normalize_adjacency(big_graph, graph_dropout=0.5, rng=key)
        return jax.grad(lambda x: jnp.sum(spmm(adj, x) ** 2))(x)

    a = first(x)
    g = second(x)
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(g)).all()


def test_prepare_rejects_dropped(big_graph):
    lazy = edge_dropout(big_graph, 0.5, jax.random.PRNGKey(13))
    with pytest.raises(TypeError):
        prepare_spmm(lazy)


def test_stacked_dropout_realizes_first_draw(big_graph):
    """Dropping an already-dropped graph realizes the pending draw before
    applying the new one (no silent mask loss)."""
    lazy = edge_dropout(big_graph, 0.5, jax.random.PRNGKey(14))
    twice = edge_dropout(lazy, 0.5, jax.random.PRNGKey(15))
    kept = np.asarray(stochastic.materialize_dropped(twice)
                      if twice.dropped else twice.val) != 0
    first = np.asarray(stochastic.materialize_dropped(lazy)) != 0
    # an edge surviving both draws must have survived the first
    assert (kept <= first).all()
    assert abs(kept.mean() - 0.25) < 0.02


def test_bf16_value_grids_exact_for_unit_values(big_graph, monkeypatch):
    """GNNTF_GRID_VALUE_DTYPE=bfloat16 halves grid HBM; for unweighted
    graphs (values 1.0, duplicates in separate slots) it is exact."""
    key = jax.random.PRNGKey(11)
    lazy = edge_dropout(big_graph, 0.5, key)
    ref = np.asarray(spmm(lazy, jnp.ones((big_graph.n_nodes, 4),
                                         jnp.float32)))
    monkeypatch.setenv("GNNTF_GRID_VALUE_DTYPE", "bfloat16")
    grids = stochastic.build_train_grids(
        np.asarray(big_graph.row), np.asarray(big_graph.col),
        np.asarray(big_graph.val), big_graph.n_nodes)
    import ml_dtypes
    assert grids.r_val.dtype == np.dtype(ml_dtypes.bfloat16)
    rv = stochastic.masked_row_values(grids, lazy)
    cv = stochastic.masked_col_values(grids, lazy)
    out = np.asarray(grids.core(rv, cv, jnp.ones((big_graph.n_nodes, 4),
                                                 jnp.float32)))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
