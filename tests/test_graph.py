"""Graph core: conversion semantics + normalization vs dense numpy oracle.

The oracle replicates the reference math (gnn.py:36-50,
graph_manipulation.py:24-31) independently in numpy.
"""
import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

import gnntf_tpu as gt
from gnntf_tpu.graph import from_edges
from gnntf_tpu.ops import normalize_adjacency, spmm


def dense_of(graph):
    return np.asarray(graph.to_dense())


def test_graph2adj_symmetrizes_and_sums_duplicates():
    G = nx.DiGraph()
    G.add_nodes_from(range(3))
    G.add_edge(0, 1)
    G.add_edge(1, 0)  # reciprocal pair -> value-2 entries after symmetrize
    G.add_edge(1, 2, weight=3.0)
    adj = gt.graph2adj(G)
    dense = dense_of(adj)
    assert dense[0, 1] == 2.0 and dense[1, 0] == 2.0
    assert dense[1, 2] == 3.0 and dense[2, 1] == 3.0


def test_graph2adj_directed():
    G = nx.DiGraph()
    G.add_nodes_from("abc")
    G.add_edge("a", "b")
    adj = gt.graph2adj(G, directed=True)
    dense = dense_of(adj)
    assert dense[0, 1] == 1.0 and dense[1, 0] == 0.0


def test_node_order_contract():
    G = nx.DiGraph()
    for u in ["x", "z", "a"]:
        G.add_node(u)
    G.add_edge("z", "a")
    ids = gt.graph2indices(G)
    assert ids == [[1, 2]]  # graph-iteration order, not sorted order


def _numpy_symmetric_norm(dense):
    colsum = dense.sum(axis=0)
    with np.errstate(divide="ignore"):
        d = np.where(colsum > 0, 1.0 / np.sqrt(colsum), 0.0)
    return d[:, None] * dense * d[None, :]


def test_symmetric_normalization_matches_oracle():
    rng = np.random.RandomState(0)
    n = 12
    src, dst = np.nonzero(rng.rand(n, n) < 0.3)
    vals = rng.rand(src.shape[0])
    g = from_edges(src, dst, vals, n_nodes=n)
    normed = normalize_adjacency(g, graph_dropout=0.0)
    np.testing.assert_allclose(
        dense_of(normed), _numpy_symmetric_norm(dense_of(g)),
        rtol=1e-5, atol=1e-6)


def test_bipartite_normalization_matches_oracle():
    rng = np.random.RandomState(1)
    n = 10
    src, dst = np.nonzero(rng.rand(n, n) < 0.4)
    g = from_edges(src, dst, n_nodes=n)
    normed = normalize_adjacency(g, graph_dropout=0.0, normalized="bipartite")
    dense = dense_of(g)
    colsum = dense.sum(axis=0)
    d = np.where(colsum != 0, 1.0 / np.where(colsum == 0, 1, colsum), 0.0)
    np.testing.assert_allclose(dense_of(normed), d[:, None] * dense,
                               rtol=1e-5, atol=1e-6)


def test_row_normalization_is_true_neighbor_mean_on_directed():
    """'row' mode divides by the per-destination degree, so A_hat @ X is the
    exact neighbor mean even for directed (non-symmetrized) graphs — the
    case where the reference-style 'bipartite' (colsum) mode is wrong."""
    rng = np.random.RandomState(2)
    n = 11
    src, dst = np.nonzero(rng.rand(n, n) < 0.35)
    g = from_edges(src, dst, n_nodes=n, directed=True)  # deliberately directed
    normed = normalize_adjacency(g, graph_dropout=0.0, normalized="row")
    dense = dense_of(g)
    rowsum = dense.sum(axis=1)
    d = np.where(rowsum != 0, 1.0 / np.where(rowsum == 0, 1, rowsum), 0.0)
    np.testing.assert_allclose(dense_of(normed), d[:, None] * dense,
                               rtol=1e-5, atol=1e-6)
    # and the induced SpMM is a mean: rows of A_hat sum to 1 (or 0)
    sums = dense_of(normed).sum(axis=1)
    assert np.all((np.abs(sums - 1) < 1e-5) | (np.abs(sums) < 1e-7))


def test_isolated_nodes_divide_no_nan():
    g = from_edges([0], [1], n_nodes=4)  # nodes 2,3 isolated
    normed = normalize_adjacency(g, graph_dropout=0.0)
    assert np.all(np.isfinite(dense_of(normed)))


class TestLazyScaling:
    """Normalization returns lazy diagonal scales (row_scale/col_scale);
    every SpMM path must apply them exactly (rs ⊙ (A @ (cs ⊙ x)) ==
    (diag(rs) A diag(cs)) @ x)."""

    def _graph(self, n=40, seed=3):
        rng = np.random.RandomState(seed)
        src, dst = np.nonzero(rng.rand(n, n) < 0.2)
        return from_edges(src, dst, rng.rand(src.shape[0]), n_nodes=n,
                          directed=False)

    def test_normalize_is_lazy_and_materialized_matches(self):
        g = self._graph()
        normed = normalize_adjacency(g, graph_dropout=0.0)
        assert normed.scaled and normed.row_scale is not None
        mat = normed.materialized()
        assert not mat.scaled
        # materialized values == eager per-edge scaling
        deg = np.zeros(g.n_nodes)
        np.add.at(deg, np.asarray(g.col), np.asarray(g.val))
        d = np.where(deg > 0, 1 / np.sqrt(np.maximum(deg, 1e-30)), 0.0)
        expect = np.asarray(g.val) * d[np.asarray(g.row)] \
            * d[np.asarray(g.col)]
        np.testing.assert_allclose(np.asarray(mat.val), expect,
                                   rtol=1e-5, atol=1e-7)

    def test_all_impls_agree_on_scaled_graph(self):
        import importlib
        spmm_mod = importlib.import_module("gnntf_tpu.ops.spmm")
        g = self._graph()
        normed = normalize_adjacency(g, graph_dropout=0.0)
        x = jnp.asarray(np.random.RandomState(0).randn(g.n_nodes, 16),
                        jnp.float32)
        oracle = np.asarray(normed.to_dense()) @ np.asarray(x)
        for fn in (spmm_mod.spmm_segment, spmm_mod.spmm_ell,
                   spmm_mod.spmm_hybrid):
            np.testing.assert_allclose(np.asarray(fn(normed, x)), oracle,
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=fn.__name__)

    def test_scaled_spmm_under_jit_with_dropout(self):
        """The production shape: per-layer dropout + renormalize + spmm
        inside jit, lazy scales flowing as tracers."""
        import jax
        g = self._graph()
        x = jnp.asarray(np.random.RandomState(1).randn(g.n_nodes, 8),
                        jnp.float32)

        @jax.jit
        def f(x, rng):
            a = normalize_adjacency(g, graph_dropout=0.5, rng=rng)
            return spmm(a, x)

        out = np.asarray(f(x, jax.random.PRNGKey(0)))
        assert np.all(np.isfinite(out))
        # dropout-off jit path must equal the dense oracle exactly
        @jax.jit
        def f0(x):
            a = normalize_adjacency(g, graph_dropout=0.0)
            return spmm(a, x)

        a0 = normalize_adjacency(g, graph_dropout=0.0)
        oracle = np.asarray(a0.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(f0(x)), oracle,
                                   rtol=1e-4, atol=1e-5)

    def test_add_eye_after_materializes(self):
        g = self._graph(n=12)
        normed = normalize_adjacency(g, graph_dropout=0.0, add_eye="after")
        # the identity stays lazy (eye_weight) — exact (A_norm + I) @ x ==
        # A_norm @ x + x — instead of materializing the scales per edge
        assert normed.eye_weight == 1.0
        dense = np.asarray(normed.to_dense())
        base = np.asarray(
            normalize_adjacency(g, graph_dropout=0.0).to_dense())
        np.testing.assert_allclose(dense, base + np.eye(g.n_nodes),
                                   rtol=1e-5, atol=1e-6)

    def test_executor_with_scaled_graph(self):
        """Direct executor calls (halo) on a scaled graph peel the scales."""
        from gnntf_tpu.parallel import make_mesh
        from gnntf_tpu.parallel.halo import HaloExecutor
        g = self._graph(n=48)
        normed = normalize_adjacency(g, graph_dropout=0.0)
        x = jnp.asarray(np.random.RandomState(2).randn(g.n_nodes, 8),
                        jnp.float32)
        ex = HaloExecutor(make_mesh(8, 1))
        oracle = np.asarray(normed.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(ex(normed, x)), oracle,
                                   rtol=1e-4, atol=1e-5)


def test_add_eye_before_and_after():
    g = from_edges([0, 1], [1, 0], n_nodes=2)
    before = normalize_adjacency(g, graph_dropout=0.0, add_eye="before")
    dense = dense_of(before)
    # A+I has colsums [2,2]; normalized entries all 0.5
    np.testing.assert_allclose(dense, np.full((2, 2), 0.5), rtol=1e-6)
    after = normalize_adjacency(g, graph_dropout=0.0, add_eye="after")
    dense_a = dense_of(after)
    # normalize first (entries 1.0), then add raw eye
    np.testing.assert_allclose(dense_a, np.array([[1.0, 1.0], [1.0, 1.0]]),
                               rtol=1e-6)


def test_invalid_normalization_raises():
    g = from_edges([0], [1], n_nodes=2)
    with pytest.raises(ValueError):
        normalize_adjacency(g, graph_dropout=0.0, normalized="nope")


def test_spmm_matches_dense():
    rng = np.random.RandomState(2)
    n, f = 15, 7
    src, dst = np.nonzero(rng.rand(n, n) < 0.3)
    vals = rng.randn(src.shape[0])
    g = from_edges(src, dst, vals, n_nodes=n)
    x = rng.randn(n, f).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmm(g, x)), dense_of(g) @ x,
                               rtol=1e-4, atol=1e-5)


def test_edge_dropout_expectation():
    import jax
    g = from_edges(np.zeros(2000, np.int64), np.arange(2000) % 50,
                   n_nodes=2000)
    from gnntf_tpu.ops.normalize import edge_dropout
    dropped = edge_dropout(g, 0.5, jax.random.PRNGKey(0))
    vals = np.asarray(dropped.val)
    # survivors scaled by 1/(1-rate): values are 0 or 2
    assert set(np.unique(vals)).issubset({0.0, 2.0})
    assert abs(vals.mean() - 1.0) < 0.15


def test_adj2graph_roundtrip():
    G = nx.DiGraph()
    G.add_nodes_from(range(4))
    G.add_edges_from([(0, 1), (2, 3)])
    adj = gt.graph2adj(G, directed=True)
    G2 = gt.adj2graph(range(4), adj)
    assert set(G2.edges()) == {(0, 1), (2, 3)}


class TestELL:
    """Row-split ELL SpMM (ops/spmm.py): the fast TPU formulation must be
    numerically interchangeable with the segment-sum path."""

    def _graph(self, n=157, e=1100, seed=0, directed=False):
        rng = np.random.RandomState(seed)
        return gt.from_edges(rng.randint(0, n, e), rng.randint(0, n, e),
                             rng.rand(e).astype(np.float32), n_nodes=n,
                             directed=directed), rng

    def test_matches_dense_oracle(self):
        from gnntf_tpu.ops.spmm import spmm_ell

        g, rng = self._graph()
        x = jnp.asarray(rng.randn(g.n_nodes, 13), jnp.float32)
        out = spmm_ell(g, x)
        ref = np.asarray(g.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def test_matches_segment_for_all_k(self):
        from gnntf_tpu.ops.spmm import spmm_ell, spmm_segment

        g, rng = self._graph(seed=3)
        x = jnp.asarray(rng.randn(g.n_nodes, 8), jnp.float32)
        ref = np.asarray(spmm_segment(g, x))
        for k in (1, 2, 8, 64):
            np.testing.assert_allclose(np.asarray(spmm_ell(g, x, k=k)), ref,
                                       rtol=1e-4, atol=1e-5)

    def test_unsorted_structure(self):
        """add_self_loops breaks row-sortedness; the layout build must
        re-sort internally and the value scatter stay correct."""
        from gnntf_tpu.graph import add_self_loops
        from gnntf_tpu.ops.spmm import spmm_ell, spmm_segment

        g, rng = self._graph(seed=5)
        g = add_self_loops(g)
        assert not g.sorted_by_row
        x = jnp.asarray(rng.randn(g.n_nodes, 6), jnp.float32)
        np.testing.assert_allclose(np.asarray(spmm_ell(g, x)),
                                   np.asarray(spmm_segment(g, x)),
                                   rtol=1e-4, atol=1e-5)

    def test_duplicate_edges_coalesced_in_layout(self):
        """Duplicate (row, col) pairs are coalesced at the layout level:
        the gather runs over unique pairs while live values (e.g. per-edge
        dropout draws) are summed per pair — numerically identical to the
        duplicate-summing segment path."""
        import dataclasses as dc
        from gnntf_tpu.ops.spmm import build_ell, spmm_ell, spmm_segment

        src = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2])
        dst = np.array([1, 1, 2, 2, 2, 0, 0, 1, 1])
        vals = np.arange(1.0, 10.0, dtype=np.float32)
        g = gt.from_edges(src, dst, vals, n_nodes=4, directed=True)
        lay = build_ell(np.asarray(g.row), np.asarray(g.col), 4, k=2)
        assert lay.dup_order is not None and lay.n_unique == 5
        x = jnp.asarray(np.random.RandomState(0).randn(4, 6), jnp.float32)
        np.testing.assert_allclose(np.asarray(spmm_ell(g, x, k=2)),
                                   np.asarray(spmm_segment(g, x)),
                                   rtol=1e-5, atol=1e-6)
        # gradients through the coalescing map flow back per ORIGINAL edge
        f_ell = lambda v: jnp.sum(spmm_ell(dc.replace(g, val=v), x, k=2) ** 2)
        f_seg = lambda v: jnp.sum(
            spmm_segment(dc.replace(g, val=v), x) ** 2)
        np.testing.assert_allclose(np.asarray(jax.grad(f_ell)(g.val)),
                                   np.asarray(jax.grad(f_seg)(g.val)),
                                   rtol=1e-4, atol=1e-5)

    def test_hybrid_matches_segment_with_grads(self):
        """Hub-densified SpMM == segment SpMM on a hubby graph, with traced
        values and gradients (the training pattern)."""
        import dataclasses as dc
        from gnntf_tpu.ops.spmm import (_hybrid_layout, spmm_hybrid,
                                        spmm_segment)

        rng = np.random.RandomState(9)
        n, e = 300, 4000
        # power-law-ish: half the edges source from 10 hub nodes
        hub_src = rng.randint(0, 10, e // 2)
        src = np.concatenate([hub_src, rng.randint(0, n, e - e // 2)])
        dst = rng.randint(0, n, e)
        g = gt.from_edges(src, dst, rng.rand(e).astype(np.float32),
                          n_nodes=n, directed=False)
        lay = _hybrid_layout(g, 8)
        assert lay is not None and not isinstance(lay, str)  # hubs engaged
        x = jnp.asarray(rng.randn(n, 16), jnp.float32)
        np.testing.assert_allclose(np.asarray(spmm_hybrid(g, x)),
                                   np.asarray(spmm_segment(g, x)),
                                   rtol=1e-4, atol=1e-5)

        @jax.jit
        def f_h(val):
            return jnp.sum(spmm_hybrid(dc.replace(g, val=val), x) ** 2)

        gr = jax.grad(f_h)(g.val)
        gr_ref = jax.grad(lambda v: jnp.sum(
            spmm_segment(dc.replace(g, val=v), x) ** 2))(g.val)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_hybrid_declines_gracefully(self):
        """build_hybrid returns None past the dense-slice memory cap and
        spmm_hybrid falls back to ELL numerics."""
        from gnntf_tpu.ops.spmm import build_hybrid, spmm_hybrid, spmm_segment

        g, rng = self._graph(seed=13)
        assert build_hybrid(np.asarray(g.row), np.asarray(g.col),
                            g.n_nodes, mem_cap=0) is None
        x = jnp.asarray(rng.randn(g.n_nodes, 8), jnp.float32)
        np.testing.assert_allclose(np.asarray(spmm_hybrid(g, x)),
                                   np.asarray(spmm_segment(g, x)),
                                   rtol=1e-4, atol=1e-5)

    def test_layout_cache_survives_tracing(self):
        """The layout cache must hold trace-safe (numpy) constants: a layout
        first built *inside* one jit trace is reused by a different trace
        (tracers leaked into the cache raise UnexpectedTracerError here)."""
        import dataclasses as dc
        from gnntf_tpu.ops.spmm import spmm_ell

        g, rng = self._graph(seed=11)
        x = jnp.asarray(rng.randn(g.n_nodes, 4), jnp.float32)

        @jax.jit
        def first(val):
            return spmm_ell(dc.replace(g, val=val), x)

        @jax.jit
        def second(val):
            return 2.0 * spmm_ell(dc.replace(g, val=val), x)

        a = np.asarray(first(g.val))
        b = np.asarray(second(g.val))
        np.testing.assert_allclose(b, 2.0 * a, rtol=1e-5)

    def test_traced_values_concrete_structure(self):
        """Structure is a trace constant, values traced (the graph-dropout
        training pattern): spmm_ell must jit and differentiate."""
        import dataclasses as dc
        from gnntf_tpu.ops.spmm import spmm_ell, spmm_segment

        g, rng = self._graph(seed=7)
        x = jnp.asarray(rng.randn(g.n_nodes, 5), jnp.float32)

        @jax.jit
        def f(val):
            return jnp.sum(spmm_ell(dc.replace(g, val=val), x) ** 2)

        gr = jax.grad(f)(g.val)
        gr_ref = jax.grad(
            lambda val: jnp.sum(spmm_segment(dc.replace(g, val=val), x) ** 2)
        )(g.val)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_auto_dispatch_falls_back_on_tracers(self):
        """Passing the graph as a jit argument traces the structure; the
        auto dispatcher must quietly use the segment path."""
        g, rng = self._graph(seed=9)
        x = jnp.asarray(rng.randn(g.n_nodes, 4), jnp.float32)

        @jax.jit
        def f(g, x):
            return gt.spmm(g, x)

        np.testing.assert_allclose(np.asarray(f(g, x)),
                                   np.asarray(gt.spmm(g, x)),
                                   rtol=1e-4, atol=1e-5)

    def test_isolated_and_high_degree_rows(self):
        """Rows with degree 0 and degree >> k both come out right."""
        from gnntf_tpu.ops.spmm import spmm_ell

        n = 40
        src = np.concatenate([np.zeros(25, np.int64), [5, 5, 7]])
        dst = np.concatenate([np.arange(1, 26), [6, 8, 9]])
        g = gt.from_edges(src, dst, n_nodes=n, directed=True)
        x = jnp.asarray(np.random.RandomState(0).randn(n, 3), jnp.float32)
        ref = np.asarray(g.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(spmm_ell(g, x, k=4)), ref,
                                   rtol=1e-5, atol=1e-5)


class TestSDDMM:
    """edge_dot / sddmm (ops/spmm.py): per-edge dot products on the
    sparsity pattern — also LinkPrediction's scoring core."""

    def test_sddmm_matches_dense(self):
        from gnntf_tpu.graph import from_edges
        from gnntf_tpu.ops import sddmm

        rng = np.random.RandomState(0)
        n, e = 50, 300
        g = from_edges(rng.randint(0, n, e), rng.randint(0, n, e),
                       n_nodes=n, directed=True)
        x = jnp.asarray(rng.randn(n, 7), jnp.float32)
        y = jnp.asarray(rng.randn(n, 7), jnp.float32)
        scores = np.asarray(sddmm(g, x, y))
        full = np.asarray(x) @ np.asarray(y).T
        np.testing.assert_allclose(
            scores, full[np.asarray(g.row), np.asarray(g.col)],
            rtol=1e-5, atol=1e-6)

    def test_edge_dot_is_link_prediction_score(self):
        """The DistMult-folded edge_dot equals the explicit
        sims @ r formulation used by the reference
        (graph_predictor.py:120-124)."""
        from gnntf_tpu.ops import edge_dot

        rng = np.random.RandomState(1)
        acts = jnp.asarray(rng.randn(30, 5), jnp.float32)
        r = jnp.asarray(rng.rand(5, 1), jnp.float32)
        edges = jnp.asarray(rng.randint(0, 30, (40, 2)), jnp.int32)
        got = edge_dot(edges[:, 0], edges[:, 1],
                       acts * r[:, 0][None, :], acts)
        sims = acts[edges[:, 0]] * acts[edges[:, 1]]
        want = (sims @ r)[:, 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestHybridAtScale:
    """The hybrid SpMM + full train step at >=100K nodes / >=1M edges on
    CPU: completion + memory sanity (VERDICT r2 #4 — discriminates
    'remote-compile flake' from 'hybrid hangs at scale' for the r02 bench
    timeout)."""

    def test_hybrid_train_step_completes_at_scale(self):
        import gnntf_tpu as gt
        from gnntf_tpu.data.synthetic import random_power_law_edges

        n_nodes, n_edges = 100_000, 600_000  # symmetrized: 1.2M edges
        src, dst = random_power_law_edges(n_nodes, n_edges, seed=0)
        g = from_edges(src, dst, n_nodes=n_nodes, directed=False)
        assert g.n_edges >= 1_000_000
        rng = np.random.RandomState(0)
        x = rng.randn(n_nodes, 32).astype(np.float32)
        model = gt.APPNP(g, x, num_classes=8, iterations=3)
        tr = rng.choice(n_nodes, 5_000, replace=False)
        labels = rng.randint(0, 8, 5_000)
        hist = model.train(
            train=gt.NodeClassification(tr, labels),
            patience=2, epochs=2, seed=0)
        assert np.isfinite(hist["train_loss"][-1])
        # the auto dispatcher must actually have taken the hybrid path
        import importlib
        spmm_mod = importlib.import_module("gnntf_tpu.ops.spmm")
        layout = spmm_mod._hybrid_layout(g, spmm_mod._ELL_DEFAULT_K)
        assert layout is not spmm_mod._NO_HUBS and layout is not None
        # memory sanity: dense slice within the configured cap
        assert n_nodes * layout.n_hubs * 4 <= spmm_mod._HUB_MEM_CAP


class TestPreparedSpMM:
    """prepare_spmm: eager value routing, jit-callable pure compute."""

    def _graph(self, n=60, seed=9):
        rng = np.random.RandomState(seed)
        src, dst = np.nonzero(rng.rand(n, n) < 0.15)
        return from_edges(src, dst, rng.rand(src.shape[0]), n_nodes=n,
                          directed=False)

    def test_matches_oracle_raw_and_normalized(self):
        from gnntf_tpu.ops import prepare_spmm
        g = self._graph()
        x = jnp.asarray(np.random.RandomState(0).randn(g.n_nodes, 8),
                        jnp.float32)
        for graph in (g, normalize_adjacency(g, graph_dropout=0.0)):
            prepared = prepare_spmm(graph)
            oracle = np.asarray(graph.to_dense()) @ np.asarray(x)
            np.testing.assert_allclose(np.asarray(prepared(x)), oracle,
                                       rtol=1e-4, atol=1e-5)
            under_jit = jax.jit(lambda v: prepared(v))(x)
            np.testing.assert_allclose(np.asarray(under_jit), oracle,
                                       rtol=1e-4, atol=1e-5)

    def test_rejects_traced_values(self):
        from gnntf_tpu.ops import prepare_spmm
        g = self._graph()

        def f(val):
            import dataclasses
            prepare_spmm(dataclasses.replace(g, val=val))

        with pytest.raises(TypeError, match="concrete edge values"):
            jax.jit(f)(g.val)

    def test_hybrid_and_ell_paths(self):
        """Small graph declines hubs (ELL path); a hub-heavy graph takes
        the hybrid path — both must agree with the oracle."""
        from gnntf_tpu.ops import prepare_spmm
        rng = np.random.RandomState(1)
        n, e = 200, 3000
        src = rng.randint(0, n, e)
        dst = np.where(rng.rand(e) < 0.5, 3, rng.randint(0, n, e))
        g = from_edges(src, dst, n_nodes=n, directed=False)
        prepared = prepare_spmm(g)
        x = jnp.asarray(rng.randn(n, 8), jnp.float32)
        oracle = np.asarray(g.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(prepared(x)), oracle,
                                   rtol=1e-4, atol=1e-4)
