"""Pallas blocked SpMM kernel vs the segment-sum reference (interpret mode
on CPU — SURVEY §4d), plus the BlockedCOO layout and RCM reordering."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnntf_tpu.graph import from_edges
from gnntf_tpu.graph.reorder import bandwidth, permute_graph, rcm_order
from gnntf_tpu.ops.pallas import block_coo, spmm_pallas
from gnntf_tpu.ops.spmm import spmm_segment


def random_graph(n, e, seed, weighted=True):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, size=e)
    dst = rng.randint(0, n, size=e)
    vals = rng.rand(e).astype(np.float32) if weighted else None
    return from_edges(src, dst, vals, n_nodes=n, directed=False)


@pytest.mark.parametrize("n,e,w,t,be", [
    (100, 300, 64, 64, 128),
    (300, 50, 128, 64, 128),     # sparse: many empty windows
    (515, 2000, 256, 256, 256),  # non-multiple n
])
def test_blocked_matches_segment(n, e, w, t, be):
    g = random_graph(n, e, seed=n + e)
    x = jnp.asarray(np.random.RandomState(1).randn(n, 128), jnp.float32)
    ref = spmm_segment(g, x)
    out = spmm_pallas(g, x, interpret=True, window=w, tile=t, block_edges=be)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_blocked_duplicate_edges_sum():
    # duplicate (u, v) entries must sum, matching graph2adj semantics
    src = np.array([0, 0, 1, 1])
    dst = np.array([1, 1, 2, 2])
    g = from_edges(src, dst, np.array([1.0, 2.0, 3.0, 4.0]),
                   n_nodes=4, directed=True)
    x = jnp.eye(4, 128)
    out = spmm_pallas(g, x, interpret=True, window=8, tile=8, block_edges=128)
    ref = spmm_segment(g, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_block_coo_layout_invariants():
    g = random_graph(200, 600, seed=0)
    b = block_coo(np.asarray(g.row), np.asarray(g.col),
                  g.n_nodes, window=64, tile=64, block_edges=128)
    cw = np.asarray(b.chunk_window)
    # window-major chunk order (monotone) and every window present
    assert np.all(np.diff(cw) >= 0)
    assert set(range(b.n_windows)) <= set(cw.tolist())
    # the edge permutation is a bijection onto distinct slots and scattering
    # live values through it preserves the edge mass
    perm = np.asarray(b.perm)
    assert len(np.unique(perm)) == g.n_edges
    vals = np.asarray(b.scatter_values(g.val))
    assert np.isclose(vals.sum(), np.asarray(g.val).sum())
    # offsets in range
    assert np.asarray(b.rows).max() < b.window
    assert np.asarray(b.cols).max() < b.tile
    assert 0 < b.fill_factor <= 1.0


def test_pallas_uses_live_edge_values():
    """Rescaled edge values on the *same structure object* (a layout-cache
    hit) must flow through the kernel — the round-1 layout cache baked the
    first call's values in (VERDICT r1 weak #1)."""
    import dataclasses

    g = random_graph(150, 500, seed=4)
    x = jnp.asarray(np.random.RandomState(2).randn(150, 64), jnp.float32)
    out1 = spmm_pallas(g, x, interpret=True, window=64, tile=64,
                       block_edges=128)
    g2 = dataclasses.replace(g, val=g.val * 3.0)  # shares g.row -> cache hit
    out2 = spmm_pallas(g2, x, interpret=True, window=64, tile=64,
                       block_edges=128)
    np.testing.assert_allclose(np.asarray(out2), 3.0 * np.asarray(out1),
                               rtol=1e-5, atol=1e-5)


def test_pallas_traced_values_under_jit():
    """graph.val may be a tracer (per-step dropout/renormalization); only
    the structure must be concrete."""
    import dataclasses

    g = random_graph(120, 400, seed=5)
    x = jnp.asarray(np.random.RandomState(3).randn(120, 32), jnp.float32)

    @jax.jit
    def f(scale):
        gt = dataclasses.replace(g, val=g.val * scale)
        return spmm_pallas(gt, x, interpret=True, window=64, tile=64,
                           block_edges=128)

    ref = spmm_segment(g, x)
    np.testing.assert_allclose(np.asarray(f(2.0)), 2.0 * np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # traced structure is rejected with a clear error, not garbage numerics
    @jax.jit
    def g_traced(row):
        gt = dataclasses.replace(g, row=row)
        return spmm_pallas(gt, x, interpret=True)

    with pytest.raises(TypeError, match="concrete"):
        g_traced(g.row)


def test_pallas_training_step_matches_segment():
    """set_spmm_impl('pallas') inside a dropout-on training step produces
    the same trajectory as the segment implementation (same seed): the
    per-step renormalized edge values reach the kernel."""
    import gnntf_tpu as gt
    from gnntf_tpu.ops.spmm import set_spmm_impl

    rng = np.random.RandomState(0)
    g = random_graph(80, 240, seed=6, weighted=False)
    feats = rng.rand(80, 12).astype(np.float32)
    nodes = rng.choice(80, 30, replace=False)
    labels = rng.randint(0, 3, 30)

    def run():
        m = gt.APPNP(g, feats, num_classes=3, iterations=3)
        h = m.train(train=gt.NodeClassification(nodes, labels),
                    epochs=4, patience=50, seed=7)
        return np.asarray(h["valid_loss"])

    base = run()
    set_spmm_impl("pallas")
    try:
        pal = run()
    finally:
        set_spmm_impl("auto")
    np.testing.assert_allclose(pal, base, rtol=1e-4, atol=1e-5)


def test_empty_graph():
    g = from_edges(np.zeros(0, np.int32), np.zeros(0, np.int32),
                   np.zeros(0), n_nodes=50, directed=True)
    x = jnp.ones((50, 128))
    out = spmm_pallas(g, x, interpret=True, window=32, tile=32,
                      block_edges=128)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_rcm_reduces_bandwidth_and_preserves_spmm():
    # ring-of-cliques graph: random labeling has high bandwidth, RCM low
    rng = np.random.RandomState(0)
    n_cliques, k = 20, 8
    n = n_cliques * k
    edges = []
    for c in range(n_cliques):
        base = np.arange(c * k, (c + 1) * k)
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((base[i], base[j]))
        edges.append((c * k, ((c + 1) % n_cliques) * k))
    src, dst = np.array(edges).T
    shuffle = rng.permutation(n)
    g = from_edges(shuffle[src], shuffle[dst], n_nodes=n, directed=False)

    perm = rcm_order(g)
    g2, inv = permute_graph(g, perm)
    assert bandwidth(g2) < bandwidth(g)
    assert bandwidth(g2) <= 3 * k  # chain structure recovered

    x = jnp.asarray(rng.randn(n, 16), jnp.float32)
    ref = spmm_segment(g, x)
    out_perm = spmm_segment(g2, x[perm])
    # out in permuted ordering equals permuted reference
    np.testing.assert_allclose(np.asarray(out_perm), np.asarray(ref)[perm],
                               rtol=1e-5, atol=1e-5)


def test_rcm_improves_fill_factor():
    rng = np.random.RandomState(1)
    n_cliques, k = 32, 16
    n = n_cliques * k
    edges = []
    for c in range(n_cliques):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((base + i, base + j))
    src, dst = np.array(edges).T
    shuffle = rng.permutation(n)
    g = from_edges(shuffle[src], shuffle[dst], n_nodes=n, directed=False)
    kw = dict(window=64, tile=64, block_edges=256)

    def fill(gr):
        return block_coo(np.asarray(gr.row), np.asarray(gr.col),
                         gr.n_nodes, **kw).fill_factor

    g2, _ = permute_graph(g, rcm_order(g))
    assert fill(g2) > fill(g) * 1.5


class TestDMAGather:
    """DMA-gather ELL kernel (interpret mode on CPU, SURVEY §4d): per-row
    async-copy gathers driven by SMEM-resident ELL indices."""

    def test_matches_dense_oracle(self):
        g = random_graph(300, 2000, seed=5)
        x = jnp.asarray(np.random.RandomState(2).randn(300, 16), jnp.float32)
        from gnntf_tpu.ops.pallas.dma_gather import spmm_dma_gather
        out = spmm_dma_gather(g, x, interpret=True)
        oracle = np.asarray(g.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(out), oracle,
                                   rtol=1e-4, atol=1e-4)

    def test_scaled_graph(self):
        from gnntf_tpu.ops import normalize_adjacency
        from gnntf_tpu.ops.pallas.dma_gather import spmm_dma_gather
        g = random_graph(200, 1200, seed=6)
        normed = normalize_adjacency(g, graph_dropout=0.0)
        x = jnp.asarray(np.random.RandomState(3).randn(200, 8), jnp.float32)
        out = spmm_dma_gather(normed, x, interpret=True)
        oracle = np.asarray(normed.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(out), oracle,
                                   rtol=1e-4, atol=1e-4)
