"""Grid-resident edge dropout through the distributed executors
(VERDICT r3 #2) + distributed add_eye (#8) and distributed GAT (#6).

The invariant under test: a lazily-dropped graph reaching a halo/ring/
hier executor must produce the IDENTICAL realized dropout mask as the
single-chip stochastic path — computed locally per device from constant
edge-id grids — and the lowered step must contain no E-sized per-layer
value scatter.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gnntf_tpu as gt
from gnntf_tpu.graph import from_edges
from gnntf_tpu.ops import normalize_adjacency, spmm
from gnntf_tpu.ops.normalize import edge_dropout
from gnntf_tpu.ops.spmm import spmm_executor, spmm_segment
from gnntf_tpu.parallel import make_mesh
from gnntf_tpu.parallel.halo import HaloExecutor
from gnntf_tpu.parallel.ring import RingExecutor
from gnntf_tpu.ops import stochastic


@pytest.fixture(autouse=True)
def small_min_edges(monkeypatch):
    """Engage the lazy counter-based dropout path on test-sized graphs."""
    monkeypatch.setattr(stochastic, "MIN_EDGES", 8)
    yield


@pytest.fixture(scope="module")
def graph():
    rng = np.random.RandomState(3)
    n, e = 96, 700
    return from_edges(rng.randint(0, n, e), rng.randint(0, n, e),
                      n_nodes=n, directed=False)


@pytest.fixture(scope="module")
def x(graph):
    return jnp.asarray(
        np.random.RandomState(4).randn(graph.n_nodes, 16), jnp.float32)


def _lazy(graph, rate=0.4, seed=5):
    lazy = edge_dropout(graph, rate, jax.random.PRNGKey(seed))
    assert lazy.dropped, "lazy path must engage (MIN_EDGES patched)"
    return lazy


class TestExecutorGridDropout:
    def test_halo_matches_materialized_realization(self, graph, x):
        lazy = _lazy(graph)
        ex = HaloExecutor(make_mesh(8, 1))
        out = ex(lazy, x)
        ref = spmm_segment(lazy.materialized_dropout(), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_ring_matches_materialized_realization(self, graph, x):
        lazy = _lazy(graph, seed=6)
        ex = RingExecutor(make_mesh(8, 1))
        out = ex(lazy, x)
        ref = spmm_segment(lazy.materialized_dropout(), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_hier_halo_matches_materialized_realization(self, graph, x):
        from gnntf_tpu.parallel.multihost import make_pod_mesh
        mesh = make_pod_mesh(1, n_edge_dcn=2, n_edge_ici=4,
                             hierarchical=True)
        lazy = _lazy(graph, seed=7)
        ex = HaloExecutor(mesh)
        assert ex.hierarchical
        out = ex(lazy, x)
        ref = spmm_segment(lazy.materialized_dropout(), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_normalized_dropout_through_executor(self, graph, x):
        """Full get_adjacency semantics (dropout -> renormalize) routed
        through the dispatcher + executor: same realization as the
        single-chip dispatcher path."""
        ex = HaloExecutor(make_mesh(8, 1))
        rng = jax.random.PRNGKey(9)

        def dist(x):
            with spmm_executor(ex):
                adj = normalize_adjacency(graph, graph_dropout=0.5, rng=rng)
                return spmm(adj, x)

        local_adj = normalize_adjacency(graph, graph_dropout=0.5, rng=rng)
        ref = spmm_segment(local_adj.materialized(), x)
        np.testing.assert_allclose(np.asarray(dist(x)), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_no_slot_grid_scatter_in_lowered_step(self, graph, x):
        """The VERDICT #2 'done' criterion: the sharded HLO of a training
        step over a lazily-dropped graph contains NO scatter into the
        executor's (P*Emax) slot grid — value routing is gone; the
        materialized path (negative control) does contain one."""
        ex = HaloExecutor(make_mesh(8, 1))
        plan = ex.partition_for(graph)
        n_slots = plan.rows.size

        def step(x, rng):
            with spmm_executor(ex):
                def loss(x):
                    adj = normalize_adjacency(graph, graph_dropout=0.5,
                                              rng=rng)
                    return jnp.sum(spmm(adj, x) ** 2)
                return jax.value_and_grad(loss)(x)

        text = jax.jit(step).lower(x, jax.random.PRNGKey(0)).as_text()

        def slot_scatters(t):
            # stablehlo.scatter is a multi-line region op; the type
            # signature follows the region — match the whole op body
            out = []
            for m in re.finditer(
                    r'"stablehlo\.scatter"\(.*?-> tensor<(\d+)xf32>',
                    t, re.DOTALL):
                if int(m.group(1)) == n_slots:
                    out.append(m.group(0)[-120:])
            return out

        assert not slot_scatters(text), \
            "grid-resident path must not scatter per-edge values"

        # negative control: force the materialized path (traced values)
        def step_mat(x, rng):
            with spmm_executor(ex):
                adj = normalize_adjacency(graph, graph_dropout=0.5, rng=rng)
                return spmm(adj.materialized_dropout(), x).sum()

        text_mat = jax.jit(step_mat).lower(x, jax.random.PRNGKey(0)).as_text()
        assert slot_scatters(text_mat), \
            "control failed: materialized path should route values"


class TestDistributedTraining:
    @pytest.fixture(scope="class")
    def setup(self):
        from gnntf_tpu.data import synthetic_planetoid
        G, labels, features, train, valid, test = synthetic_planetoid(
            n_nodes=160, n_classes=4, n_features=32, avg_degree=6.0,
            seed=21)
        return dict(labels=labels, features=features, train=train,
                    adj=gt.graph2adj(G))

    def test_halo_grid_training_matches_local(self, setup):
        """fit(mesh=, spmm='halo') over a lazily-dropped graph follows the
        exact local trajectory: executor grids realize the same masks as
        the single-chip TrainGrids."""
        labels = setup["labels"]
        tr = gt.NodeClassification(setup["train"], labels[setup["train"]])

        def make():
            return gt.APPNP(setup["adj"], setup["features"], num_classes=4,
                            iterations=3)

        m_local = make()
        m_local.reset(0)
        init = dict(m_local.params)
        h_local = m_local.train(train=tr, patience=10, epochs=6, seed=0,
                                init_params=init)
        m_halo = make()
        h_halo = m_halo.train(train=tr, patience=10, epochs=6, seed=0,
                              init_params=dict(init), mesh=make_mesh(8, 1),
                              spmm="halo")
        np.testing.assert_allclose(h_halo["train_loss"],
                                   h_local["train_loss"],
                                   rtol=2e-3, atol=2e-4)

    def test_ring_grid_training_learns(self, setup):
        labels = setup["labels"]
        tr = gt.NodeClassification(setup["train"], labels[setup["train"]])
        model = gt.APPNP(setup["adj"], setup["features"], num_classes=4,
                         iterations=3)
        hist = model.train(train=tr, patience=10, epochs=8, seed=0,
                           mesh=make_mesh(8, 1), spmm="ring")
        assert hist["valid_loss"][-1] < hist["valid_loss"][0]

    def test_add_eye_after_trains_through_halo(self, setup):
        """VERDICT r3 #8: add_eye='after' normalizations train through
        spmm='halo' — the identity stays lazy (eye_weight), so the
        executor sees base-length values and adds w*x outside."""
        from gnntf_tpu.models.layers import GCNLayer
        from gnntf_tpu.nn.core import Forward

        class EyeGCNLayer(GCNLayer):
            def apply(self, fw: Forward, x):
                adj = fw.adjacency(self.graph_dropout, add_eye="after")
                W = fw.param(self.W)
                y = spmm(adj, jnp.dot(x, W, preferred_element_type=x.dtype))
                if self.b is not None:
                    y = y + fw.param(self.b)
                return fw.dropout(self.activation(y), self.dropout_rate)

        class EyeGCN(gt.GNN):
            def __init__(self, graph, features, num_classes):
                super().__init__(graph, features)
                self.add(EyeGCNLayer(16, graph_dropout=0.5, dropout=0.5))
                self.add(EyeGCNLayer(num_classes,
                                     activation=lambda v: v,
                                     graph_dropout=0.5))

        labels = setup["labels"]
        tr = gt.NodeClassification(setup["train"], labels[setup["train"]])
        model = EyeGCN(setup["adj"], setup["features"], num_classes=4)
        hist = model.train(train=tr, patience=10, epochs=10, seed=0,
                           mesh=make_mesh(8, 1), spmm="halo")
        assert np.isfinite(hist["train_loss"][-1])
        assert hist["valid_loss"][-1] < hist["valid_loss"][0]

    def test_add_eye_before_trains_through_halo(self, setup):
        """add_eye='before': the structure extension is concrete and
        memoized, so the executor builds ONE plan for the extended
        structure and lazy dropout flows through it."""
        from gnntf_tpu.models.layers import GCNLayer
        from gnntf_tpu.nn.core import Forward

        class EyeGCNLayer(GCNLayer):
            def apply(self, fw: Forward, x):
                adj = fw.adjacency(self.graph_dropout, add_eye="before")
                W = fw.param(self.W)
                y = spmm(adj, jnp.dot(x, W, preferred_element_type=x.dtype))
                return fw.dropout(self.activation(y), self.dropout_rate)

        class EyeGCN(gt.GNN):
            def __init__(self, graph, features, num_classes):
                super().__init__(graph, features)
                self.add(EyeGCNLayer(16, graph_dropout=0.5, dropout=0.5))
                self.add(EyeGCNLayer(num_classes,
                                     activation=lambda v: v,
                                     graph_dropout=0.5))

        labels = setup["labels"]
        tr = gt.NodeClassification(setup["train"], labels[setup["train"]])
        model = EyeGCN(setup["adj"], setup["features"], num_classes=4)
        hist = model.train(train=tr, patience=10, epochs=10, seed=0,
                           mesh=make_mesh(8, 1), spmm="halo")
        assert np.isfinite(hist["train_loss"][-1])
        assert hist["valid_loss"][-1] < hist["valid_loss"][0]

    def test_gat_trains_under_gspmd_mesh(self, setup):
        """VERDICT r3 #6: GAT's SDDMM -> segment-softmax -> SpMM chain
        under the GSPMD mesh (graph edge-sharded, XLA-inserted
        collectives).  The halo executor does not intercept attention
        (it accelerates dispatcher SpMMs only) — under spmm='halo' GAT
        simply runs replicated, which the next test pins."""
        labels = setup["labels"]
        tr = gt.NodeClassification(setup["train"], labels[setup["train"]])
        model = gt.GAT(setup["adj"], setup["features"], num_classes=4,
                       latent_dims=[8], heads=2)
        hist = model.train(train=tr, patience=10, epochs=8, seed=0,
                           mesh=make_mesh(4, 2))
        assert np.isfinite(hist["train_loss"][-1])
        assert hist["valid_loss"][-1] < hist["valid_loss"][0]

    def test_fused_distributed_matches_per_epoch(self, setup):
        """r5: the fused multi-epoch lax.scan path runs under a mesh
        (use_fused no longer requires mesh is None) and reproduces the
        per-epoch distributed trajectory exactly — for both the GSPMD
        step and the halo executor."""
        labels = setup["labels"]
        tr = gt.NodeClassification(setup["train"], labels[setup["train"]])

        def make():
            return gt.APPNP(setup["adj"], setup["features"], num_classes=4,
                            iterations=3)

        m0 = make()
        m0.reset(0)
        init = dict(m0.params)
        for kwargs in (dict(mesh=make_mesh(8, 1), spmm="halo"),
                       dict(mesh=make_mesh(4, 2))):
            m_epoch = make()
            h_epoch = m_epoch.train(train=tr, patience=10, epochs=6, seed=0,
                                    init_params=dict(init), **kwargs)
            m_fused = make()
            h_fused = m_fused.train(train=tr, patience=10, epochs=6, seed=0,
                                    init_params=dict(init), block_epochs=3,
                                    **kwargs)
            np.testing.assert_allclose(h_fused["train_loss"],
                                       h_epoch["train_loss"],
                                       rtol=2e-3, atol=2e-4)
            np.testing.assert_allclose(h_fused["valid_loss"],
                                       h_epoch["valid_loss"],
                                       rtol=2e-3, atol=2e-4)

    def test_gat_trains_under_halo_fit(self, setup):
        labels = setup["labels"]
        tr = gt.NodeClassification(setup["train"], labels[setup["train"]])
        model = gt.GAT(setup["adj"], setup["features"], num_classes=4,
                       latent_dims=[8], heads=2)
        hist = model.train(train=tr, patience=10, epochs=6, seed=0,
                           mesh=make_mesh(8, 1), spmm="halo")
        assert np.isfinite(hist["train_loss"][-1])
