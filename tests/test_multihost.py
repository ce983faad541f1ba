"""Multi-host (N=2 process) distribution: the GSPMD train step over a
cross-process pod mesh must compute the same losses as single-process
(VERDICT r1 #4 — parallel/multihost.py)."""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _single_process_losses():
    """The same 3 train steps as the worker, single-process local path."""
    import gnntf_tpu as gt
    from gnntf_tpu.data import synthetic_planetoid
    from gnntf_tpu.train.trainer import keras_adam

    G, labels, features, train, valid, test = synthetic_planetoid(
        n_nodes=96, n_classes=3, n_features=16, avg_degree=5.0, seed=4)
    graph = gt.graph2adj(G)
    model = gt.APPNP(graph, features, num_classes=3, iterations=3)
    task = gt.NodeClassification(train, labels[train])
    tx = keras_adam(0.01)
    params = model.init(0)
    opt_state = tx.init(params)

    from gnntf_tpu.train.trainer import _total_loss

    @jax.jit
    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(
            lambda p: _total_loss(model, task, p, model.features, rng,
                                  task.batch(), 5e-4))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i in range(3):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i))
    return float(loss)


def _single_process_hier_reference():
    """The worker's hier-halo fit, run on the local (no-mesh) path with the
    identical init and RNG stream."""
    import gnntf_tpu as gt
    from gnntf_tpu.data import synthetic_planetoid

    G, labels, features, train, valid, test = synthetic_planetoid(
        n_nodes=96, n_classes=3, n_features=16, avg_degree=5.0, seed=4)
    model = gt.APPNP(gt.graph2adj(G), features, num_classes=3, iterations=3)
    model.reset(0)
    task = gt.NodeClassification(train, labels[train])
    hist = model.train(train=task, patience=3, epochs=3, seed=0,
                       init_params=dict(model.params))
    return float(hist["train_loss"][-1])


def test_two_process_train_step_matches_single():
    from gnntf_tpu.parallel.multihost import free_port

    port = free_port()
    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               GNNTF_TPU_ALLOW_SYNTHETIC="1")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    assert all(o["devices"] == 4 for o in outs), outs
    # both processes see the identical replicated loss
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    # hierarchical-halo training (3-phase ICI/DCN exchange across the two
    # processes) agrees between processes and with the local trajectory
    assert outs[0]["hier_loss"] == pytest.approx(outs[1]["hier_loss"],
                                                 rel=1e-6)
    assert outs[0]["hier_loss"] == pytest.approx(
        _single_process_hier_reference(), rel=1e-3)
    # and it matches the single-process trajectory
    expected = _single_process_losses()
    assert outs[0]["loss"] == pytest.approx(expected, rel=1e-4), \
        (outs, expected)


def test_make_pod_mesh_single_process_shapes():
    """Single-process: pod mesh degrades to the ordinary (edge, feat) mesh;
    hierarchical mode exposes the (edge_host, edge, feat) axes."""
    from gnntf_tpu.parallel.multihost import EDGE_HOST_AXIS, make_pod_mesh

    mesh = make_pod_mesh(2)
    assert mesh.shape == {"edge": 4, "feat": 2}
    h = make_pod_mesh(1, n_edge_dcn=2, hierarchical=True)
    assert h.shape == {EDGE_HOST_AXIS: 2, "edge": 4, "feat": 1}
    with pytest.raises(ValueError):
        make_pod_mesh(3)


def test_hierarchical_pod_mesh_runs_spmm():
    """An SpMM sharded over BOTH edge sub-axes (DCN x ICI split of the edge
    dimension) compiles and matches the dense oracle."""
    import gnntf_tpu as gt
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.parallel import pad_graph
    from gnntf_tpu.parallel.multihost import EDGE_HOST_AXIS, make_pod_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(0)
    n, e = 120, 640
    g = from_edges(rng.randint(0, n, e), rng.randint(0, n, e),
                   rng.rand(e).astype(np.float32), n_nodes=n, directed=False)
    mesh = make_pod_mesh(1, n_edge_dcn=2, hierarchical=True)
    padded = pad_graph(g, 8)
    sh = NamedSharding(mesh, P((EDGE_HOST_AXIS, "edge")))
    from gnntf_tpu.graph.coo import Graph
    sharded = Graph(row=jax.device_put(padded.row, sh),
                    col=jax.device_put(padded.col, sh),
                    val=jax.device_put(padded.val, sh),
                    n_nodes=padded.n_nodes,
                    num_self_loop=padded.num_self_loop,
                    sorted_by_row=padded.sorted_by_row)
    x = jnp.asarray(rng.randn(n, 8), jnp.float32)
    out = jax.jit(lambda graph, x: gt.spmm(graph, x))(sharded, x)
    ref = np.asarray(g.to_dense()) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


class TestHierHalo:
    """DCN-aware 3-phase halo exchange on a virtual (2 hosts x 4 chips)
    CPU mesh (VERDICT r2 #5)."""

    @staticmethod
    def _mesh():
        from gnntf_tpu.parallel.multihost import make_pod_mesh
        return make_pod_mesh(1, n_edge_dcn=2, hierarchical=True)

    @staticmethod
    def _graph(n=96, e=700, seed=0, hub=False):
        from gnntf_tpu.graph import from_edges
        rng = np.random.RandomState(seed)
        src = rng.randint(0, n, e)
        dst = rng.randint(0, n, e)
        if hub:  # one node referenced by everyone (forces hub replication)
            dst = np.where(rng.rand(e) < 0.4, 7, dst)
        return from_edges(src, dst, rng.rand(e).astype(np.float32),
                          n_nodes=n, directed=False)

    def test_matches_dense_oracle(self):
        from gnntf_tpu.parallel import (build_hier_halo_partition,
                                        hier_halo_spmm)
        g = self._graph()
        part = build_hier_halo_partition(g, 2, 4)
        x = jnp.asarray(np.random.RandomState(1).randn(g.n_nodes, 8),
                        jnp.float32)
        out = hier_halo_spmm(part, x, self._mesh())
        ref = np.asarray(g.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-4)

    def test_hub_graph_matches_and_bounds_dcn(self):
        from gnntf_tpu.parallel import (build_halo_partition,
                                        build_hier_halo_partition,
                                        hier_halo_spmm)
        g = self._graph(hub=True, seed=3)
        part = build_hier_halo_partition(g, 2, 4)
        assert part.hub_rows > 0
        x = jnp.asarray(np.random.RandomState(2).randn(g.n_nodes, 8),
                        jnp.float32)
        out = hier_halo_spmm(part, x, self._mesh())
        ref = np.asarray(g.to_dense()) @ np.asarray(x)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-4)
        # DCN rows (per-host unions) must not exceed the flat all_to_all's
        # per-chip-pair payload for the same graph
        flat = build_halo_partition(g, 8)
        assert part.dcn_rows_per_device <= flat.n_parts * flat.halo_size

    def test_gradients_flow(self):
        from gnntf_tpu.parallel import (build_hier_halo_partition,
                                        hier_halo_spmm)
        g = self._graph(n=64, e=400, seed=4)
        part = build_hier_halo_partition(g, 2, 4)
        mesh = self._mesh()
        x = jnp.asarray(np.random.RandomState(3).randn(g.n_nodes, 4),
                        jnp.float32)

        def f(x):
            return jnp.sum(hier_halo_spmm(part, x, mesh) ** 2)

        gx = jax.grad(f)(x)
        dense = np.asarray(g.to_dense())
        ref_out = dense @ np.asarray(x)
        ref_gx = 2 * dense.T @ ref_out
        np.testing.assert_allclose(np.asarray(gx), ref_gx, rtol=1e-3,
                                   atol=1e-3)

    def test_training_through_hier_halo_matches_local(self):
        """fit(mesh=hierarchical, spmm='halo') selects the 3-phase path and
        matches the local trajectory (identical init + RNG stream)."""
        import gnntf_tpu as gt
        from gnntf_tpu.data import synthetic_planetoid
        from gnntf_tpu.parallel.halo import HaloExecutor
        G, labels, features, train, valid, _ = synthetic_planetoid(
            n_nodes=160, n_classes=4, n_features=32, avg_degree=6.0, seed=11)
        adj = gt.graph2adj(G)
        mesh = self._mesh()
        assert HaloExecutor(mesh).hierarchical

        def make():
            return gt.APPNP(adj, features, num_classes=4, iterations=3)

        m_local = make()
        m_local.reset(0)
        init = dict(m_local.params)
        tr = gt.NodeClassification(train, labels[train])
        h_local = m_local.train(train=tr, patience=10, epochs=8, seed=0,
                                init_params=init)
        m_hier = make()
        h_hier = m_hier.train(train=tr, patience=10, epochs=8, seed=0,
                              init_params=dict(init), mesh=mesh, spmm="halo")
        np.testing.assert_allclose(h_hier["train_loss"],
                                   h_local["train_loss"],
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(h_hier["valid_loss"],
                                   h_local["valid_loss"],
                                   rtol=2e-3, atol=2e-4)
