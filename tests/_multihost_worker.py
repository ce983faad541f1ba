"""Worker for tests/test_multihost.py: one process of a 2-process CPU
cluster running the real GSPMD train step over a cross-process pod mesh.

Launched with env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=2, argv:
``worker.py <process_id> <num_processes> <port>``.
Prints one JSON line: {"pid": ..., "loss": ..., "devices": ...}.
"""
import json
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from gnntf_tpu.parallel.multihost import (launch_distributed,
                                              make_pod_mesh,
                                              shard_graph_local)
    multi = launch_distributed(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    assert multi, "expected a multi-process runtime"

    import jax
    import jax.numpy as jnp
    import numpy as np

    import gnntf_tpu as gt
    from gnntf_tpu.data import synthetic_planetoid
    from gnntf_tpu.graph.coo import Graph
    from gnntf_tpu.parallel import pad_graph
    from gnntf_tpu.parallel.dist import EDGE_AXIS
    from gnntf_tpu.train.trainer import keras_adam

    n_dev = len(jax.devices())
    mesh = make_pod_mesh(1)

    G, labels, features, train, valid, test = synthetic_planetoid(
        n_nodes=96, n_classes=3, n_features=16, avg_degree=5.0, seed=4)
    graph = gt.graph2adj(G)
    model = gt.APPNP(graph, features, num_classes=3, iterations=3)
    task = gt.NodeClassification(train, labels[train])

    # host-local data placement: this process contributes only its slice of
    # the padded global edge list
    padded = pad_graph(graph, n_dev)
    e_global = padded.n_edges
    lo = pid * e_global // nproc
    hi = (pid + 1) * e_global // nproc
    local = Graph(row=np.asarray(padded.row)[lo:hi],
                  col=np.asarray(padded.col)[lo:hi],
                  val=np.asarray(padded.val)[lo:hi],
                  n_nodes=padded.n_nodes,
                  num_self_loop=padded.num_self_loop,
                  sorted_by_row=padded.sorted_by_row)
    sharded = shard_graph_local(local, mesh, e_global, padded.n_nodes)

    from gnntf_tpu.parallel import make_distributed_train_step, place_state
    tx = keras_adam(0.01)
    params = model.init(0)
    params, features_rep = place_state(model, mesh, params)
    opt_state = tx.init(params)
    step = make_distributed_train_step(model, task, mesh, tx, sharded)
    loss = None
    for i in range(3):
        params, opt_state, loss = step(
            params, opt_state, jax.random.PRNGKey(i), jnp.float32(1.0),
            features_rep, sharded, task.batch())

    # hierarchical (DCN-aware) halo training across the 2-process cluster:
    # the (edge_host=processes, edge=local chips) mesh routes phase 2 of
    # the 3-phase exchange over the cross-process (gloo "DCN") links.
    hier_mesh = make_pod_mesh(1, hierarchical=True)
    model_h = gt.APPNP(graph, features, num_classes=3, iterations=3)
    model_h.reset(0)
    hist = model_h.train(train=task, patience=3, epochs=3, seed=0,
                         init_params=dict(model_h.params), mesh=hier_mesh,
                         spmm="halo")
    hier_loss = float(hist["train_loss"][-1])

    print(json.dumps({"pid": pid, "loss": float(loss),
                      "hier_loss": hier_loss,
                      "devices": n_dev}), flush=True)


if __name__ == "__main__":
    main()
