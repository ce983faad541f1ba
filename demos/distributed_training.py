"""Multi-chip training demo (no reference counterpart — the reference is
single-device eager TF, SURVEY §2.4): shard the edge list over an
(edge, feat) device mesh and run the full jitted train step under GSPMD.

On a single-host CPU run, simulate 8 devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python demos/distributed_training.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gnntf_tpu as gnntf
from gnntf_tpu.data import dgl_setup
from gnntf_tpu.parallel import (make_distributed_eval,
                                make_distributed_train_step, make_mesh,
                                place_state, shard_graph)
from gnntf_tpu.train.trainer import keras_adam

G, labels, features, train, valid, test = dgl_setup("cora")
gnntf.set_seed(0)

n_dev = len(jax.devices())
n_feat = 2 if n_dev % 2 == 0 and n_dev >= 4 else 1
mesh = make_mesh(n_dev // n_feat, n_feat)
print(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

adj = gnntf.graph2adj(G)
model = gnntf.APPNP(adj, features, num_classes=len(set(labels)))
task = gnntf.NodeClassification(train, labels[train])
valid_task = gnntf.NodeClassification(valid, labels[valid])

tx = keras_adam(0.01)
params = model.init(0)
opt_state = tx.init(params)
sharded = shard_graph(adj, mesh)
params, feats = place_state(model, mesh, params)
step = make_distributed_train_step(model, task, mesh, tx, sharded)
eval_fn = make_distributed_eval(model, mesh, sharded)

for epoch in range(50):
    rng = jax.random.fold_in(jax.random.PRNGKey(0), epoch)
    params, opt_state, loss = step(params, opt_state, rng,
                                   jnp.float32(1.0), feats, sharded,
                                   task.batch())

acts = eval_fn(params, feats, sharded)
test_task = gnntf.NodeClassification(test)
pred = test_task.predict(acts, test_task.batch())
print("test accuracy:", gnntf.acc(np.asarray(pred), labels[test]))

# --- or: the one-liner — the full patience trainer, distributed ----------
model2 = gnntf.APPNP(adj, features, num_classes=len(set(labels)))
model2.train(train=task, valid=valid_task, patience=50, epochs=300, seed=0,
             mesh=mesh)
pred2 = model2.predict(test_task)
print("test accuracy (fit with mesh=):",
      gnntf.acc(np.asarray(pred2), labels[test]))
