"""SpMM + train-step roofline harness (BASELINE north star: fraction of
the bandwidth bound achieved per chip).

Measures the auto-dispatched SpMM on an ogbn-arxiv-scale synthetic graph,
amortizing dispatch with a fori_loop chain and ending with a real device
fetch (see documentation/performance.md on measurement discipline), then
reports the achieved fraction of the HBM-bandwidth bound under the
minimal-traffic model (one random source-row read per edge + one output
write).

With ``--train`` it additionally measures the FULL training epoch
(forward with per-layer edge dropout + renormalization, backward, Adam
update, clean eval forward + valid loss — the reference's exact per-epoch
work, trainable.py:63-84) for APPNP, GCN and GAT, and reports each
model's achieved fraction of its gather-bound ceiling: per epoch a model
with L propagation layers does the train forward (L SpMMs), the backward
dx path (L transpose SpMMs), and the clean eval forward (L SpMMs) — the
ceiling is 3L times the measured per-SpMM time of the auto dispatch.

Run: python experiments/roofline.py [n_nodes n_edges features iters] [--train]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gnntf_tpu.data.synthetic import random_power_law_edges
from gnntf_tpu.graph import from_edges
from gnntf_tpu.ops import normalize_adjacency
from gnntf_tpu.ops.hoist import hoisting_jit
from gnntf_tpu.ops.spmm import spmm
from gnntf_tpu.utils import roofline

TRAIN = "--train" in sys.argv
REMAT = "--remat" in sys.argv  # layer-wise checkpointing (GCNII-64 HBM)
args = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
N = args[0] if len(args) > 0 else 169_343
E = args[1] if len(args) > 1 else 1_166_243
F = args[2] if len(args) > 2 else 128
K = args[3] if len(args) > 3 else 50

src, dst = random_power_law_edges(N, E, seed=0)
g = from_edges(src, dst, n_nodes=N, directed=False)
import dataclasses
from gnntf_tpu.ops import prepare_spmm
normed = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(g)
normed = dataclasses.replace(normed, row=g.row, col=g.col)
prepared = prepare_spmm(normed)
x = jnp.asarray(np.random.RandomState(1).randn(N, F), jnp.float32)


# value routing prepared eagerly outside jit (fixed adjacency — the
# inference shape); chained timed calls feed the previous output back in.
# hoisting_jit: the prepared routing state enters as parameters, not
# multi-hundred-MB HLO literals (ops/hoist.py)
@hoisting_jit
def chain(h):
    return jax.lax.fori_loop(0, K, lambda i, h: prepared(h), h)


h = chain(x)
_ = float(jnp.sum(h))  # compile + warm
t0 = time.perf_counter()
h = chain(h)
_ = float(jnp.sum(h))
per_iter = (time.perf_counter() - t0) / K

# canonical metric pair (documentation/performance.md): counted edges/s
# is the headline; the HBM bound is per UNIQUE pair (coalesced duplicates
# never touch HBM)
_pairs = np.unique(np.stack([np.asarray(g.row), np.asarray(g.col)], 1),
                   axis=0)
e_unique = int(_pairs.shape[0])
r = roofline(e_unique, F, per_iter)
print(f"device: {jax.devices()[0]}")
print(f"graph: {N} nodes, {g.n_edges} counted edges "
      f"({e_unique} unique pairs), F={F}")
print(f"SpMM: {per_iter*1e3:.2f} ms/iter, "
      f"{g.n_edges/per_iter/1e6:.1f} M counted edges/s "
      f"({r['edges_per_s']/1e6:.1f} M unique)")
print(f"traffic model (unique-pair reads): {r['bytes_moved']/1e9:.2f} GB "
      f"-> bound {r['bound_s']*1e3:.2f} ms")
print(f"roofline fraction: {r['achieved_fraction']*100:.1f}%")


def train_epoch_report(per_spmm_s):
    """Full-train-epoch timing per model + achieved fraction of the
    model's gather-bound ceiling (docstring)."""
    import optax

    import gnntf_tpu as gt
    from gnntf_tpu.train.trainer import _total_loss, keras_adam

    rng = np.random.RandomState(2)
    n_classes = 40
    feats = jnp.asarray(rng.randn(N, F), jnp.float32)
    tr = rng.choice(N, max(N // 2, 1), replace=False)
    labels = rng.randint(0, n_classes, tr.shape[0])
    task = gt.NodeClassification(tr, labels)
    batch = task.batch()

    models = {
        "APPNP": lambda: gt.APPNP(g, feats, num_classes=n_classes,
                                  iterations=10),
        "GCN": lambda: gt.GCN(g, feats, num_classes=n_classes),
        "GCNII-64": lambda: gt.GCNII(g, feats, num_classes=n_classes,
                                     iterations=64),
        "GAT": lambda: gt.GAT(g, feats, num_classes=n_classes),
        "SAGE": lambda: gt.GraphSAGE(g, feats, num_classes=n_classes),
        "GIN": lambda: gt.GIN(g, feats, num_classes=n_classes),
    }
    # propagation layers per epoch phase (train fwd / bwd dx / eval fwd)
    spmm_layers = {"APPNP": 10, "GCN": 2, "GCNII-64": 64, "GAT": 2,
                   "SAGE": 2, "GIN": 2}
    only = os.environ.get("GNNTF_ROOFLINE_MODELS")
    if only:
        keep = {m.strip() for m in only.split(",")}
        models = {k: v for k, v in models.items() if k in keep}

    print("\nfull train epoch (fwd+bwd+Adam+clean eval, reference "
          "trainable.py:63-84):")
    for name, make in models.items():
        model = make()
        tx = keras_adam(0.01)
        params = model.init(0)
        opt_state = tx.init(params)

        def epoch_body(carry, rng_e):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda p: _total_loss(model, task, p, model.features, rng_e,
                                      batch, 5e-4, remat=REMAT))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acts = model.apply(params, model.features, training=False)
            vloss = task.loss(acts, batch, params=params)
            return (params, opt_state), (loss, vloss)

        KE = 5

        @hoisting_jit
        def run(params, opt_state, rngs):
            (params, opt_state), (losses, vlosses) = jax.lax.scan(
                epoch_body, (params, opt_state), rngs)
            return params, opt_state, losses[-1] + vlosses[-1]

        rngs = jax.random.split(jax.random.PRNGKey(0), KE)
        params, opt_state, l = run(params, opt_state, rngs)
        _ = float(l)
        best = float("inf")
        for rep in range(1, 3):
            rngs = jax.random.split(jax.random.PRNGKey(rep), KE)
            t0 = time.perf_counter()
            params, opt_state, l = run(params, opt_state, rngs)
            _ = float(l)
            best = min(best, (time.perf_counter() - t0) / KE)
        L = spmm_layers[name]
        ceiling = 3 * L * per_spmm_s
        frac = ceiling / best
        eps = g.n_edges * L / best
        print(f"  {name:6s} {best*1e3:8.1f} ms/epoch  "
              f"{eps/1e6:8.1f} M train-edges/s  "
              f"gather-ceiling {ceiling*1e3:6.1f} ms -> "
              f"{frac*100:5.1f}% of ceiling")


if TRAIN:
    train_epoch_report(per_iter)
