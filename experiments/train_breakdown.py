"""Where does the training epoch go?  Per-phase timing of the bench-scale
APPNP train epoch (the driver's second headline metric, bench.py).

Phases measured separately, each as ONE jitted program ending in a real
device->host fetch (StepTimer discipline, documentation/performance.md):

  prop-prepared   10-iteration propagation, PreparedSpMM (routing eager)
  fwd-train       training forward + total loss (per-layer edge dropout +
                  lazy renorm + live-value hybrid SpMM), no backward
  fwd-bwd         value_and_grad of the same loss
  step            fwd+bwd+Keras-Adam update
  eval            clean forward + validation loss (dropout off)
  epoch           the full bench epoch body (step + eval), K=1

The deltas attribute the cost: (fwd-train - prop-ish) = dropout +
renormalization + per-layer value routing; (fwd-bwd - fwd-train) = the
backward pass (whose SpMM transpose XLA implements as an F-wide row
*scatter* unless given a better adjoint); (epoch - step - eval) = overhead.

Reference stake: the reference's hot loop is the train epoch
(gnntf/core/nn/trainable.py:63-84); this harness decides what to optimize
next rather than guessing.

Usage:  python experiments/train_breakdown.py [--impl hybrid] [--reps 3]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NODES = 169_343
N_EDGES = 1_166_243
N_FEATURES = 128
ITERATIONS = 10
N_CLASSES = 40
N_TRAIN = 90_941


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default=None,
                    choices=[None, "segment", "ell", "hybrid", "pallas"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--nodes", type=int, default=N_NODES)
    ap.add_argument("--edges", type=int, default=N_EDGES)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import gnntf_tpu as gt
    from gnntf_tpu.data.synthetic import random_power_law_edges
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.ops import normalize_adjacency, prepare_spmm
    from gnntf_tpu.ops.spmm import spmm_impl
    from gnntf_tpu.train.trainer import _total_loss, keras_adam

    src, dst = random_power_law_edges(args.nodes, args.edges, seed=0)
    graph = from_edges(src, dst, n_nodes=args.nodes, directed=False)
    e_total = graph.n_edges
    print(f"graph: {args.nodes} nodes, {e_total} edges, "
          f"device={jax.devices()[0]}", file=sys.stderr)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(args.nodes, N_FEATURES), jnp.float32)
    model = gt.APPNP(graph, x, num_classes=N_CLASSES, iterations=ITERATIONS)
    tr = rng.choice(args.nodes, min(N_TRAIN, args.nodes), replace=False)
    labels = rng.randint(0, N_CLASSES, tr.shape[0])
    task = gt.NodeClassification(tr, labels)
    batch = task.batch()
    tx = keras_adam(0.01)
    params = model.init(0)
    opt_state = tx.init(params)
    rng_e = jax.random.PRNGKey(7)

    scope = spmm_impl(args.impl) if args.impl else None

    def timed(name, fn, *a):
        if scope:
            scope.__enter__()
        try:
            out = fn(*a)  # compile+warm
            _ = float(jax.tree_util.tree_reduce(
                lambda acc, l: acc + jnp.sum(jnp.abs(l).astype(jnp.float32)),
                out, jnp.zeros([], jnp.float32)))
            times = []
            for _i in range(args.reps):
                t0 = time.perf_counter()
                out = fn(*a)
                _ = float(jax.tree_util.tree_reduce(
                    lambda acc, l: acc
                    + jnp.sum(jnp.abs(l).astype(jnp.float32)),
                    out, jnp.zeros([], jnp.float32)))
                times.append(time.perf_counter() - t0)
            dt = min(times)
        finally:
            if scope:
                scope.__exit__(None, None, None)
        print(f"{name:14s} {dt*1000:8.1f} ms   "
              f"({e_total*ITERATIONS/dt/1e6:7.1f} M prop-edges/s)", flush=True)
        return dt

    # --- prop (prepared) --------------------------------------------------
    import dataclasses
    normed = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(
        graph)
    normed = dataclasses.replace(normed, row=graph.row, col=graph.col)
    prepared = prepare_spmm(normed)

    @partial_jit
    def prop(h0):
        def body(_, h):
            return 0.9 * prepared(h) + 0.1 * h0
        return jax.lax.fori_loop(0, ITERATIONS, body, h0)

    loss_fn = lambda p, r: _total_loss(model, task, p, model.features, r,
                                       batch, 5e-4)

    from gnntf_tpu.ops.hoist import hoisting_jit

    @hoisting_jit
    def fwd(p, r):
        return loss_fn(p, r)

    @hoisting_jit
    def fwd_bwd(p, r):
        return jax.value_and_grad(loss_fn)(p, r)

    @hoisting_jit
    def step(p, s, r):
        loss, grads = jax.value_and_grad(loss_fn)(p, r)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    @hoisting_jit
    def evalf(p):
        acts = model.apply(p, model.features, training=False)
        return task.loss(acts, batch, params=p)

    @hoisting_jit
    def epoch(p, s, r):
        loss, grads = jax.value_and_grad(loss_fn)(p, r)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        acts = model.apply(p, model.features, training=False)
        return p, s, loss + task.loss(acts, batch, params=p)

    t_prop = timed("prop-prepared", prop, x)
    t_fwd = timed("fwd-train", fwd, params, rng_e)
    t_fb = timed("fwd-bwd", fwd_bwd, params, rng_e)
    t_step = timed("step", step, params, opt_state, rng_e)
    t_eval = timed("eval", evalf, params)
    t_epoch = timed("epoch", epoch, params, opt_state, rng_e)

    print(f"\nattribution (ms):")
    print(f"  propagation (prepared, 10 it)        {t_prop*1e3:8.1f}")
    print(f"  fwd extra (dropout+renorm+routing)   {(t_fwd-t_prop)*1e3:8.1f}")
    print(f"  backward pass                        {(t_fb-t_fwd)*1e3:8.1f}")
    print(f"  adam update                          {(t_step-t_fb)*1e3:8.1f}")
    print(f"  eval forward                         {t_eval*1e3:8.1f}")
    print(f"  epoch total                          {t_epoch*1e3:8.1f}")
    print(f"  (step + eval) - epoch                "
          f"{(t_step+t_eval-t_epoch)*1e3:8.1f}")


def partial_jit(fn):
    from gnntf_tpu.ops.hoist import hoisting_jit
    return hoisting_jit(fn)


if __name__ == "__main__":
    main()
