"""Link-prediction training bench — BASELINE config 4 on TPU (VERDICT r4
item 3).

Times the full LP training epoch at bench scale (the shape every other
headline number uses: 169K nodes / 1.17M positive edges / F=128):

  per epoch: negative sampler (1 pos + 1 neg, interleaved) -> host->device
  batch transfer -> jitted step (APPNP forward, dot-product BPR loss over
  2.33M candidate edges, backward, Keras-Adam update).

Three measurements separate the phases:
  1. sampler-solo cost (C++ hashed rejection sampler, prefetch off);
  2. epoch loop with synchronous sampling (reference structure —
     graph_predictor.py:84-94 samples inside the loss);
  3. epoch loop with prefetch=True (double-buffered background thread;
     sampling for epoch e+1 overlaps the device step of epoch e).

Prints one JSON line; diagnostics to stderr.

Run: python experiments/lp_bench.py [N E F EPOCHS]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    args = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
    N = args[0] if len(args) > 0 else 169_343
    E = args[1] if len(args) > 1 else 1_166_243
    F = args[2] if len(args) > 2 else 128
    EPOCHS = args[3] if len(args) > 3 else 5

    import jax
    import jax.numpy as jnp
    import optax

    import gnntf_tpu as gt
    from gnntf_tpu.data.synthetic import random_power_law_edges
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.ops.hoist import hoisting_jit
    from gnntf_tpu.train.trainer import _total_loss, keras_adam

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # noqa: BLE001
        log(f"no compile cache: {exc!r}")

    log(f"device={jax.devices()[0]} N={N} E={E} F={F}")
    src, dst = random_power_law_edges(N, E, seed=0)
    graph = from_edges(src, dst, n_nodes=N, directed=False)

    # lightweight nx-graph shim for the sampler (nodes + edges + has-edge
    # semantics come from the hashed edge set the sampler builds itself)
    class _G:
        def __iter__(self):
            return iter(range(N))

        def edges(self):
            return zip(src.tolist(), dst.tolist())

    t0 = time.perf_counter()
    pos_edges = list(zip(src.tolist(), dst.tolist()))
    sampler_sync = gt.negative_sampling(pos_edges, _G(), samples=1,
                                        prefetch=False)
    log(f"sampler build {time.perf_counter()-t0:.1f}s "
        f"({len(pos_edges)} positives -> {sampler_sync.edges.shape[0]} "
        f"candidate rows/epoch)")

    # 1. sampler-solo
    sampler_sync()  # warm (hash build)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        sampler_sync()
    t_sample = (time.perf_counter() - t0) / reps
    log(f"sampler-solo: {t_sample*1e3:.1f} ms/epoch")

    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(N, F).astype(np.float32))
    model = gt.APPNP(graph, feats, num_classes=64, iterations=10)
    tx = keras_adam(0.01)
    params = model.init(0)
    opt_state = tx.init(params)

    def run_epochs(task, epochs, params, opt_state, label):
        @hoisting_jit
        def step(params, opt_state, rng_e, batch):
            loss, grads = jax.value_and_grad(
                lambda p: _total_loss(model, task, p, model.features,
                                      rng_e, batch, 5e-4))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        # warm/compile
        task.refresh()
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(0), task.batch())
        _ = float(loss)
        t0 = time.perf_counter()
        for e in range(epochs):
            task.refresh()
            batch = task.batch()
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(e + 1), batch)
            _ = float(loss)
        dt = (time.perf_counter() - t0) / epochs
        log(f"{label}: {dt*1e3:.1f} ms/epoch "
            f"({sampler_sync.edges.shape[0]/dt/1e6:.1f} M scored edges/s)")
        return dt, params, opt_state

    # 2. synchronous sampling in the loop
    task_sync = gt.LinkPrediction(
        gt.negative_sampling(pos_edges, _G(), samples=1, prefetch=False),
        loss="diff")
    t_sync, params, opt_state = run_epochs(task_sync, EPOCHS, params,
                                           opt_state, "epoch (sync sampler)")

    # 3. prefetched sampling (overlaps the device step)
    task_pre = gt.LinkPrediction(
        gt.negative_sampling(pos_edges, _G(), samples=1, prefetch=True),
        loss="diff")
    t_pre, params, opt_state = run_epochs(task_pre, EPOCHS, params,
                                          opt_state, "epoch (prefetch)")

    # 4. device-resident batch: no sampling, no host->device edge
    # transfer — isolates the pure device step (the difference to phase 3
    # is the per-epoch batch upload + dispatch, which on the remote
    # tunnel is a development-environment cost, not a kernel cost)
    import jax as _jax
    task_static = gt.LinkPrediction(np.asarray(task_pre.edges),
                                    labels=np.asarray(task_pre.labels),
                                    loss="diff")
    static_batch = tuple(_jax.device_put(b) if b is not None else None
                         for b in task_static.batch())

    @hoisting_jit
    def step_static(params, opt_state, rng_e):
        loss, grads = jax.value_and_grad(
            lambda p: _total_loss(model, task_static, p, model.features,
                                  rng_e, static_batch, 5e-4))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params, opt_state, loss = step_static(params, opt_state,
                                          jax.random.PRNGKey(0))
    _ = float(loss)
    t0 = time.perf_counter()
    for e in range(EPOCHS):
        params, opt_state, loss = step_static(params, opt_state,
                                              jax.random.PRNGKey(e + 1))
        _ = float(loss)
    t_step = (time.perf_counter() - t0) / EPOCHS
    log(f"device step only (static batch): {t_step*1e3:.1f} ms/epoch")

    # 5. fused block: the trainer's sampled-task scan path
    # (Predictor.stack_batches) — the block's batches are pre-drawn on
    # host, uploaded once, and scanned over on device; per-epoch host
    # round-trips amortize over the block
    task_blk = gt.LinkPrediction(
        gt.negative_sampling(pos_edges, _G(), samples=1, prefetch=True),
        loss="diff")

    @hoisting_jit
    def run_block(params, opt_state, rngs, stack):
        def body(carry, inp):
            params, opt_state = carry
            rng_e, batch = inp
            loss, grads = jax.value_and_grad(
                lambda p: _total_loss(model, task_blk, p, model.features,
                                      rng_e, batch, 5e-4))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (rngs, stack))
        return params, opt_state, losses[-1]

    stack = task_blk.stack_batches(EPOCHS)
    rngs = jax.random.split(jax.random.PRNGKey(0), EPOCHS)
    params, opt_state, l = run_block(params, opt_state, rngs, stack)
    _ = float(l)
    t0 = time.perf_counter()
    stack = task_blk.stack_batches(EPOCHS)
    rngs = jax.random.split(jax.random.PRNGKey(1), EPOCHS)
    params, opt_state, l = run_block(params, opt_state, rngs, stack)
    _ = float(l)
    t_blk = (time.perf_counter() - t0) / EPOCHS
    log(f"fused block ({EPOCHS} epochs/dispatch, incl. stacked sampling "
        f"+ one upload): {t_blk*1e3:.1f} ms/epoch")

    n_rows = int(sampler_sync.edges.shape[0])
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "lp_train_epoch",
        "n_nodes": N, "positives": len(pos_edges), "candidate_rows": n_rows,
        "features": F,
        "sampler_ms": round(t_sample * 1e3, 2),
        "epoch_sync_ms": round(t_sync * 1e3, 2),
        "epoch_prefetch_ms": round(t_pre * 1e3, 2),
        "device_step_ms": round(t_step * 1e3, 2),
        "fused_block_ms": round(t_blk * 1e3, 2),
        "overlap_gain_ms": round((t_sync - t_pre) * 1e3, 2),
        "scored_edges_per_s": round(n_rows / t_pre),
        "backend": getattr(dev, "platform", "unknown"),
        "device_kind": getattr(dev, "device_kind", "unknown"),
    }), flush=True)


if __name__ == "__main__":
    main()
