"""Headline benchmark: SpMM propagation + full-train-step throughput.

Measures, on an ogbn-arxiv-scale synthetic graph (169K nodes, ~2.3M
symmetrized edges, 128 features), jitted end-to-end on one chip:

1. the framework's hot op — 10-step APPNP-style personalized-PageRank
   propagation (the reference's tf.sparse.sparse_dense_matmul loop,
   filter.py:17-22), dropout off;
2. the full training epoch — APPNP forward with per-layer edge dropout +
   renormalization, backward, Keras-Adam update, plus the clean validation
   forward + loss (exactly the reference's per-epoch work,
   trainable.py:63-84).

Baseline for ``vs_baseline``: the reference implementation's own hot op /
train epoch (CPU eager TF — the only hardware the pure-Python reference
supports) on the same graph.  Falls back to recorded constants if TF is
unavailable (the eager train epoch costs ~87s, so it is only re-measured
when GNNTF_BENCH_TF_TRAIN=1).

Robustness (the remote-TPU tunnel has been observed to wedge — BENCH_r02):
the JAX measurements run in a **fresh child process per attempt**, retried
up to GNNTF_BENCH_ATTEMPTS (default 3) times with a per-attempt timeout,
so a wedged tunnel cannot poison the next try.  Every metric in the JSON
line is annotated with the ``backend`` that produced it; if every TPU
attempt fails the line carries ``"backend": "cpu-fallback"`` plus the
last-known-good TPU measurement from ``bench_tpu_provenance.json``
(committed whenever a TPU run succeeds) as a separate provenance field.

Prints ONE JSON line to stdout (extra keys carry the train-step metric and
provenance); diagnostics to stderr.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

N_NODES = 169_343
N_EDGES = 1_166_243
N_FEATURES = 128
ITERATIONS = 10
ALPHA = 0.1
# Recorded TF-CPU reference throughput on this container (edges/s through
# the same 10-step propagation); refreshed whenever TF is importable.
# Measured 2026-08-18: 6671 ms / 10 iters on 2.33M edges -> 3.5 M edges/s.
FALLBACK_TF_EDGES_PER_S = 3.5e6
# Reference full train epoch (APPNP defaults, eager CPU, includes the clean
# validation forward).  Measured 2026-08-18: 87.1 s/epoch at this scale ->
# E*ITERATIONS/dt = 0.27 M propagation-edges/s.  Re-measured only when
# GNNTF_BENCH_TF_TRAIN=1 (each epoch costs ~87s).
FALLBACK_TF_TRAIN_EDGES_PER_S = 0.27e6
N_CLASSES = 40
N_TRAIN = 90_941  # ogbn-arxiv train split size

PROVENANCE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_tpu_provenance.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_graph():
    from gnntf_tpu.data.synthetic import random_power_law_edges
    src, dst = random_power_law_edges(N_NODES, N_EDGES, seed=0)
    return src, dst


def _setup_jax_cache():
    """Persistent compilation cache: the remote-compile (axon) backend has
    been observed to take minutes per cold compile (BENCH_r02's 'hang' was
    compile time, not execution — root-caused round 3); with the on-disk
    cache a retried attempt or the driver's run hits warm entries."""
    import jax
    cache_dir = os.environ.get(
        "GNNTF_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # noqa: BLE001 — cache is an optimization only
        log(f"compilation cache unavailable: {exc!r}")


def bench_jax(src, dst):
    import dataclasses
    import jax
    import jax.numpy as jnp
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.ops import normalize_adjacency, prepare_spmm
    from gnntf_tpu.ops.hoist import hoisting_jit

    graph = from_edges(src, dst, n_nodes=N_NODES, directed=False)
    e_total = graph.n_edges
    # canonical metric pair (one perf story across README/performance.md/
    # BENCH artifacts): counted edges/s — the reference's work definition,
    # every stored entry incl. symmetrization duplicates — AND unique
    # (row, col) pairs/s, the physical gather traffic after coalescing.
    pairs = np.unique(np.stack([np.asarray(graph.row),
                                np.asarray(graph.col)], 1), axis=0)
    e_unique = int(pairs.shape[0])
    log(f"graph: {N_NODES} nodes, {e_total} symmetrized edges "
        f"({e_unique} unique pairs), device={jax.devices()[0]}")

    x0 = jnp.asarray(
        np.random.RandomState(1).randn(N_NODES, N_FEATURES), jnp.float32)
    normed = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(graph)
    # normalization leaves the structure unchanged (no self-loops here);
    # reattach the host-side row/col so layout builders (ELL/hybrid) work on
    # numpy instead of fetching 2.3M indices back through the device tunnel
    # (measured 169s device->host vs 0.7s host-side, round 3)
    normed = dataclasses.replace(normed, row=graph.row, col=graph.col)
    # value routing prepared ONCE, eagerly, outside jit (the adjacency is
    # fixed for the whole propagation — the inference/serving shape): the
    # jitted loop is pure gather/k-reduce/MXU-matmul/combine, with no
    # E-sized constant chains for XLA to fold at compile time
    # (documentation/performance.md, r02/r03 root cause)
    prepared = prepare_spmm(normed)

    # Timed chain length: long enough that the per-call fixed cost (jit
    # dispatch + device->host fetch through the remote tunnel, measured
    # ~30 ms — a development-environment artifact, not kernel cost)
    # amortizes to <2%: at 3.7 ms/SpMM, 50 iterations are ~185 ms of real
    # kernel time per fetch.  Cross-checked against the K=10 program:
    # (50t+o) - (10t+o) recovers the same per-iteration t.
    K_TIMED = 50

    # All ITERATIONS chained inside ONE jitted call (lax.fori_loop) so the
    # measurement amortizes dispatch/tunnel RTT, and the timed section ends
    # with an actual device->host value fetch: on the remote-TPU (axon)
    # backend block_until_ready() returns before execution completes, so a
    # fetch is the only honest completion barrier.  hoisting_jit: the
    # prepared routing state (ELL value grid + dense hub slice, >100 MB)
    # enters as parameters, not HLO literals — the program is pure code
    # and compiles in seconds (ops/hoist.py; r03 root cause).
    @hoisting_jit
    def propagate(h0):
        def body(_, h):
            return (1.0 - ALPHA) * prepared(h) + ALPHA * h0
        return jax.lax.fori_loop(0, K_TIMED, body, h0)

    _ = float(jnp.sum(propagate(x0)))  # compile+warm
    # Chain reps through a data dependency (h feeds back in) so no two timed
    # executions have identical inputs — a remote backend that memoizes
    # (executable, inputs) pairs cannot serve a rep from cache — and end each
    # rep with a full-output reduction fetched to host, which cannot complete
    # before every element of the propagation result exists.
    reps = 3
    times = []
    h = x0
    for _ in range(reps):
        t0 = time.perf_counter()
        h = propagate(h)
        _ = float(jnp.sum(h))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    edges_per_s = e_total * K_TIMED / dt
    unique_edges_per_s = e_unique * K_TIMED / dt
    log(f"jax propagation: {dt*1000:.1f} ms / {K_TIMED} iters -> "
        f"{edges_per_s/1e6:.1f} M counted edges/s "
        f"({unique_edges_per_s/1e6:.1f} M unique)")
    # plausibility guard: above the single-chip HBM bound the measurement
    # (not the kernel) is wrong; flag loudly in the diagnostics.  The
    # guard uses UNIQUE pairs — the same denominator as performance.md's
    # roofline section — since duplicate-coalesced entries never touch HBM
    # (bandwidth by detected device kind; unknown kinds use the v5e figure).
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    hbm_bw = {"v4": 1.2e12, "v5p": 2.76e12, "v6e": 1.6e12}.get(
        next((k for k in ("v6e", "v5p", "v4") if k in kind), None), 8.19e11)
    hbm_bound = hbm_bw / (N_FEATURES * 4 * 2)  # read+write per unique edge
    if unique_edges_per_s > hbm_bound:
        log(f"WARNING: measured {unique_edges_per_s:.3g} unique-edges/s "
            f"exceeds the HBM roofline bound {hbm_bound:.3g}; timing is "
            f"not trustworthy")
    return edges_per_s, e_total, unique_edges_per_s


def bench_jax_train(src, dst):
    """Full APPNP training epoch, jitted: forward with per-layer edge
    dropout + renormalization, backward, Keras-Adam update, clean eval
    forward + validation loss (the reference's exact per-epoch work)."""
    import jax
    import jax.numpy as jnp
    import gnntf_tpu as gt
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.ops.hoist import hoisting_jit
    from gnntf_tpu.train.trainer import _total_loss, keras_adam
    import optax

    graph = from_edges(src, dst, n_nodes=N_NODES, directed=False)
    e_total = graph.n_edges
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(N_NODES, N_FEATURES), jnp.float32)
    model = gt.APPNP(graph, x, num_classes=N_CLASSES, iterations=ITERATIONS)
    tr = rng.choice(N_NODES, N_TRAIN, replace=False)
    labels = rng.randint(0, N_CLASSES, N_TRAIN)
    task = gt.NodeClassification(tr, labels)
    batch = task.batch()

    tx = keras_adam(0.01)
    params = model.init(0)
    opt_state = tx.init(params)

    def epoch_body(carry, rng_e):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda p: _total_loss(model, task, p, model.features, rng_e,
                                  batch, 5e-4))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acts = model.apply(params, model.features, training=False)
        vloss = task.loss(acts, batch, params=params)
        return (params, opt_state), (loss, vloss)

    K = 5  # epochs fused per dispatch (amortizes tunnel RTT)

    # hoisting_jit: TrainGrids / layout routing / features enter as
    # parameters — without this the program embeds ~45 MB of literals and
    # remote compile nondeterministically exceeds the driver budget
    # (BENCH_r03 "constant folding" tail; ops/hoist.py)
    @hoisting_jit
    def run(params, opt_state, rngs):
        (params, opt_state), (losses, vlosses) = jax.lax.scan(
            epoch_body, (params, opt_state), rngs)
        return params, opt_state, losses[-1] + vlosses[-1]

    rngs0 = jax.random.split(jax.random.PRNGKey(0), K)
    params, opt_state, l = run(params, opt_state, rngs0)
    _ = float(l)  # compile+warm, honest completion barrier
    times = []
    for rep in range(1, 4):
        rngs = jax.random.split(jax.random.PRNGKey(rep), K)
        t0 = time.perf_counter()
        params, opt_state, l = run(params, opt_state, rngs)
        _ = float(l)
        times.append(time.perf_counter() - t0)
    dt = min(times) / K
    eps = e_total * ITERATIONS / dt
    log(f"jax train epoch: {dt*1000:.1f} ms -> {eps/1e6:.1f} M "
        f"propagation-edges/s ({1/dt:.2f} epochs/s)")
    return eps


def bench_tf_train(src, dst):
    """The reference's own full train epoch (eager CPU), same per-epoch
    work.  Gated behind GNNTF_BENCH_TF_TRAIN=1 (costs ~90s/epoch)."""
    if os.environ.get("GNNTF_BENCH_TF_TRAIN") != "1":
        return None
    try:
        import sys as _sys
        _sys.path.insert(0, "/root/reference")
        import tensorflow as tf
        import gnntf as ref
    except ImportError:
        return None
    try:
        with tf.device("/cpu:0"):
            indices = np.stack([np.concatenate([src, dst]),
                                np.concatenate([dst, src])], axis=1)
            order = np.lexsort((indices[:, 1], indices[:, 0]))
            indices = indices[order]
            A = tf.sparse.SparseTensor(
                indices, np.ones(indices.shape[0], np.float32), (N_NODES,) * 2)
            x = tf.constant(np.random.RandomState(2).randn(
                N_NODES, N_FEATURES), tf.float32)
            model = ref.APPNP(A, x, num_classes=N_CLASSES,
                              iterations=ITERATIONS)
            rng = np.random.RandomState(2)
            tr = rng.choice(N_NODES, N_TRAIN, replace=False)
            labels = rng.randint(0, N_CLASSES, N_TRAIN)
            t0 = time.perf_counter()
            model.train(train=ref.NodeClassification(tr, labels), epochs=1,
                        patience=10 ** 9)
            dt = time.perf_counter() - t0
        e_total = indices.shape[0]
        eps = e_total * ITERATIONS / dt
        log(f"tf-cpu reference train epoch: {dt:.1f}s -> {eps/1e6:.2f} M "
            f"propagation-edges/s")
        return eps
    except Exception as exc:  # noqa: BLE001
        log(f"tf train baseline failed: {exc!r}")
        return None


def bench_tf(src, dst):
    """The reference's own hot-op loop on CPU (its only supported device)."""
    try:
        import tensorflow as tf
    except ImportError:
        return None
    try:
        with tf.device("/cpu:0"):
            indices = np.stack([np.concatenate([src, dst]),
                                np.concatenate([dst, src])], axis=1)
            order = np.lexsort((indices[:, 1], indices[:, 0]))
            indices = indices[order]
            values = np.ones(indices.shape[0], np.float32)
            A = tf.sparse.SparseTensor(indices, values, (N_NODES, N_NODES))
            # symmetric normalization as in gnn.py:40-42
            D = tf.math.divide_no_nan(
                1.0, tf.sqrt(tf.sparse.reduce_sum(A, axis=0)))
            A = tf.reshape(D, (-1, 1)) * A * D
            x0 = tf.constant(
                np.random.RandomState(1).randn(N_NODES, N_FEATURES),
                tf.float32)
            h = x0
            t0 = time.perf_counter()
            for _ in range(ITERATIONS):
                h = (1 - ALPHA) * tf.sparse.sparse_dense_matmul(A, h) \
                    + ALPHA * x0
            _ = h.numpy()
            dt = time.perf_counter() - t0
        e_total = indices.shape[0]
        edges_per_s = e_total * ITERATIONS / dt
        log(f"tf-cpu reference: {dt*1000:.1f} ms / 10 iters -> "
            f"{edges_per_s/1e6:.1f} M edges/s")
        return edges_per_s
    except Exception as exc:  # noqa: BLE001 — bench must not die on TF quirks
        log(f"tf baseline failed: {exc!r}")
        return None


def _child_main(phase: str):
    """Run ONE JAX measurement phase in-process and print a
    machine-readable result line.  Invoked in a fresh subprocess per
    attempt (the parent enforces the timeout and retries) so a wedged TPU
    tunnel in one attempt cannot poison the next; phases are separate
    child invocations so a train-step compile overrun cannot discard an
    already-measured propagation number (the r02 failure mode)."""
    _setup_jax_cache()
    import jax

    dev = jax.devices()[0]
    backend = getattr(dev, "platform", "unknown")
    kind = getattr(dev, "device_kind", backend)
    src, dst = build_graph()
    result = {"backend": backend, "device_kind": kind}
    if phase == "prop":
        eps, _, ueps = bench_jax(src, dst)
        result["unique_edges_per_s"] = round(ueps)
    else:
        eps = bench_jax_train(src, dst)
    result["edges_per_s"] = eps
    print("CHILD_RESULT " + json.dumps(result), flush=True)


def _run_child(phase: str, timeout_s: int, force_cpu: bool):
    env = dict(os.environ)
    if force_cpu:
        env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"})
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", phase],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True, env=env,
        start_new_session=True)
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()  # exact child PID — never kill by pattern
        proc.wait()
        return None, "timeout"
    if proc.returncode != 0:
        return None, f"exit={proc.returncode}"
    for line in (out or "").splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):]), None
    return None, "no-result-line"


def _measure_phase(phase: str, attempts: int, timeout_s: int,
                   cpu_fallback: bool):
    """Fresh-process TPU attempts with retry for one phase, then an
    optional CPU fallback.  Returns the child-result dict
    (backend-annotated) or None."""
    for i in range(attempts):
        log(f"[{phase}] attempt {i + 1}/{attempts} (timeout {timeout_s}s)")
        result, err = _run_child(phase, timeout_s, force_cpu=False)
        if result is not None:
            return result
        log(f"[{phase}] attempt {i + 1} failed: {err}")
    if not cpu_fallback:
        return None
    log(f"[{phase}] all TPU attempts failed; measuring on CPU "
        f"(cpu-fallback)")
    result, err = _run_child(phase, timeout_s, force_cpu=True)
    if result is None:
        log(f"[{phase}] cpu fallback failed too: {err}")
        return None
    result["backend"] = "cpu-fallback"
    return result


def _load_provenance():
    try:
        with open(PROVENANCE_PATH) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _store_provenance(prop, train):
    rec = _load_provenance() or {}
    if prop is not None:
        rec.update({"date": time.strftime("%Y-%m-%d"),
                    "device_kind": prop.get("device_kind"),
                    "edges_per_s": round(prop["edges_per_s"])})
    if train is not None:
        rec.update({"train_date": time.strftime("%Y-%m-%d"),
                    "train_edges_per_s": round(train["edges_per_s"])})
    try:
        with open(PROVENANCE_PATH, "w") as fh:
            json.dump(rec, fh)
            fh.write("\n")
    except OSError as exc:
        log(f"could not store provenance: {exc!r}")


def _is_tpu(result):
    return result is not None and result["backend"] not in ("cpu",
                                                            "cpu-fallback")


def main():
    if "--child" in sys.argv:
        _child_main(sys.argv[sys.argv.index("--child") + 1])
        return
    attempts = int(os.environ.get("GNNTF_BENCH_ATTEMPTS", "3"))
    timeout_s = int(os.environ.get("GNNTF_BENCH_TIMEOUT_S", "420"))
    prop = _measure_phase("prop", attempts, timeout_s, cpu_fallback=True)
    if prop is None:
        raise RuntimeError("propagation bench failed on every backend")
    # the train phase gets fewer attempts (its compile is the biggest
    # program in the repo; each timed-out attempt also leaves the shared
    # remote compile service busy) and no result is preferable to an
    # unlabeled bogus one — provenance records the last good TPU number
    train = _measure_phase("train", max(1, attempts - 1), timeout_s,
                           cpu_fallback=True)
    _store_provenance(prop if _is_tpu(prop) else None,
                      train if _is_tpu(train) else None)
    src, dst = build_graph()
    tf_eps = bench_tf(src, dst)
    baseline = tf_eps if tf_eps else FALLBACK_TF_EDGES_PER_S
    tf_train_eps = bench_tf_train(src, dst)
    result = {
        "metric": "spmm_propagation_edges_per_s_per_chip",
        "value": round(prop["edges_per_s"]),
        "unit": "edges/s",
        "vs_baseline": round(prop["edges_per_s"] / baseline, 3),
        "backend": prop["backend"],
        "device_kind": prop.get("device_kind"),
        "baseline_backend": "tf-cpu-measured" if tf_eps
        else "tf-cpu-recorded-2026-08-18",
    }
    if prop.get("unique_edges_per_s"):
        # counted edges (the reference's work definition) is the headline;
        # unique (row, col) pairs/s is the physical-gather companion the
        # roofline analysis uses (documentation/performance.md)
        result["unique_edges_per_s"] = round(prop["unique_edges_per_s"])
    if train is not None:
        result["train_epoch_edges_per_s"] = round(train["edges_per_s"])
        result["train_backend"] = train["backend"]
        result["train_vs_baseline"] = round(
            train["edges_per_s"]
            / (tf_train_eps or FALLBACK_TF_TRAIN_EDGES_PER_S), 3)
        result["train_baseline_backend"] = ("tf-cpu-measured" if tf_train_eps
                                            else "tf-cpu-recorded-2026-08-18")
    if not _is_tpu(prop) or not _is_tpu(train):
        prov = _load_provenance()
        if prov:
            result["last_good_tpu"] = prov
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
