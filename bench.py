"""Headline benchmark: SpMM propagation throughput (edges/s/chip).

Measures the framework's hot op — 10-step APPNP-style personalized-PageRank
propagation (the reference's tf.sparse.sparse_dense_matmul loop,
filter.py:17-22) — on an ogbn-arxiv-scale synthetic graph (169K nodes,
~2.3M symmetrized edges, 128 features), jitted end-to-end on one chip.

Baseline for ``vs_baseline``: the reference implementation's own hot op
(tf.sparse.sparse_dense_matmul on CPU — the only hardware the pure-Python
reference supports) on the same graph.  Falls back to a recorded constant if
TF is unavailable.

Prints ONE JSON line to stdout; diagnostics to stderr.
"""
import json
import os
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_graph():
    from gnntf_tpu.data.synthetic import random_power_law_edges
    src, dst = random_power_law_edges(N_NODES, N_EDGES, seed=0)
    return src, dst


def bench_jax(src, dst):
    import jax
    import jax.numpy as jnp
    from functools import partial
    import gnntf_tpu as gt
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.ops import normalize_adjacency, spmm

    graph = from_edges(src, dst, n_nodes=N_NODES, directed=False)
    e_total = graph.n_edges
    log(f"graph: {N_NODES} nodes, {e_total} symmetrized edges, "
        f"device={jax.devices()[0]}")

    x0 = jnp.asarray(
        np.random.RandomState(1).randn(N_NODES, N_FEATURES), jnp.float32)
    normed = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(graph)

    # All ITERATIONS chained inside ONE jitted call (lax.fori_loop) so the
    # measurement amortizes dispatch/tunnel RTT, and the timed section ends
    # with an actual device->host value fetch: on the remote-TPU (axon)
    # backend block_until_ready() returns before execution completes, so a
    # fetch is the only honest completion barrier.  The graph is closed over
    # (a trace constant), the framework's idiomatic pattern — this lets the
    # auto SpMM dispatcher select the row-split ELL formulation.
    @partial(jax.jit, static_argnums=1)
    def propagate(h0, k):
        def body(_, h):
            return (1.0 - ALPHA) * spmm(normed, h) + ALPHA * h0
        return jax.lax.fori_loop(0, k, body, h0)

    _ = float(jnp.sum(propagate(x0, ITERATIONS)))  # compile+warm
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
        h = propagate(h, ITERATIONS)
        _ = float(jnp.sum(h))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    edges_per_s = e_total * ITERATIONS / dt
    log(f"jax propagation: {dt*1000:.1f} ms / {ITERATIONS} iters -> "
        f"{edges_per_s/1e6:.1f} M edges/s")
    # plausibility guard: edges/s above the single-chip HBM bound means the
    # measurement (not the kernel) is wrong; flag loudly in the diagnostics.
    # Bandwidth derived from the detected device kind (v5e is the chip this
    # benchmark documents); unknown kinds use the conservative v5e figure.
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    hbm_bw = {"v4": 1.2e12, "v5p": 2.76e12, "v6e": 1.6e12}.get(
        next((k for k in ("v6e", "v5p", "v4") if k in kind), None), 8.19e11)
    hbm_bound = hbm_bw / (N_FEATURES * 4 * 2)  # read+write per edge
    if edges_per_s > hbm_bound:
        log(f"WARNING: measured {edges_per_s:.3g} edges/s exceeds the "
            f"HBM roofline bound {hbm_bound:.3g}; timing is not trustworthy")
    return edges_per_s, e_total


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


def _bench_jax_guarded(src, dst):
    """Run the JAX benchmark with a watchdog: the remote-TPU tunnel can
    wedge (observed: trivial ops hang indefinitely).  On timeout or error,
    re-run on the CPU backend in a subprocess so the driver always gets an
    honestly-measured JSON line."""
    import signal

    timeout_s = int(os.environ.get("GNNTF_BENCH_TIMEOUT_S", "480"))

    class _Timeout(Exception):
        pass

    def _raise(signum, frame):
        raise _Timeout()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(timeout_s)
    try:
        return bench_jax(src, dst)
    except (_Timeout, Exception) as exc:  # noqa: BLE001
        log(f"TPU bench failed/timed out ({exc!r}); falling back to CPU")
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    import subprocess
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-child"],
        capture_output=True, text=True, timeout=timeout_s,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu"})
    for line in out.stdout.splitlines():
        if line.startswith("CPU_EDGES_PER_S "):
            return float(line.split()[1]), None
    raise RuntimeError(f"cpu fallback failed: {out.stderr[-500:]}")


def main():
    if "--cpu-child" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        src, dst = build_graph()
        eps, _ = bench_jax(src, dst)
        print(f"CPU_EDGES_PER_S {eps}", flush=True)
        return
    src, dst = build_graph()
    edges_per_s, _ = _bench_jax_guarded(src, dst)
    tf_eps = bench_tf(src, dst)
    baseline = tf_eps if tf_eps else FALLBACK_TF_EDGES_PER_S
    print(json.dumps({
        "metric": "spmm_propagation_edges_per_s_per_chip",
        "value": round(edges_per_s),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / baseline, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
