"""Per-impl SpMM probe at bench scale — discriminates "tunnel flake" from
"impl hangs at scale" (VERDICT r2, weak #2 / task #4).

Runs ONE impl (argv[1] in segment|ell|hybrid|pallas) at the bench graph
shape in this process: builds the layout, compiles a 10-step propagation,
times 3 reps.  Run each impl in a fresh process under `timeout` so a hang
in one formulation cannot poison the others:

    for i in segment ell hybrid; do timeout 300 python experiments/impl_probe.py $i; done

Prints stage-by-stage timings to stderr and a final one-line result to
stdout: ``IMPL <name> <ms_per_spmm> <edges_per_s>``.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "segment"
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 169_343
    n_edges = int(sys.argv[3]) if len(sys.argv) > 3 else 1_166_243
    n_feat = 128
    iters = 10

    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from gnntf_tpu.data.synthetic import random_power_law_edges
    from gnntf_tpu.graph import from_edges
    import importlib
    from gnntf_tpu.ops import normalize_adjacency
    # ops/__init__ re-exports the spmm *function*; grab the module itself
    spmm_mod = importlib.import_module("gnntf_tpu.ops.spmm")

    log(f"[{impl}] imports {time.perf_counter()-t0:.1f}s; "
        f"device={jax.devices()[0]}")

    t0 = time.perf_counter()
    src, dst = random_power_law_edges(n_nodes, n_edges, seed=0)
    graph = from_edges(src, dst, n_nodes=n_nodes, directed=False)
    e_total = graph.n_edges
    x0 = jnp.asarray(
        np.random.RandomState(1).randn(n_nodes, n_feat), jnp.float32)
    normed = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(graph)
    jax.block_until_ready(normed.val)
    log(f"[{impl}] graph+norm {time.perf_counter()-t0:.1f}s "
        f"({e_total} edges)")

    t0 = time.perf_counter()
    spmm_mod.set_spmm_impl(impl)
    # force layout build outside the timed/compiled region
    if impl in ("ell", "hybrid"):
        fn = {"ell": spmm_mod._ell_layout,
              "hybrid": spmm_mod._hybrid_layout}[impl]
        layout = fn(normed, spmm_mod._ELL_DEFAULT_K)
        log(f"[{impl}] layout build {time.perf_counter()-t0:.1f}s "
            f"({type(layout).__name__})")

    @partial(jax.jit, static_argnums=1)
    def propagate(h0, k):
        def body(_, h):
            return 0.9 * spmm_mod.spmm(normed, h) + 0.1 * h0
        return jax.lax.fori_loop(0, k, body, h0)

    t0 = time.perf_counter()
    out = propagate(x0, iters)
    _ = float(jnp.sum(out))
    log(f"[{impl}] compile+first-run {time.perf_counter()-t0:.1f}s")

    times = []
    h = x0
    for _ in range(3):
        t0 = time.perf_counter()
        h = propagate(h, iters)
        _ = float(jnp.sum(h))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    eps = e_total * iters / dt
    log(f"[{impl}] {dt*1000:.1f} ms / {iters} spmm -> {eps/1e6:.1f} M edges/s")
    print(f"IMPL {impl} {dt*1000/iters:.3f} {eps:.0f}", flush=True)


if __name__ == "__main__":
    main()
