"""Hub-count sweep for the hub-densified hybrid SpMM (ops/spmm.py).

The hybrid moves the top-H source nodes onto a dense (N, H) MXU slice and
gathers only the residual; throughput scales with the *gathered* fraction
(documentation/performance.md).  More hubs -> less gather but a bigger
dense slice (memory + scatter-routing cost).  This sweep measures the
actual optimum at the bench shape instead of trusting the H=128 default.

For each H: build the layout with ``build_hybrid(n_hubs=H)``, report hub
edge coverage, then time the 10-iteration prepared propagation (the
bench's phase-1 program).  Run per-H in one process (layouts are
independent; use `timeout` from the shell if the tunnel is suspect).

Usage: python experiments/hub_sweep.py [H ...]    (default 64 128 256 512)
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NODES = int(os.environ.get("GNNTF_SWEEP_N", 169_343))
N_EDGES = int(os.environ.get("GNNTF_SWEEP_E", 1_166_243))
N_FEAT = 128
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    hubs = [int(h) for h in sys.argv[1:]] or [64, 128, 256, 512]
    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses
    import importlib
    from gnntf_tpu.data.synthetic import random_power_law_edges
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.ops import normalize_adjacency
    # ops/__init__ re-exports the spmm *function*; grab the module itself
    spmm_mod = importlib.import_module("gnntf_tpu.ops.spmm")

    src, dst = random_power_law_edges(N_NODES, N_EDGES, seed=0)
    graph = from_edges(src, dst, n_nodes=N_NODES, directed=False)
    e_total = graph.n_edges
    x0 = jnp.asarray(np.random.RandomState(1).randn(N_NODES, N_FEAT),
                     jnp.float32)
    normed = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(
        graph)
    normed = dataclasses.replace(normed, row=graph.row, col=graph.col)
    log(f"device={jax.devices()[0]}  edges={e_total}")

    for H in hubs:
        t0 = time.perf_counter()
        layout = spmm_mod.build_hybrid(
            np.asarray(normed.row), np.asarray(normed.col), N_NODES,
            n_hubs=H, mem_cap=2 * 1024 ** 3)
        if layout is None:
            log(f"H={H}: build declined")
            continue
        cov = layout.hub_sel.shape[0] / max(1, layout.n_unique)
        log(f"H={H}: layout {time.perf_counter()-t0:.1f}s, "
            f"coverage {cov:.3f}, rest vrows {layout.rest.n_vrows}")

        # prepared state for this layout (mirrors PreparedSpMM, but with an
        # explicit layout so the sweep bypasses the H-default cache)
        val = jnp.asarray(normed.materialized().val)
        rest = layout.rest
        ell_vals = jnp.zeros((rest.n_vrows * rest.k,), val.dtype)
        ell_vals = ell_vals.at[layout.ell_slot_of_edge].add(
            val, mode="drop").reshape(rest.n_vrows, rest.k)
        dense = jnp.zeros((N_NODES * layout.n_hubs,), val.dtype)
        dense = dense.at[layout.dense_flat_of_edge].add(
            val, mode="drop").reshape(N_NODES, layout.n_hubs)
        hub_ids = jnp.asarray(layout.hub_ids)
        jax.block_until_ready(dense)

        def one(h, ell_vals=ell_vals, dense=dense, hub_ids=hub_ids,
                rest=rest):
            out = spmm_mod._ell_compute(rest, ell_vals, h, N_NODES)
            return out + jnp.dot(dense, h[hub_ids],
                                 preferred_element_type=h.dtype)

        # hoisting_jit: the (N, H) dense slice enters as a parameter — at
        # H=512 it is 347 MB, which as an HLO literal exceeded the remote
        # compile payload limit (the r3 sweep's blocker; ops/hoist.py)
        from gnntf_tpu.ops.hoist import hoisting_jit

        @hoisting_jit
        def prop(h0, one=one):
            def body(_, h):
                return 0.9 * one(h) + 0.1 * h0
            return jax.lax.fori_loop(0, ITERS, body, h0)

        t0 = time.perf_counter()
        _ = float(jnp.sum(prop(x0)))
        log(f"H={H}: compile+first {time.perf_counter()-t0:.1f}s")
        times = []
        h = x0
        for _ in range(3):
            t0 = time.perf_counter()
            h = prop(h)
            _ = float(jnp.sum(h))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"H={H:5d}  cov={cov:.3f}  {dt/ITERS*1e3:6.2f} ms/spmm  "
              f"{e_total*ITERS/dt/1e6:7.1f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
