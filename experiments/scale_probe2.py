"""LICM-proof scale probe (follow-up to scale_probe.py).

The optimized-HLO dump (obtained via ``compiled.as_text()`` through the
remote-compile service — r4 believed this was unavailable) shows XLA
hoists loop-invariant gathers out of ``fori_loop`` bodies: every "fast
isolated gather" control measured so far (r4's isolation experiments,
scale_probe's paramgather) amortized ONE gather over K iterations and
measured only the residual accumulate/scatter.  These variants make the
gather unhoistable by cycling through K DIFFERENT index grids
(stacked constant, dynamic-sliced per iteration) so every iteration
performs a real gather:

* ``gatherK``     — gather+k-reduce from a CONSTANT source, accumulate.
* ``spmmK``       — full gather/k-reduce/sorted-scatter chain from a
                    constant source, accumulate.
* ``spmmK_fb``    — same chain with TRUE feedback (output is the next
                    source).

Comparing the three at N=169K vs N=338K separates (a) the raw
unhoisted gather rate and its N dependence from (b) any extra cost of
gathering from a loop-produced buffer.

Usage: python experiments/scale_probe2.py VARIANT [N E F K]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "gatherK"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 169_343
    E = int(sys.argv[3]) if len(sys.argv) > 3 else 1_166_243
    F = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    K = int(sys.argv[5]) if len(sys.argv) > 5 else 10

    import jax
    import jax.numpy as jnp
    from gnntf_tpu.data.synthetic import random_power_law_edges
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.ops.hoist import hoisting_jit
    from gnntf_tpu.ops.spmm import _ell_layout

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # noqa: BLE001
        log(f"no compile cache: {exc!r}")

    log(f"[{variant}] device={jax.devices()[0]} N={N} E={E} F={F} K={K}")
    # bufsize/bufspread gather through the BASE-N layout from an N-row
    # buffer: the structure (and so the index grids) is fixed at base N
    n_struct = min(N, 169_343) if variant in ("bufsize", "bufspread") else N
    src, dst = random_power_law_edges(n_struct, E, seed=0)
    g = from_edges(src, dst, n_nodes=n_struct, directed=False)
    layout = _ell_layout(g, 8)
    V, k = layout.idx.shape
    slots = int((layout.idx != N).sum())

    # K index grids: the same layout rows under K different row
    # permutations of the virtual-row axis (identical slot count and
    # degree structure; different memory order per iteration, so no two
    # iterations share a gather and LICM cannot fire)
    rng = np.random.RandomState(1)
    idx_stack = np.stack([layout.idx[rng.permutation(V)]
                          for _ in range(K)])              # (K, V, k)
    idxs = jnp.asarray(idx_stack)
    vals = jnp.asarray(np.where(layout.idx == N, 0.0, 1.0), jnp.float32)
    vrow = jnp.asarray(layout.vrow_row)
    x0 = jnp.asarray(rng.randn(N + 1, F).astype(np.float32))

    def chain_body(step_fn, carry0):
        @hoisting_jit
        def chain(x, idxs):
            def body(i, carry):
                return step_fn(jax.lax.dynamic_index_in_dim(
                    idxs, i, keepdims=False), carry, x)
            return jax.lax.fori_loop(0, K, body, carry0)
        return chain

    if variant == "gatherK":
        def step(idx_i, acc, x):
            part = (x[idx_i] * vals[:, :, None]).sum(axis=1)
            return acc + part
        chain = chain_body(step, jnp.zeros((V, F), jnp.float32))
        args = (x0, idxs)
    elif variant == "spmmK":
        def step(idx_i, acc, x):
            part = (x[idx_i] * vals[:, :, None]).sum(axis=1)
            out = jax.ops.segment_sum(part, vrow, num_segments=N + 1,
                                      indices_are_sorted=True)
            return acc + out
        chain = chain_body(step, jnp.zeros((N + 1, F), jnp.float32))
        args = (x0, idxs)
    elif variant == "spmmK_fb":
        def step(idx_i, h, x_unused):
            part = (h[idx_i] * vals[:, :, None]).sum(axis=1)
            return jax.ops.segment_sum(part, vrow, num_segments=N + 1,
                                       indices_are_sorted=True)
        chain = chain_body(step, None)

        @hoisting_jit
        def chain(x, idxs):  # noqa: F811 — feedback carries x itself
            def body(i, h):
                idx_i = jax.lax.dynamic_index_in_dim(idxs, i,
                                                     keepdims=False)
                part = (h[idx_i] * vals[:, :, None]).sum(axis=1)
                return jax.ops.segment_sum(part, vrow, num_segments=N + 1,
                                           indices_are_sorted=True)
            return jax.lax.fori_loop(0, K, body, x)
        args = (x0, idxs)
    elif variant in ("bufsize", "bufspread"):
        # Same INDEX GRIDS (built at the base N), gathered from a source
        # buffer of N_src rows (argv N = N_src >= base N).  ``bufsize``
        # keeps the indices as-is (accessed footprint identical, buffer
        # merely larger); ``bufspread`` doubles them (same count, spread
        # across the larger buffer).  Separates buffer-size from
        # access-footprint effects.
        if variant == "bufspread":
            idxs = jnp.minimum(idxs * 2, N)
        x0 = jnp.asarray(rng.randn(N + 1, F).astype(np.float32))

        def step(idx_i, acc, x):
            part = (x[idx_i] * vals[:, :, None]).sum(axis=1)
            return acc + part
        chain = chain_body(step, jnp.zeros((V, F), jnp.float32))
        args = (x0, idxs)
    else:
        raise SystemExit(f"unknown variant {variant!r}")

    t0 = time.perf_counter()
    out = chain(*args)
    _ = float(jnp.sum(out))
    log(f"[{variant}] compile+warm {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(*args)
        _ = float(jnp.sum(out))
        times.append(time.perf_counter() - t0)
    per = min(times) / K
    log(f"[{variant}] times {[f'{t*1e3:.1f}' for t in times]} ms/{K}")
    print(f"PROBE2 variant={variant} n={N} e={E} slots={slots} "
          f"ms={per*1e3:.3f} ns_per_slot={per*1e9/max(slots,1):.2f}",
          flush=True)


if __name__ == "__main__":
    main()
