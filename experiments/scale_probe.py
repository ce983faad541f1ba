"""Scale-dependence probe for the prepared SpMM (VERDICT r4 item 1).

r4 finding (documentation/performance.md "Scale dependence"): per-slot
cost of the prepared propagation loop grows ~3x when N doubles, while the
identical gather in isolation is N-flat.  The loop-carried (N, F)
feedback buffer is the remaining suspect.  This probe measures structural
variants of the SAME math to find which ingredient carries the
degradation:

* ``prepared``   — the production PreparedSpMM chain (baseline):
                   per-iteration concat-pad + gather/k-reduce/combine +
                   hub matmul, fori_loop feedback.
* ``padded``     — carry the (N+1, F) padded buffer through the loop and
                   segment-sum straight into N+1 rows: removes the
                   per-iteration (N, F) concatenate copy.
* ``unrolled``   — same math, K iterations python-unrolled inside one jit
                   (no lax.fori_loop): discriminates loop-carry buffer
                   aliasing from pure data feedback.
* ``pingpong``   — fori_loop with a two-buffer carry (write b from a,
                   swap): gather source and combine destination are
                   provably distinct buffers.
* ``nofeedback`` — the gather source is the constant x0 every iteration
                   (matches the r4 isolation experiments; should be fast
                   and N-flat — the control).
* ``gather``     — pure gather control (no multiply/reduce/combine).

Usage:  python experiments/scale_probe.py VARIANT [N E F K]
Prints one stdout line:
  PROBE variant=<v> n=<N> e=<E> slots=<S> ms=<t> ns_per_slot=<x>
Diagnostics to stderr.  Run each (variant, size) in a fresh process under
``timeout`` — remote-compile wedges must not chain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "prepared"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 169_343
    E = int(sys.argv[3]) if len(sys.argv) > 3 else 1_166_243
    F = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    K = int(sys.argv[5]) if len(sys.argv) > 5 else 50

    import dataclasses
    import jax
    import jax.numpy as jnp
    from gnntf_tpu.data.synthetic import random_power_law_edges
    from gnntf_tpu.graph import from_edges
    from gnntf_tpu.ops import normalize_adjacency, prepare_spmm
    from gnntf_tpu.ops.hoist import hoisting_jit

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # noqa: BLE001
        log(f"no compile cache: {exc!r}")

    log(f"[{variant}] device={jax.devices()[0]} N={N} E={E} F={F} K={K}")
    src, dst = random_power_law_edges(N, E, seed=0)
    g = from_edges(src, dst, n_nodes=N, directed=False)
    if variant.startswith("rcm-"):
        # locality reorder ahead of the layout build (VERDICT r4 item 7):
        # relabel nodes by reverse Cuthill-McKee, then run the requested
        # variant on the permuted graph
        from gnntf_tpu.graph.reorder import bandwidth, permute_graph, \
            rcm_order
        b0 = bandwidth(g)
        g, _ = permute_graph(g, rcm_order(g))
        log(f"[{variant}] RCM bandwidth {b0} -> {bandwidth(g)} "
            f"(N={N})")
        variant = variant[len("rcm-"):]
    normed = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(g)
    normed = dataclasses.replace(normed, row=g.row, col=g.col)
    prep = prepare_spmm(normed)
    # gathered slots = non-pad entries of the residual ELL grid (the
    # hub-densified edges ride the MXU) — performance.md's denominator
    slots = int((np.asarray(prep.ell.idx) != N).sum())
    x0 = jnp.asarray(np.random.RandomState(1).randn(N, F), jnp.float32)

    idx = jnp.asarray(prep.ell.idx)
    vrow = jnp.asarray(prep.ell.vrow_row)
    vals = prep.ell_vals
    rs = prep.row_scale
    cs = prep.col_scale
    has_hub = prep.dense is not None

    def core_padded(xp, out_segments):
        """gather/k-reduce/sorted-combine on an already padded (N+1, F)
        source, output over ``out_segments`` rows."""
        xin = xp
        if cs is not None:
            csp = jnp.concatenate([cs, jnp.zeros((1,), cs.dtype)])
            xin = xin * csp[:, None]
        part = (xin[idx] * vals[:, :, None]).sum(axis=1)
        out = jax.ops.segment_sum(part, vrow, num_segments=out_segments,
                                  indices_are_sorted=True)
        if has_hub:
            densep = prep.dense if out_segments == N else jnp.concatenate(
                [prep.dense, jnp.zeros((1, prep.dense.shape[1]),
                                       prep.dense.dtype)], axis=0)
            out = out + jnp.dot(densep, xin[prep.hub_ids],
                                preferred_element_type=xin.dtype)
        if rs is not None:
            rsp = rs if out_segments == N else jnp.concatenate(
                [rs, jnp.zeros((1,), rs.dtype)])
            out = out * rsp[:, None]
        return out

    if variant == "prepared":
        @hoisting_jit
        def chain(h):
            return jax.lax.fori_loop(0, K, lambda i, h: prep(h), h)

        run, arg = chain, x0
    elif variant == "padded":
        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)

        @hoisting_jit
        def chain(hp):
            return jax.lax.fori_loop(
                0, K, lambda i, hp: core_padded(hp, N + 1), hp)

        run, arg = chain, xp0
    elif variant == "unrolled":
        @hoisting_jit
        def chain(h):
            for _ in range(K):
                h = prep(h)
            return h

        run, arg = chain, x0
    elif variant == "pingpong":
        @hoisting_jit
        def chain(h):
            def body(i, ab):
                a, b = ab
                return (b, prep(a))
            a, b = jax.lax.fori_loop(0, K // 2, body, (h, prep(h)))
            return b

        run, arg = chain, x0
    elif variant == "nofeedback":
        @hoisting_jit
        def chain(h):
            def body(i, acc):
                return acc + prep(x0) * (1.0 + 1e-9 * i)
            return jax.lax.fori_loop(0, K, body, h)

        run, arg = chain, x0
    elif variant == "serialadd":
        # serialized across iterations (scalar dependency), but the gather
        # source is a FRESH elementwise-written buffer, not the scatter
        # output: discriminates "gather from freshly-written memory" from
        # "gather from the scatter's output buffer"
        @hoisting_jit
        def chain(h):
            def body(i, carry):
                src = x0 + carry[:1, :1] * 1e-30
                out = prep(src)
                return out
            return jax.lax.fori_loop(0, K, body, h)

        run, arg = chain, x0
    elif variant == "indep":
        # truly independent iterations: K distinct pre-materialized source
        # buffers, full cross-iteration pipelining allowed (honest
        # no-feedback control; LICM cannot hoist)
        KI = min(K, 10)
        xs = jnp.stack([x0 * (1.0 + 0.001 * i) for i in range(KI)])

        @hoisting_jit
        def chain(xs):
            def body(i, acc):
                return acc + prep(xs[i])
            return jax.lax.fori_loop(0, KI, body, jnp.zeros_like(x0))

        run, arg, K = chain, xs, KI
    elif variant == "paramgather":
        # gather straight from the jit PARAMETER xp0 every iteration, with
        # a scalar-only serial dependency (no hoisting possible): if this
        # is fast while serialadd/indep are slow, the gather's cost depends
        # on whether its operand is a program parameter vs a loop-internal
        # value
        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)

        @hoisting_jit
        def chain(xp):
            def body(i, carry):
                part = (xp[idx] * vals[:, :, None]).sum(axis=1)
                out = jax.ops.segment_sum(part, vrow, num_segments=N,
                                          indices_are_sorted=True)
                return carry * (1.0 - 1e-12) + out
            return jax.lax.fori_loop(0, K, body,
                                     jnp.zeros((N, F), x0.dtype))

        run, arg = chain, xp0
    elif variant == "deadcarry":
        # gather source is a CARRIED BUT NEVER-WRITTEN buffer (the carry
        # tuple's first component passes through unchanged); the value
        # grid gets a scalar perturbation from the live half so nothing
        # is loop-invariant.  Fast => only written/produced buffers are
        # slow; slow => any non-parameter operand is slow.
        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)

        @hoisting_jit
        def chain(xp):
            def body(i, carry):
                xdead, h = carry
                v_i = vals + h[0, 0] * 1e-30
                part = (xdead[idx] * v_i[:, :, None]).sum(axis=1)
                out = jax.ops.segment_sum(part, vrow, num_segments=N,
                                          indices_are_sorted=True)
                return (xdead, out)
            _, h = jax.lax.fori_loop(0, K, body,
                                     (xp, jnp.zeros((N, F), x0.dtype)))
            return h

        run, arg = chain, xp0
    elif variant == "dma":
        # DMA-engine gather (ops/pallas/dma_gather) with TRUE feedback:
        # per-row async copies driven from SMEM indices instead of the
        # native gather — does the descriptor path dodge the
        # internal-operand penalty?
        from gnntf_tpu.ops.pallas.dma_gather import dma_gather_ell
        VB = 256
        v = prep.ell.n_vrows
        v_pad = -(-v // VB) * VB
        idx_p = np.full((v_pad, prep.ell.k), N, np.int32)
        idx_p[:v] = np.asarray(prep.ell.idx)
        idx_flat = jnp.asarray(idx_p.reshape(-1))
        vals_flat = jnp.concatenate(
            [prep.ell_vals.reshape(-1),
             jnp.zeros(((v_pad - v) * prep.ell.k,), prep.ell_vals.dtype)])
        vrow_j = jnp.asarray(prep.ell.vrow_row)

        @hoisting_jit
        def chain(hp):
            def body(i, hp):
                part = dma_gather_ell(idx_flat, vals_flat, hp,
                                      k=prep.ell.k, VB=VB)
                out = jax.ops.segment_sum(part[:v], vrow_j,
                                          num_segments=N + 1,
                                          indices_are_sorted=True)
                return out
            return jax.lax.fori_loop(0, K, body, hp)

        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)
        run, arg = chain, xp0
    elif variant == "nohub":
        # feedback chain with the hub matmul removed (pure ELL residual);
        # carry is the padded (N+1, F) buffer
        @hoisting_jit
        def chain(hp):
            def body(i, hp):
                part = (hp[idx] * vals[:, :, None]).sum(axis=1)
                return jax.ops.segment_sum(part, vrow,
                                           num_segments=N + 1,
                                           indices_are_sorted=True)
            return jax.lax.fori_loop(0, K, body, hp)

        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)
        run, arg = chain, xp0
    elif variant.startswith("pfull"):
        # Packed rows, PLAIN row gather (the 2D-start-offset gather
        # faults the TPU worker): operand (ceil((N+1)/P), P*F), gather
        # full packed rows (P x the bytes), select the sub-row by folding
        # a one-hot of (idx % P) into the value grid — the k-reduce runs
        # over (k, P).  Tests the row-count hypothesis with only
        # mainstream ops.
        P = int(variant[len("pfull"):] or 2)
        rows = -(-(N + 1) // P)
        idx_np = np.asarray(idx)
        i0 = jnp.asarray(idx_np // P, jnp.int32)                   # (V, k)
        val_np = np.asarray(vals)                                  # (V, k)
        v_cnt, k_w = idx_np.shape
        val4 = np.zeros((v_cnt, k_w, P), np.float32)
        sel = idx_np % P
        np.put_along_axis(val4, sel[:, :, None], val_np[:, :, None],
                          axis=2)
        val4 = jnp.asarray(val4)

        @hoisting_jit
        def chain(packed):
            def body(i, packed):
                g = packed[i0].reshape(v_cnt, k_w, P, F)
                part = (g * val4[:, :, :, None]).sum(axis=(1, 2))
                out = jax.ops.segment_sum(part, vrow,
                                          num_segments=rows * P,
                                          indices_are_sorted=True)
                return out.reshape(rows, P * F)
            return jax.lax.fori_loop(0, K, body, packed)

        xp0 = jnp.concatenate(
            [x0, jnp.zeros((rows * P - N, F), x0.dtype)], axis=0)
        run, arg = chain, xp0.reshape(rows, P * F)
    elif variant.startswith("packed"):
        # Packed-operand gather: reshape the (N+1, F) iterate to
        # (ceil((N+1)/P), P*F) so the gather operand has P-fold fewer
        # rows, and fetch each source row as a (1, F) slice at column
        # offset (r % P) * F via lax.gather with 2D start indices.  Same
        # bytes moved; tests whether the N-dependent per-row cost follows
        # the operand's ROW COUNT.
        P = int(variant[len("packed"):] or 4)
        rows = -(-(N + 1) // P)
        i0 = jnp.asarray(np.asarray(idx) // P, jnp.int32)          # (V, k)
        i1 = jnp.asarray((np.asarray(idx) % P) * F, jnp.int32)
        starts = jnp.stack([i0, i1], axis=-1)                      # (V, k, 2)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))

        @hoisting_jit
        def chain(packed):
            def body(i, packed):
                g = jax.lax.gather(
                    packed, starts, dnums, slice_sizes=(1, F),
                    mode=jax.lax.GatherScatterMode.CLIP)            # (V,k,F)
                part = (g * vals[:, :, None]).sum(axis=1)
                out = jax.ops.segment_sum(part, vrow,
                                          num_segments=rows * P,
                                          indices_are_sorted=True)
                return out.reshape(rows, P * F)
            return jax.lax.fori_loop(0, K, body, packed)

        xp0 = jnp.concatenate(
            [x0, jnp.zeros((rows * P - N, F), x0.dtype)], axis=0)
        run, arg = chain, xp0.reshape(rows, P * F)
    elif variant.startswith("colblock"):
        # Column-blocked gather: partition SOURCE rows into S contiguous
        # blocks; per block, gather only the edges whose source lies in
        # the block from a dynamic_slice of the iterate (an operand with
        # N/S rows), then sum the S partial outputs.  Layouts are
        # host-built per block (separate ELL grids over the sub-edge
        # sets).
        barrier = False
        if variant.startswith("colblockb"):
            barrier = True
            S = int(variant[len("colblockb"):] or 2)
        else:
            S = int(variant[len("colblock"):] or 2)
        bs = -(-(N + 1) // S)
        from gnntf_tpu.ops.spmm import build_ell
        row_np = np.asarray(g.row)
        col_np = np.asarray(g.col)
        blocks = []
        for s in range(S):
            sel = (col_np >= s * bs) & (col_np < (s + 1) * bs)
            bl = build_ell(row_np[sel], col_np[sel] - s * bs + 0, N,
                           k=8, dedup=True)
            # pad index rows point at local row bs (append a zero row)
            bidx = np.where(bl.idx == N, bs, bl.idx)
            blocks.append((jnp.asarray(bidx), jnp.asarray(bl.vrow_row),
                           jnp.asarray(np.where(bidx == bs, 0.0, 1.0)
                                       .astype(np.float32))))
        @hoisting_jit
        def chain(hp):
            def body(i, hp):
                out = jnp.zeros((N + 1, F), hp.dtype)
                for s, (bidx, bvrow, bval) in enumerate(blocks):
                    src = jax.lax.dynamic_slice(
                        hp, (min(s * bs, N + 1 - bs), 0), (bs, F))
                    srcp = jnp.concatenate(
                        [src, jnp.zeros((1, F), src.dtype)], axis=0)
                    if barrier:
                        # force the slice to MATERIALIZE as a small
                        # standalone buffer: without this XLA rewrites
                        # gather(dynamic_slice(hp)) into a gather on the
                        # full hp (offset folded into the indices), so
                        # the operand never shrinks
                        srcp = jax.lax.optimization_barrier(srcp)
                    part = (srcp[bidx] * bval[:, :, None]).sum(axis=1)
                    out = out + jax.ops.segment_sum(
                        part, bvrow, num_segments=N + 1,
                        indices_are_sorted=True)
                return out
            return jax.lax.fori_loop(0, K, body, hp)

        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)
        run, arg = chain, xp0
    elif variant == "noscatter":
        # feedback chain with the sorted segment-sum REPLACED by a cheap
        # reshape/slice back to (N+1, F): gather + k-reduce latency only.
        # (Semantics are garbage; only the dependency structure matters.)
        V = int(idx.shape[0])
        reps = -(-(N + 1) // V)

        @hoisting_jit
        def chain(hp):
            def body(i, hp):
                part = (hp[idx] * vals[:, :, None]).sum(axis=1)
                big = jnp.tile(part, (reps, 1))[:N + 1]
                return big * (1.0 / max(1, reps))
            return jax.lax.fori_loop(0, K, body, hp)

        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)
        run, arg = chain, xp0
    elif variant == "nogather":
        # feedback chain with the GATHER replaced by a contiguous slice
        # (same output/scatter structure, no random access): segment-sum +
        # feedback latency only
        V = int(idx.shape[0])
        k_w = int(idx.shape[1])

        @hoisting_jit
        def chain(hp):
            def body(i, hp):
                src = jax.lax.dynamic_slice(
                    hp, (0, 0), (min(V, N + 1), F))
                src = jnp.tile(src, (-(-V // src.shape[0]), 1))[:V]
                part = src[:, None, :] * vals[:, :, None]
                part = part.sum(axis=1)
                return jax.ops.segment_sum(part, vrow,
                                           num_segments=N + 1,
                                           indices_are_sorted=True)
            return jax.lax.fori_loop(0, K, body, hp)

        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)
        run, arg = chain, xp0
    elif variant == "gather":
        xp0 = jnp.concatenate([x0, jnp.zeros((1, F), x0.dtype)], axis=0)

        @hoisting_jit
        def chain(hp):
            def body(i, acc):
                return acc + xp0[idx].sum(axis=1) * (1.0 + 1e-9 * i)
            z = jnp.zeros((idx.shape[0], F), x0.dtype)
            return jax.lax.fori_loop(0, K, body, z)

        run, arg = chain, xp0
    else:
        raise SystemExit(f"unknown variant {variant!r}")

    t0 = time.perf_counter()
    out = run(arg)
    _ = float(jnp.sum(out))
    log(f"[{variant}] compile+warm {time.perf_counter()-t0:.1f}s")
    times = []
    h = arg
    for _ in range(3):
        t0 = time.perf_counter()
        h = run(arg if variant in ("nofeedback", "gather", "indep") else h)
        _ = float(jnp.sum(h))
        times.append(time.perf_counter() - t0)
    per = min(times) / K
    log(f"[{variant}] times {[f'{t*1e3:.1f}' for t in times]} ms/{K}")
    print(f"PROBE variant={variant} n={N} e={E} slots={slots} "
          f"ms={per*1e3:.3f} ns_per_slot={per*1e9/max(slots,1):.2f}",
          flush=True)


if __name__ == "__main__":
    main()
