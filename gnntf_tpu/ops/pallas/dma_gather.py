"""Pallas TPU SpMM: DMA-gather ELL formulation (VERDICT r2 task #2).

The last untried formulation for the sparse gather at the heart of SpMM:
instead of XLA's native gather (``xp[idx]``, which lowers to the TPU
gather unit — measured ~80-190 M rows/s regardless of F/dtype,
documentation/performance.md) this kernel drives the **DMA engines**
directly: per virtual-row block, every referenced source row of ``x`` is
copied HBM -> VMEM with ``pltpu.make_async_copy`` (one descriptor per
row, issued back-to-back so the queues pipeline), then the dense k-reduce
runs on the VPU from VMEM and only the small virtual-row -> row combine
remains for XLA.

Index plumbing: the (V, k) ELL indices arrive as a normal VMEM input
block per grid step (Pallas pipelines them ahead of the kernel body); the
kernel copies the block to SMEM scratch so per-row scalar reads feed the
DMA descriptors.

This file exists to settle the "is the gather unit the ceiling?" question
with a measurement either way — see documentation/performance.md for the
verdict and numbers.  No reference counterpart (the reference's only
kernel is tf.sparse.sparse_dense_matmul, SURVEY §2.4); correctness is
tested in interpret mode against the dense oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _kernel(idx_ref, vals_ref, x_hbm, out_ref, idx_smem, rows_vmem, sem,
            copy_sem, *, VB, K, F):
    """One grid step = one block of VB virtual rows (VB*K row gathers)."""
    nrows = VB * K

    # indices to SMEM so scalar reads can drive DMA descriptors
    idx_copy = pltpu.make_async_copy(idx_ref, idx_smem, sem)
    idx_copy.start()
    idx_copy.wait()

    def issue(j, _):
        src = idx_smem[j]
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, 1), :],
            rows_vmem.at[pl.ds(j, 1), :],
            copy_sem,
        ).start()
        return 0

    jax.lax.fori_loop(0, nrows, issue, 0)

    def drain(j, _):
        src = idx_smem[j]
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(src, 1), :],
            rows_vmem.at[pl.ds(j, 1), :],
            copy_sem,
        ).wait()
        return 0

    jax.lax.fori_loop(0, nrows, drain, 0)

    gathered = rows_vmem[:].reshape(VB, K, F)
    # vals arrive as a (VB, K) 2D block.  The k-reduce is a statically
    # unrolled sum of K (VB, F) planes scaled by (VB, 1) value column
    # slices: Mosaic's vector-layout inference rejects both the
    # (VB*K,) -> (VB, K, 1) shape cast and a vkf,vk->vf dot_general, while
    # 2D slices + lane broadcasts lower cleanly (K is small and static).
    acc = gathered[:, 0, :] * vals_ref[:, 0:1]
    for j in range(1, K):
        acc = acc + gathered[:, j, :] * vals_ref[:, j:j + 1]
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("k", "VB", "interpret"))
def dma_gather_ell(idx_flat: jax.Array, vals_flat: jax.Array,
                   xp: jax.Array, *, k: int, VB: int = 256,
                   interpret: bool = False) -> jax.Array:
    """Per-virtual-row partials ``p[v] = sum_j vals[v, j] * xp[idx[v, j]]``.

    ``idx_flat`` — (Vpad*k,) ELL indices, padded to a multiple of ``VB``
    virtual rows with index ``N`` (the appended zero row of ``xp``);
    ``vals_flat`` — (Vpad*k,) live values (reshaped to (Vpad, k) blocks
    internally).  ``xp`` — (N+1, F) features with a trailing zero row.
    Returns (Vpad, F) partials; combine with
    ``segment_sum(partials, vrow_row)`` exactly as the ELL path does.
    """
    if not _PALLAS_OK:
        raise RuntimeError("pallas unavailable")
    v_pad = idx_flat.shape[0] // k
    assert v_pad % VB == 0, (v_pad, VB)
    F = xp.shape[1]
    n_blocks = v_pad // VB
    vals2 = vals_flat.reshape(v_pad, k)
    return pl.pallas_call(
        partial(_kernel, VB=VB, K=k, F=F),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((VB * k,), lambda b: (b,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VB, k), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # xp stays in HBM
        ],
        out_specs=pl.BlockSpec((VB, F), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v_pad, F), xp.dtype),
        scratch_shapes=[
            pltpu.SMEM((VB * k,), jnp.int32),
            pltpu.VMEM((VB * k, F), xp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx_flat, vals2, xp)


def spmm_dma_gather(graph, x, *, k: int = 8, VB: int = 256,
                    interpret: bool | None = None):
    """Full SpMM through the DMA-gather kernel: ELL layout (host-cached),
    live-value scatter, kernel partials, sorted segment combine.
    Experimental — exists for the roofline investigation; see module
    docstring."""
    from ..spmm import _ell_layout, _scaled_call

    if graph.scaled:
        return _scaled_call(spmm_dma_gather, graph, x, k=k, VB=VB,
                            interpret=interpret)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    graph = graph.materialized_dropout()
    layout = _ell_layout(graph, k)
    v = layout.n_vrows
    v_pad = -(-v // VB) * VB
    idx = np.full((v_pad, layout.k), layout.n_nodes, np.int32)
    idx[:v] = layout.idx
    unique = layout.dup_order is None
    vals = jnp.zeros((v_pad * layout.k,), x.dtype)
    vals = vals.at[jnp.asarray(layout.edge_slot)].add(
        graph.val.astype(x.dtype),
        indices_are_sorted=unique and graph.sorted_by_row,
        unique_indices=unique)
    xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    partial_rows = dma_gather_ell(jnp.asarray(idx.reshape(-1)), vals, xp,
                                  k=layout.k, VB=VB, interpret=interpret)
    return jax.ops.segment_sum(partial_rows[:v], jnp.asarray(layout.vrow_row),
                               num_segments=graph.n_nodes,
                               indices_are_sorted=True)
