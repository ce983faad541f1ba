"""Pallas TPU SpMM kernel: blocked one-hot MXU contraction.

For each edge chunk (all edges inside one (row-window, col-tile) block of
the adjacency, see `format.BlockedCOO`):

    C[e, j]  = 1 if cols[e] == j else 0        (BE, T)  gather one-hot
    G        = (C @ X_tile) * vals[:, None]    (BE, F)  gathered+scaled rows
    S[i, e]  = 1 if rows[e] == i else 0        (W, BE)  scatter one-hot
    out_w   += S @ G                           (W, F)

Both contractions run on the MXU; the one-hots are built on the VPU with
broadcasted iota compares.  Chunks are ordered window-major so `out_w`
lives in VMEM across all chunks of a window (revisited output block) and
is written to HBM once per window.

Measured on TPU v5e (remote): ~14 ns/edge for the scatter contraction at
W=256/BE=1024 fp32 — competitive with the XLA segment-sum path only when
the blocked layout's fill factor is high (small or locality-reordered
graphs).  The default SpMM implementation therefore remains
`spmm_segment`; select this kernel via `set_spmm_impl("pallas")` or call
it directly.  `tpu.dynamic_gather` fails to compile on this stack, which
rules out the cheaper VMEM-gather formulation; revisit when Mosaic grows
gather/scatter support.

No reference counterpart (the reference's only kernel is
tf.sparse.sparse_dense_matmul, SURVEY §2.4); parity is behavioral: output
allclose vs the segment-sum SpMM.
"""
from __future__ import annotations

from collections import OrderedDict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...graph.coo import Graph
from .format import BlockedCOO, block_coo

try:  # pallas import kept lazy-safe for environments without TPU lowering
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _kernel(cw_ref, ct_ref, rows_ref, cols_ref, vals_ref, x_ref, out_ref,
            *, W, T, BE, F, compute_dtype):
    c = pl.program_id(0)

    # first chunk of a window zero-initialises the resident output block
    is_first = c == 0
    prev_w = cw_ref[jnp.maximum(c, 1) - 1]
    new_window = jnp.logical_or(is_first, cw_ref[c] != prev_w)

    @pl.when(new_window)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cols = cols_ref[:]
    rows = rows_ref[:]
    vals = vals_ref[:]

    # the MXU's default matmul precision truncates f32 inputs to bf16;
    # request full precision unless bf16 compute was chosen explicitly
    prec = None if compute_dtype == jnp.bfloat16 \
        else jax.lax.Precision.HIGHEST

    # gather one-hot: (BE, T) @ (T, F)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (BE, T), 1)
    C = (iota_t == cols[:, None]).astype(compute_dtype)
    G = jnp.dot(C, x_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=prec)
    G = G * vals[:, None]

    # scatter one-hot: (W, BE) @ (BE, F)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, BE), 0)
    S = (rows[None, :] == iota_w).astype(compute_dtype)
    out_ref[:] += jnp.dot(S, G.astype(compute_dtype),
                          preferred_element_type=jnp.float32, precision=prec)


@partial(jax.jit, static_argnames=("interpret", "bf16"))
def _spmm_blocked(blocked: BlockedCOO, val: jax.Array, x: jax.Array,
                  interpret: bool = False, bf16: bool = False) -> jax.Array:
    W, T, BE = blocked.window, blocked.tile, blocked.block_edges
    F = x.shape[-1]
    n_chunks = blocked.n_chunks
    np_pad = blocked.n_windows * W
    x_pad = jnp.zeros((blocked.n_tiles * T, F), x.dtype)
    x_pad = x_pad.at[: x.shape[0]].set(x)
    vals = blocked.scatter_values(val)  # live edge values, padding slots 0
    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk_window, chunk_tile
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((BE,), lambda c, cw, ct: (c,)),
            pl.BlockSpec((BE,), lambda c, cw, ct: (c,)),
            pl.BlockSpec((BE,), lambda c, cw, ct: (c,)),
            pl.BlockSpec((T, F), lambda c, cw, ct: (ct[c], 0)),
        ],
        out_specs=pl.BlockSpec((W, F), lambda c, cw, ct: (cw[c], 0)),
    )
    out = pl.pallas_call(
        partial(_kernel, W=W, T=T, BE=BE, F=F, compute_dtype=compute_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_pad, F), jnp.float32),
        interpret=interpret,
    )(blocked.chunk_window, blocked.chunk_tile,
      blocked.rows, blocked.cols, vals, x_pad)
    return out[: blocked.n_nodes].astype(x.dtype)


# Small LRU keyed on id(graph.row); values pin a strong reference to the
# keying array so a recycled id can never alias a dead graph's layout, and
# the bound keeps per-sample-subgraph workloads from leaking layouts.
_BLOCK_CACHE: OrderedDict = OrderedDict()
_BLOCK_CACHE_MAX = 16


def _blocked_layout(graph: Graph, window: int, tile: int,
                    block_edges: int) -> BlockedCOO:
    if isinstance(graph.row, jax.core.Tracer):
        raise TypeError(
            "spmm_pallas requires concrete (non-traced) graph *structure*; "
            "close over the graph instead of passing it as a jit argument "
            "(traced edge values are fine)")
    key = (id(graph.row), window, tile, block_edges)
    hit = _BLOCK_CACHE.get(key)
    if hit is not None and hit[0] is graph.row:
        _BLOCK_CACHE.move_to_end(key)
        return hit[1]
    blocked = block_coo(
        np.asarray(graph.row), np.asarray(graph.col), graph.n_nodes,
        window=window, tile=tile, block_edges=block_edges)
    _BLOCK_CACHE[key] = (graph.row, blocked)
    while len(_BLOCK_CACHE) > _BLOCK_CACHE_MAX:
        _BLOCK_CACHE.popitem(last=False)
    return blocked


_VJP_CACHE: OrderedDict = OrderedDict()


def _pallas_vjp_fn(blocked: BlockedCOO, row: jax.Array, col: jax.Array,
                   n_nodes: int, interpret: bool, bf16: bool):
    """A differentiable (val, x) -> A @ x closure over one blocked layout.

    pallas_call has no autodiff here, so the VJP is hand-specified:
    ``dx = A^T @ dy`` (transpose SpMM) and ``dval = SDDMM(dy, x)`` — the
    standard sparse-matmul adjoints (the SDDMM half is ops.spmm.edge_dot's
    math), computed with segment primitives.  Cached per layout
    so jit sees a stable function identity."""
    key = (id(blocked), interpret, bf16)
    hit = _VJP_CACHE.get(key)
    if hit is not None and hit[0] is blocked:
        return hit[1]

    @jax.custom_vjp
    def f(val, x):
        return _spmm_blocked(blocked, val, x, interpret=interpret, bf16=bf16)

    def f_fwd(val, x):
        return f(val, x), (val, x)

    def f_bwd(res, dy):
        val, x = res
        gathered = dy[row] * val[:, None].astype(dy.dtype)
        dx = jax.ops.segment_sum(gathered, col, num_segments=x.shape[0])
        dval = jnp.sum(dy[row] * x[col], axis=-1).astype(val.dtype)
        return dval, dx

    f.defvjp(f_fwd, f_bwd)
    _VJP_CACHE[key] = (blocked, f)
    while len(_VJP_CACHE) > _BLOCK_CACHE_MAX:
        _VJP_CACHE.popitem(last=False)
    return f


def spmm_pallas(graph: Graph, x: jax.Array, *, interpret: bool | None = None,
                bf16: bool = False, window: int = 256, tile: int = 256,
                block_edges: int = 1024) -> jax.Array:
    """SpMM via the blocked one-hot Pallas kernel.

    The blocked layout (structure only) is built host-side once per
    (graph, blocking) and memoized; the *live* ``graph.val`` — possibly a
    tracer carrying per-step graph-dropout/renormalization — is scattered
    into the slot grid on every call.  Differentiable in ``val`` and ``x``
    (custom VJP), so it drops into jitted train steps.  Under non-TPU
    backends defaults to interpret mode so tests exercise the same kernel
    code path on CPU (SURVEY §4d).
    """
    if not _PALLAS_OK:
        raise RuntimeError("pallas unavailable in this environment")
    if graph.scaled:
        from ..spmm import _scaled_call
        return _scaled_call(spmm_pallas, graph, x, interpret=interpret,
                            bf16=bf16, window=window, tile=tile,
                            block_edges=block_edges)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    graph = graph.materialized_dropout()
    blocked = _blocked_layout(graph, window, tile, block_edges)
    fn = _pallas_vjp_fn(blocked, graph.row, graph.col, graph.n_nodes,
                        interpret, bf16)
    return fn(graph.val, x)
