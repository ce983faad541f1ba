"""Multi-host (multi-process) distribution entry points.

Scales the edge-parallel design (parallel/dist.py) from one host's chips to
a TPU pod slice spanning N processes (BASELINE north star "multi-host TPU
pod slice ... halo all-to-all over ICI/DCN"; no reference counterpart —
the reference is single-device eager TF, SURVEY §2.4).

Design: the JAX distributed runtime is the only cluster layer — no
MPI/NCCL.  :func:`launch_distributed` initializes it (auto-detecting TPU
pod metadata when present); :func:`make_pod_mesh` then builds the same
``(edge, feat)`` mesh the single-host trainer uses, but with the edge axis
laid out **host-major** (``mesh_utils.create_hybrid_device_mesh``): the
slow DCN hops sit on the *outer* blocks of the edge axis and every
intra-block collective rides ICI.  Because the axis names are unchanged,
everything downstream — ``shard_graph``, ``make_distributed_train_step``,
``fit(mesh=...)``, the halo executor — works on a pod mesh verbatim; GSPMD
lowers each collective hierarchically (reduce-scatter on ICI, the small
cross-host residual on DCN).

Host-local data: each process may hold only its own slice of a huge edge
list; :func:`shard_graph_local` assembles the global sharded Graph from
per-process shards without ever materializing the full arrays on any one
host (``jax.make_array_from_process_local_data``).

CI story (no pod available): ``tests/test_multihost.py`` launches two CPU
processes (gloo collectives) running the real GSPMD train step over a
4-device cross-process mesh and asserts the loss matches the
single-process value; ``__graft_entry__.dryrun_multichip`` exposes the
same as ``n_processes=2``.
"""
from __future__ import annotations

import socket
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.coo import Graph
from .dist import EDGE_AXIS, FEAT_AXIS

EDGE_HOST_AXIS = "edge_host"  # hierarchical pod meshes (DCN slice of edge)


def free_port() -> int:
    """An OS-assigned free TCP port (for single-node multi-process tests)."""
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def launch_distributed(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None,
                       local_device_ids=None) -> bool:
    """Initialize the JAX distributed runtime (idempotent).

    On Cloud TPU pods all arguments are auto-detected (pass nothing); for
    manual clusters pass the coordinator ``host:port`` plus process count
    and rank.  On CPU backends the gloo collectives implementation is
    selected so cross-process programs execute (the CI path).  Returns
    True when running multi-process after the call.
    """
    already = getattr(
        jax._src.distributed.global_state, "client", None) is not None
    if not already and (coordinator_address is not None
                        or num_processes not in (None, 1)):
        try:
            # NB: only the config string — jax.default_backend() would
            # initialize the XLA backend, which must not happen before
            # jax.distributed.initialize()
            if jax.config.jax_platforms == "cpu":
                jax.config.update("jax_cpu_collectives_implementation",
                                  "gloo")
        except Exception:  # noqa: BLE001 — older jax: option absent
            pass
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
    return jax.process_count() > 1


def make_pod_mesh(n_feat: int = 1, *, n_edge_dcn: Optional[int] = None,
                  n_edge_ici: Optional[int] = None,
                  hierarchical: bool = False,
                  devices: Optional[Sequence] = None) -> Mesh:
    """An ``(edge, feat)`` mesh whose edge axis spans the whole pod,
    DCN-aware: edge index = ``host * chips_per_host + chip`` so contiguous
    edge shards are host-local and collectives decompose into ICI +
    a small DCN residual.

    ``hierarchical=True`` instead returns an explicit 3-axis
    ``(edge_host, edge, feat)`` mesh for programs that want to address the
    DCN and ICI slices of the edge dimension separately
    (``P((EDGE_HOST_AXIS, EDGE_AXIS))`` shards edges across both).
    Single-process callers get the ordinary mesh (dcn axis size 1), so the
    same code runs in CI and on a pod.
    """
    from jax.experimental import mesh_utils

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    n_proc = max(1, jax.process_count())
    if n_edge_dcn is None:
        n_edge_dcn = n_proc
    if n_edge_ici is None:
        if (n // n_edge_dcn) % n_feat:
            raise ValueError(f"{n} devices / {n_edge_dcn} hosts not "
                             f"divisible by feat={n_feat}")
        n_edge_ici = n // n_edge_dcn // n_feat
    if n_edge_dcn * n_edge_ici * n_feat != n:
        raise ValueError(f"pod mesh {n_edge_dcn}x{n_edge_ici}x{n_feat} != "
                         f"{n} devices")
    if n_proc > 1:
        # DCN granule: TPU pods expose slice_index (DCN connects slices);
        # when slices don't match the requested dcn axis (multi-host CPU CI,
        # single-slice multi-process) the process is the granule
        n_slices = len({getattr(d, "slice_index", 0) or 0 for d in devices})
        arr = mesh_utils.create_hybrid_device_mesh(
            (n_edge_ici, n_feat), (n_edge_dcn, 1), devices=devices,
            process_is_granule=(n_slices != n_edge_dcn))
    else:
        arr = np.asarray(devices).reshape(n_edge_dcn * n_edge_ici, n_feat)
    if hierarchical:
        return Mesh(arr.reshape(n_edge_dcn, n_edge_ici, n_feat),
                    (EDGE_HOST_AXIS, EDGE_AXIS, FEAT_AXIS))
    return Mesh(arr.reshape(n_edge_dcn * n_edge_ici, n_feat),
                (EDGE_AXIS, FEAT_AXIS))


def shard_graph_local(local: Graph, mesh: Mesh, n_edges_global: int,
                      n_nodes: int) -> Graph:
    """Assemble the globally edge-sharded Graph from *per-process* edge
    shards — no host ever holds the full edge list.

    ``local`` carries this process' contiguous slice of the
    destination-sorted, pre-padded global edge list (every process must
    pass the same ``n_edges_global``, a multiple of the edge-axis size).
    Single-process callers may use :func:`.dist.shard_graph` instead.
    """
    if n_edges_global % mesh.shape[EDGE_AXIS]:
        raise ValueError("global edge count must divide the edge axis "
                         "(pad with pad_graph first)")
    sh = NamedSharding(mesh, P(EDGE_AXIS))

    def _global(x, dtype):
        x = np.asarray(x, dtype)
        return jax.make_array_from_process_local_data(
            sh, x, global_shape=(n_edges_global,))

    return Graph(
        row=_global(local.row, np.int32),
        col=_global(local.col, np.int32),
        val=_global(local.val, np.float32),
        n_nodes=n_nodes,
        num_self_loop=local.num_self_loop,
        sorted_by_row=local.sorted_by_row,
    )
