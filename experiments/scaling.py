"""Scale-out efficiency harness (BASELINE config 5: edges/s scaling
efficiency 1 chip -> N devices, >= 80% north star).

Measures the three executors — GSPMD edge-sharded segment-sum, explicit
halo-exchange, and ring block-rotation — at 1..N devices on an
ogbn-arxiv-scale graph and reports per-device-count edges/s plus the
scaling efficiency  eff(N) = edges_per_s(N) / (N * edges_per_s(1)).

On a single-host run this exercises the full multi-chip code path on a
virtual CPU mesh (methodology validation; absolute numbers are CPU-bound):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python experiments/scaling.py [n_nodes n_edges features iters]
On a real TPU pod slice the same script measures ICI-backed scaling.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gnntf_tpu.data.synthetic import random_power_law_edges
from gnntf_tpu.graph import from_edges
from gnntf_tpu.ops import normalize_adjacency
from gnntf_tpu.parallel import (build_halo_partition, build_ring_partition,
                                halo_spmm, make_mesh, ring_spmm, shard_graph)
from gnntf_tpu.ops.spmm import spmm_segment

BYTES_MODE = "--bytes" in sys.argv
args = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
N = args[0] if len(args) > 0 else 50_000
E = args[1] if len(args) > 1 else 400_000
F = args[2] if len(args) > 2 else 64
K = args[3] if len(args) > 3 else 10


def bytes_moved_report(g, F, counts):
    """Exact per-device communication bytes per SpMM for each executor,
    computed from the host-built plans (no timing, deterministic).

    GSPMD edge-sharded segment-sum combines (N, F) partial outputs with an
    all-reduce: ~2(P-1)/P * N * F * 4 bytes/device on a ring.  Halo moves
    only boundary rows; ring moves every feature block P-1 times; the
    hierarchical halo splits its traffic into ICI and DCN components."""
    from gnntf_tpu.parallel import build_hier_halo_partition
    fb = F * 4
    print(f"\nper-device bytes moved per SpMM (N={g.n_nodes} E={g.n_edges} "
          f"F={F}):")
    print(f"{'P':>3} {'gspmd':>12} {'ring':>12} {'halo (flat)':>12} "
          f"{'hier ICI':>12} {'hier DCN':>12}")
    for n in counts:
        if n < 2:
            continue
        gspmd = int(2 * (n - 1) / n * g.n_nodes * fb)
        part_r = build_ring_partition(g, n)
        ringb = (n - 1) * part_r.rows_per_part * fb
        part_h = build_halo_partition(g, n)
        halob = (part_h.n_parts * part_h.halo_size
                 + part_h.n_parts * part_h.hub_rows) * fb
        hier = build_hier_halo_partition(g, 2, n // 2) if n % 2 == 0 else None
        if hier is not None:
            ici = (hier.n_chips * (hier.s1 + hier.s3)
                   + (hier.n_parts - hier.n_chips) * hier.hub_rows) * fb
            dcn = hier.n_hosts * hier.s2 * fb \
                + hier.n_chips * hier.hub_rows * fb
            hier_s = f"{ici:>12,} {dcn:>12,}"
        else:
            hier_s = f"{'-':>12} {'-':>12}"
        print(f"{n:>3} {gspmd:>12,} {ringb:>12,} {halob:>12,} {hier_s}")

def projection_report(g, F, counts, per_spmm_ms: float = 3.88):
    """Analytic ICI/DCN time projection from the host-built plans
    (VERDICT r4 item 4) — the communication time each executor would add
    per SpMM on a v5e pod, against the measured single-chip prepared SpMM
    (3.88 ms at the bench shape, documentation/performance.md).

    Bandwidth model (public v5e figures, stated so the projection is
    auditable): ICI ~186 GB/s per chip aggregate (1600 Gbps); DCN ~25
    GB/s per host NIC, hosts = P/8 rounded up (a v5e host carries 8
    chips), total DCN bytes split across host NICs.  Compute/comm overlap
    is NOT assumed (worst case: serial)."""
    from gnntf_tpu.parallel import (build_halo_partition,
                                    build_hier_halo_partition,
                                    build_ring_partition)
    ICI = 186e9
    DCN_PER_HOST = 25e9
    fb = F * 4
    print(f"\nanalytic projection (serial comm, v5e model: ICI 186 GB/s/chip,"
          f" DCN 25 GB/s/host; single-chip SpMM {per_spmm_ms:.2f} ms):")
    print(f"{'P':>3} {'executor':>10} {'ICI ms':>8} {'DCN ms':>8} "
          f"{'comm ms':>8} {'serial eff':>10} {'overlap eff':>11}")
    for n in counts:
        if n < 2:
            continue
        hosts = max(1, n // 8)
        compute = per_spmm_ms / n  # perfectly partitioned compute
        rows = []
        gspmd = 2 * (n - 1) / n * g.n_nodes * fb
        # ring all-reduce on a multi-host ring: reduce-scatter +
        # all-gather each push ~the full payload across every host cut
        gspmd_dcn = (4 * g.n_nodes * fb * (hosts - 1) / hosts
                     if hosts > 1 else 0.0)
        rows.append(("gspmd", gspmd / ICI * 1e3,
                     gspmd_dcn / (hosts * DCN_PER_HOST) * 1e3))
        part_h = build_halo_partition(g, n)
        halo_per_dev = (part_h.halo_size + part_h.hub_rows) * fb
        if hosts > 1:
            # flat all_to_all: ~ (hosts-1)/hosts of each device's halo
            # crosses DCN, concentrated on the host NICs
            dcn_total = part_h.n_parts * part_h.halo_size * fb \
                * (hosts - 1) / hosts
            rows.append(("halo-flat", halo_per_dev / ICI * 1e3,
                         dcn_total / (hosts * DCN_PER_HOST) * 1e3))
        else:
            rows.append(("halo-flat", halo_per_dev / ICI * 1e3, 0.0))
        if n % 8 == 0 and hosts >= 2:
            hier = build_hier_halo_partition(g, hosts, n // hosts)
            ici_per_dev = (hier.s1 + hier.s3 + hier.hub_rows) * fb
            dcn_total = hier.n_hosts * hier.s2 * fb \
                + hier.n_chips * hier.hub_rows * fb / max(1, hier.n_hosts)
            rows.append(("halo-hier", ici_per_dev / ICI * 1e3,
                         dcn_total / (hosts * DCN_PER_HOST) * 1e3))
        part_r = build_ring_partition(g, n)
        ring_per_dev = (n - 1) * part_r.rows_per_part * fb
        # ring neighbor exchanges ride ICI except host-boundary hops
        ring_dcn = ring_per_dev * (2 * (hosts - 1) / n if hosts > 1 else 0)
        rows.append(("ring", ring_per_dev / ICI * 1e3,
                     ring_dcn / DCN_PER_HOST * 1e3))
        for name, ici_ms, dcn_ms in rows:
            comm = ici_ms + dcn_ms
            eff = compute / (compute + comm)
            # halo/ring executors issue the exchange alongside the local
            # aggregation; with perfect overlap the slower of the two wins
            eff_ov = compute / max(compute, comm)
            print(f"{n:>3} {name:>10} {ici_ms:>8.3f} {dcn_ms:>8.3f} "
                  f"{comm:>8.3f} {eff*100:>9.1f}% {eff_ov*100:>10.1f}%")


src, dst = random_power_law_edges(N, E, seed=0)
g = from_edges(src, dst, n_nodes=N, directed=False)
g = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(g)
x0 = jnp.asarray(np.random.RandomState(1).randn(N, F), jnp.float32)
Etot = g.n_edges
devices = jax.devices()
print(f"platform={devices[0].platform} n_devices={len(devices)} "
      f"N={N} E={Etot} F={F} K={K}")
if devices[0].platform == "cpu":
    print("NOTE: virtual CPU devices timeshare one host — efficiency "
          "numbers here validate the code path, not ICI scaling "
          "(expect eff ~ 1/N; measure on a real pod slice).")


def timed(fn, x):
    @jax.jit
    def chain(h):
        return jax.lax.fori_loop(0, K, lambda i, h: fn(h), h)

    h = chain(x)
    _ = float(jnp.sum(h))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        h = chain(h)
        _ = float(jnp.sum(h))
        best = min(best, time.perf_counter() - t0)
    return best / K


counts = [n for n in (1, 2, 4, 8, 16) if n <= len(devices)]
if BYTES_MODE:
    # host-built plans need no devices — extend to pod-scale counts
    bytes_moved_report(g, F, [2, 4, 8, 16, 32, 64])
    projection_report(g, F, [2, 4, 8, 16, 32, 64])
    sys.exit(0)
base = {}
for name in ("halo", "ring"):
    for n in counts:
        mesh = make_mesh(n, 1, devices=devices[:n])
        if name == "halo":
            part = build_halo_partition(g, n)
            fn = lambda h: halo_spmm(part, h, mesh)
        else:
            part = build_ring_partition(g, n)
            fn = lambda h: ring_spmm(part, h, mesh)
        per_iter = timed(fn, x0)
        eps = Etot / per_iter
        if n == 1:
            base[name] = eps
        eff = eps / (n * base[name])
        print(f"{name:5s} n={n:2d}  {per_iter*1e3:8.2f} ms/iter  "
              f"{eps/1e6:9.1f} M edges/s  eff={eff*100:5.1f}%")

# single-device segment-sum anchor
per_iter = timed(lambda h: spmm_segment(g, h), x0)
print(f"single-device segment-sum anchor: {per_iter*1e3:.2f} ms/iter "
      f"{Etot/per_iter/1e6:.1f} M edges/s")
