"""SpMM roofline harness (BASELINE north star: fraction of the bandwidth
bound achieved per chip).

Measures the default segment-sum SpMM on an ogbn-arxiv-scale synthetic
graph, amortizing dispatch with a fori_loop chain and ending with a real
device fetch (see documentation/performance.md on measurement discipline),
then reports the achieved fraction of the HBM-bandwidth bound under the
minimal-traffic model (one random source-row read per edge + one output
write).

Run: python experiments/roofline.py [n_nodes n_edges features iters]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from gnntf_tpu.data.synthetic import random_power_law_edges
from gnntf_tpu.graph import from_edges
from gnntf_tpu.ops import normalize_adjacency
from gnntf_tpu.ops.spmm import spmm
from gnntf_tpu.utils import roofline

args = [int(a) for a in sys.argv[1:]]
N = args[0] if len(args) > 0 else 169_343
E = args[1] if len(args) > 1 else 1_166_243
F = args[2] if len(args) > 2 else 128
K = args[3] if len(args) > 3 else 50

src, dst = random_power_law_edges(N, E, seed=0)
g = from_edges(src, dst, n_nodes=N, directed=False)
normed = jax.jit(lambda g: normalize_adjacency(g, graph_dropout=0.0))(g)
x = jnp.asarray(np.random.RandomState(1).randn(N, F), jnp.float32)


# graph closed over (trace constant) so the auto dispatcher can pick ELL;
# chained timed calls feed the previous output back in (see bench.py)
@partial(jax.jit, static_argnums=1)
def chain(h, k):
    return jax.lax.fori_loop(0, k, lambda i, h: spmm(normed, h), h)


h = chain(x, K)
_ = float(jnp.sum(h))  # compile + warm
t0 = time.perf_counter()
h = chain(h, K)
_ = float(jnp.sum(h))
per_iter = (time.perf_counter() - t0) / K

r = roofline(g.n_edges, F, per_iter)
print(f"device: {jax.devices()[0]}")
print(f"graph: {N} nodes, {g.n_edges} edges, F={F}")
print(f"SpMM: {per_iter*1e3:.2f} ms/iter, {r['edges_per_s']/1e6:.1f} M edges/s")
print(f"traffic model: {r['bytes_moved']/1e9:.2f} GB -> bound "
      f"{r['bound_s']*1e3:.2f} ms")
print(f"roofline fraction: {r['achieved_fraction']*100:.1f}%")
