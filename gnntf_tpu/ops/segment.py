"""Segment reductions beyond segment_sum: the building blocks of graph
attention (segment softmax over incoming edges).  No reference counterpart —
the reference has no attention models; required by BASELINE config 3 (GAT).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_softmax(scores, segment_ids, num_segments, indices_are_sorted=False):
    """Numerically-stable softmax of ``scores`` within each segment.

    scores: [E] or [E, H] (multi-head); segment_ids: [E].
    Segments with no entries contribute nothing; isolated-segment handling
    follows softmax-with-max-subtraction (empty segments never appear in the
    output since output is per-edge).
    """
    seg_max = jax.ops.segment_max(
        scores, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    # segment_max returns -inf for empty segments; those ids are never
    # gathered back (no edges point at them), but guard against NaN anyway.
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = jnp.exp(scores - seg_max[segment_ids])
    denom = jax.ops.segment_sum(
        shifted, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)
    return shifted / jnp.maximum(denom[segment_ids], 1e-30)
