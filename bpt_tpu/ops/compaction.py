"""Live-lane compaction for wavefront trace batches.

BDPT's connection batches are mostly dead lanes: the round-2 workload
profile (benchmarks/prof_workload.py) measured 13-30% live lanes in the
all-pairs occlusion sweeps and 25-50% in the NEE / camera-connection
batches, decaying with eye depth.  Dead lanes are marked degenerate
(max_t < min_t) so the tracers give them empty treelet masks — but every
ray tile still pays its full (S, NT) slab matrix and fixed dispatch cost,
because the live lanes are spread thinly over ALL tiles.

`compact_rays` stably partitions the live lanes to the front of the
batch, so the trailing tiles become all-dead — which the Pallas kernels
then skip entirely via their all-dead early exit (`pl.when` guard around
the slab matrix and fetch loop).  The partition is order-preserving
(prefix-sum positions), so the pixel-major ray coherence the sweep
kernels rely on for small treelet unions survives compaction.

Cost: one cumsum, one scatter and one gather over the batch — HBM
bandwidth trivia next to a single slab-matrix pass.

This is the TPU answer to the wavefront compaction the reference gets
for free from its per-pixel recursion (reference: src/core/renderer.cpp
parallel_for over pixels — idle pixels simply return), and the
resolution of SURVEY.md §2.7's "pipeline analog (compaction)" row.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompactPlan(NamedTuple):
    """Mapping between the original batch and its compacted layout."""

    pos: jnp.ndarray    # (B,) int32: compacted index of each original lane
                        # (clamped to 0 for dead lanes; gate with `valid`)
    valid: jnp.ndarray  # (B,) bool: lane was live in the original batch


def compact_rays(o, d, min_t, max_t):
    """Stably pack live lanes (max_t >= min_t) to the batch front.

    Returns (o_c, d_c, min_c, max_c, plan).  Compacted arrays keep the
    original static size B; slots past the live count are the dead lanes
    (gathered whole, so they keep their degenerate max_t < min_t) and
    trailing tiles are all-dead.

    Implementation note: gather-only (one stable argsort + takes).  An
    earlier scatter formulation (`.at[dest].set`) lowered to a serialized
    per-element loop inside the full jitted render pipeline on TPU
    (~1s per 458k-lane call — an 18x end-to-end regression); XLA's sort
    lowers to an efficient vectorized sorting network, and the gathers
    are plain HBM traffic.
    """
    b = o.shape[0]
    min_t = jnp.broadcast_to(jnp.asarray(min_t, jnp.float32), (b,))
    max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (b,))
    valid = max_t >= min_t
    # Stable sort on the dead flag: live lanes first, original order kept
    # on both sides.
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    o_c = jnp.take(o, order, axis=0)
    d_c = jnp.take(d, order, axis=0)
    min_c = jnp.take(min_t, order)
    max_c = jnp.take(max_t, order)
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1   # compacted slot of a
    return o_c, d_c, min_c, max_c, CompactPlan(    # live lane
        jnp.maximum(pos, 0), valid)


def uncompact(x_c, plan: CompactPlan, fill):
    """Gather per-lane results back to the original order.

    x_c: (B, ...) compacted result array; dead lanes receive `fill`.
    """
    out = jnp.take(x_c, plan.pos, axis=0)
    v = plan.valid.reshape(plan.valid.shape + (1,) * (x_c.ndim - 1))
    return jnp.where(v, out, jnp.asarray(fill, x_c.dtype))
