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
the slab matrix and fetch loop).  The partition is order-preserving, so
the pixel-major ray coherence the sweep kernels rely on for small treelet
unions survives compaction.

Implementation (the part that makes it WIN, r4): the ray columns ride the
partition as `jax.lax.sort` PAYLOADS — XLA's sorting network moves them
through VMEM — instead of being gathered through a permutation.  Measured
on the chip at 458k lanes: multi-payload sort 1.95 ms vs argsort + 4
`jnp.take` 17.9 ms (TPU random row-gather sustains <1 GB/s; the r3
argsort-based compaction lost its whole kernel-side win to exactly that,
3.00M vs 4.19M rays/s end-to-end).  Un-compaction is one more sort keyed
by the carried original index (0.54 ms).

This is the TPU answer to the wavefront compaction the reference gets
for free from its per-pixel recursion (reference: src/core/renderer.cpp
parallel_for over pixels — idle pixels simply return), and the
resolution of SURVEY.md §2.7's "pipeline analog (compaction)" row.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompactPlan(NamedTuple):
    """Mapping between the original batch and its compacted layout."""

    orig_idx: jnp.ndarray  # (B,) int32: original index of each compacted
                           # lane (the partition permutation)
    valid: jnp.ndarray     # (B,) bool: lane was live in the ORIGINAL order
    n_chunks: int = 1      # independent sort chunks (see compact_rays)


def _pick_chunks(b: int) -> int:
    """Largest power-of-two chunk count <= 64 that divides b.  Sorting
    (C, B/C) batched beats one (B,) sort: XLA's sorting network is
    O(B log^2 B) with every payload column moved through each stage, so
    64 chunks of an 8.3M-lane mega batch cut the stage count ~45% and
    run as independent rows.  Compaction quality is unaffected for the
    kernels: each chunk's dead lanes pack to its own tail (the all-dead
    early exit skips those tiles either way), and cluster grouping still
    works as long as a chunk holds many tiles — chunks are kept >= 128k
    lanes (~1000 tiles) so the ~256-cluster grouping isn't diluted
    (measured: 4k-lane chunks on the 262k-lane walk batches cost the
    walks stage +0.27 s)."""
    import os
    cap = int(os.environ.get("BPT_COMPACT_CHUNKS", "64"))
    c = cap
    while c > 1 and (b % c or b // c < 128 * 1024):
        c //= 2
    return c


def _segment_cluster(o, end, bounds):
    """Spatial cluster id in [0, 256) for a shadow segment.

    Live lanes sort by cluster before the dead partition, so each ray
    tile sees segments between nearby region pairs and its treelet
    union collapses.  The light endpoint gets the resolution (64 cells):
    light-subpath vertices are spatially RANDOM across lanes (each
    pixel's light walk starts at an independent emitter sample), while
    segment origins (eye vertices) are already pixel-major coherent —
    they get a coarse 2x2x1 split (4 cells) to keep that coherence from
    being destroyed by the endpoint grouping."""
    bmin, bmax = bounds
    inv = 1.0 / jnp.maximum(bmax - bmin, 1e-6)

    def cells(p, n):
        q = jnp.clip(((p - bmin) * inv * n).astype(jnp.int32), 0, n - 1)
        return q

    import os
    shape = os.environ.get("BPT_CLUSTER_SHAPE", "64x4")
    if shape == "256":
        ce = cells(end, 8)                                 # 8x8x4 = 256
        cz = jnp.clip((((end - bmin) * inv)[:, 2] * 4).astype(jnp.int32),
                      0, 3)
        return (ce[:, 0] * 8 + ce[:, 1]) * 4 + cz
    ce = cells(end, 4)                                     # (B, 3)
    c_end = (ce[:, 0] * 4 + ce[:, 1]) * 4 + ce[:, 2]       # [0, 64)
    co = cells(o, 2)
    c_o = co[:, 0] * 2 + co[:, 1]                          # [0, 4)
    return c_end * 4 + c_o


def _ray_cluster(o, d, bounds):
    """Cluster id for a closest-hit ray: origin cell x direction octant.
    Walk bounce rays keep pixel-major origin coherence but scatter in
    direction after a diffuse bounce; octant grouping restores direction
    coherence for the per-tile union.  BPT_RAY_CELLS sets the per-axis
    origin resolution (default 4 -> 512 clusters)."""
    import os
    n = int(os.environ.get("BPT_RAY_CELLS", "4"))
    bmin, bmax = bounds
    inv = 1.0 / jnp.maximum(bmax - bmin, 1e-6)
    q = jnp.clip(((o - bmin) * inv * n).astype(jnp.int32), 0, n - 1)
    c_o = (q[:, 0] * n + q[:, 1]) * n + q[:, 2]            # [0, n^3)
    oct_ = ((d[:, 0] >= 0).astype(jnp.int32) * 4
            + (d[:, 1] >= 0).astype(jnp.int32) * 2
            + (d[:, 2] >= 0).astype(jnp.int32))            # [0, 8)
    return c_o * 8 + oct_, n * n * n * 8


def compact_rays(o, d, min_t, max_t, bounds=None, kind="segment"):
    """Stably pack live lanes (max_t >= min_t) to the batch front.

    Returns (o_c, d_c, min_c, max_c, plan).  Compacted arrays keep the
    original static size B; slots past the live count are the dead lanes
    (moved whole, so they keep their degenerate max_t < min_t) and
    trailing tiles are all-dead.

    Sort-width economies (profiler-driven, r5: the 10-column sort was 68
    ms per 8.3M-lane mega launch — 11% of the whole chunk): the (dead,
    iota) key pair is packed into ONE monotone key (iota, or iota + B
    for dead lanes — same stable partition, orig_idx = key mod B), and
    a scalar min_t (every `_visible` occlusion batch) skips its payload
    column entirely.

    bounds: optional (bmin, bmax) scene AABB.  When given, live lanes
    additionally group by `_segment_cluster` (key = cluster * B + iota,
    uint32 — 257 * 8.4M lanes needs the unsigned range), which costs
    nothing over the existing sort but shrinks the per-tile treelet
    unions the sweep kernels pay for.  Order within a cluster stays
    original (stable).
    """
    b = o.shape[0]
    nc = _pick_chunks(b)
    cs = b // nc
    min_uniform = jnp.ndim(min_t) == 0
    min_b = jnp.broadcast_to(jnp.asarray(min_t, jnp.float32), (b,))
    max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (b,))
    valid = max_t >= min_b
    iota = jnp.arange(b, dtype=jnp.uint32) % jnp.uint32(cs)
    if bounds is not None:
        if kind == "ray":
            cluster, n_cl = _ray_cluster(o, d, bounds)
        else:
            end = o + d * max_t[:, None]
            cluster = _segment_cluster(o, end, bounds)
            n_cl = 256
        assert (n_cl + 1) * cs < 2**32, (n_cl, cs)
        cluster = cluster.astype(jnp.uint32)
        key = jnp.where(valid, cluster * jnp.uint32(cs) + iota,
                        jnp.uint32(n_cl) * jnp.uint32(cs) + iota)
    else:
        key = jnp.where(valid, iota, iota + jnp.uint32(cs))
    cols = [key, o[:, 0], o[:, 1], o[:, 2],
            d[:, 0], d[:, 1], d[:, 2], max_t]
    if not min_uniform:
        cols.append(min_b)
    out = jax.lax.sort([c.reshape(nc, cs) for c in cols], num_keys=1,
                       dimension=1)
    out = [c.reshape(b) for c in out]
    key_s = out[0]
    base = (jnp.arange(b, dtype=jnp.uint32) // jnp.uint32(cs)
            * jnp.uint32(cs))
    orig_idx = (base + key_s % jnp.uint32(cs)).astype(jnp.int32)
    o_c = jnp.stack(out[1:4], axis=-1)
    d_c = jnp.stack(out[4:7], axis=-1)
    mx_c = out[7]
    mn_c = min_b if min_uniform else out[8]
    return o_c, d_c, mn_c, mx_c, CompactPlan(orig_idx, valid, nc)


def _restore(plan: CompactPlan, cols):
    """Sort compacted per-lane columns back to original order (one sort,
    all columns as payloads).  Chunked plans restore per chunk: every
    lane stayed inside its chunk (the partition sort ran per chunk and
    chunk c holds original lanes [c*S, (c+1)*S)), so chunk-local sorts
    by global original index concatenate back in global order."""
    b = plan.orig_idx.shape[0]
    nc = plan.n_chunks
    out = jax.lax.sort(
        [plan.orig_idx.reshape(nc, b // nc)]
        + [c.reshape(nc, b // nc) for c in cols],
        num_keys=1, dimension=1)
    return [c.reshape(b) for c in out[1:]]


def uncompact(x_c, plan: CompactPlan, fill):
    """Restore one compacted per-lane array to the original lane order.

    Dead lanes receive `fill`.  Bool columns (the any-hit occlusion
    flags) pack into the index key itself — ONE sorted column instead of
    key + payload (r5: halves the 21 ms un-compaction of the mega
    launch)."""
    if x_c.dtype == jnp.bool_:
        b = x_c.shape[0]
        packed = plan.orig_idx * 2 + x_c.astype(jnp.int32)
        (s,) = jax.lax.sort([packed.reshape(plan.n_chunks, -1)],
                            num_keys=1, dimension=1)
        x = (s.reshape(b) % 2).astype(jnp.bool_)
        return jnp.where(plan.valid, x, jnp.asarray(fill, jnp.bool_))
    (x,) = uncompact_many((x_c,), plan, (fill,))
    return x


def uncompact_many(xs_c, plan: CompactPlan, fills):
    """Restore several (B,) arrays in ONE payload sort (cheaper than one
    sort each).  Bool arrays round-trip through int32."""
    cols, dtypes = [], []
    for x in xs_c:
        # lax.sort sorts multi-dim payloads along the LAST axis (default
        # dimension=-1), which would silently scramble (B, k) rows; all
        # callers pass (B,) columns — fail loudly if that changes.
        assert x.ndim == 1, (
            f"uncompact_many needs (B,) columns, got shape {x.shape}; "
            "split multi-dim payloads into per-component columns")
        dtypes.append(x.dtype)
        cols.append(x.astype(jnp.int32) if x.dtype == jnp.bool_ else x)
    outs = _restore(plan, cols)
    res = []
    for x, dt, fl in zip(outs, dtypes, fills):
        x = x.astype(dt)
        res.append(jnp.where(plan.valid, x, jnp.asarray(fl, dt)))
    return tuple(res)
