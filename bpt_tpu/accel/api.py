"""Scene-level tracing dispatch.

Routing (fast path first):

  * TPU + treelet tables fit VMEM: fused Pallas kernels — compact-table
    closest hit (ops/pallas_trace.py) and per-tile sweep any-hit
    (ops/pallas_sweep.py), each measured fastest on v5e (r2 A/Bs);
  * TPU + tables beyond the VMEM budget: HBM-streaming sweep kernels
    (chunked treelet tables double-buffered through VMEM — the
    large-scene path, VERDICT r2 item 4b);
  * otherwise: the XLA tracers (accel/binned.py), falling back to the
    stackless skip-link tracer (accel/traverse.py, the correctness
    reference) for scenes without treelet arrays.

All paths implement identical intersection semantics; the test suite
enforces agreement (tests/test_binned.py, test_pallas.py, test_sweep.py,
test_compaction.py).

Live-lane compaction (ops/compaction.py) is OFF by default: it was
A/B'd on the real caustic bench and lost end-to-end (see _use_compact).
BPT_COMPACT=1 re-enables it for experiments.
"""
from __future__ import annotations

import os

from . import binned, traverse

# BPT_PALLAS_TRACE=0 forces the XLA path; =1 forces Pallas (e.g.
# interpret-mode debugging).
_PALLAS_ENV = os.environ.get("BPT_PALLAS_TRACE", "")
# BPT_COMPACT=0/1 forces live-lane compaction off/on.
_COMPACT_ENV = os.environ.get("BPT_COMPACT", "")


def _use_pallas() -> bool:
    if _PALLAS_ENV in ("0", "1"):
        return _PALLAS_ENV == "1"
    import jax

    return jax.default_backend() == "tpu"


def _use_compact() -> bool:
    # Default OFF: the argsort-based lane compaction was A/B'd on the
    # real caustic bench (v5e, r3) and LOST end-to-end — 3.00M rays/s
    # with vs 4.19M without.  The sort+gathers cost ~20ms per 458k-lane
    # call, which exceeds what dead-tile skipping saves because dead
    # lanes already carry empty treelet masks (the per-tile union is
    # driven by live lanes only).  Structural front-packing of light
    # slots was tried in r3/r4 and also lost (integrators/bdpt.py
    # _CONNECT_LAYOUT table).  BPT_COMPACT=1 re-enables for experiments.
    if _COMPACT_ENV in ("0", "1"):
        return _COMPACT_ENV == "1"
    return False


def _compacted_closest(fn, tg, o, d, min_t, max_t) -> traverse.Hit:
    if not _use_compact():
        return fn(tg, o, d, min_t, max_t)
    import jax.numpy as jnp

    from ..ops.compaction import compact_rays, uncompact

    o_c, d_c, mn_c, mx_c, plan = compact_rays(o, d, min_t, max_t)
    h = fn(tg, o_c, d_c, mn_c, mx_c)
    tri = uncompact(h.tri, plan, -1)
    return traverse.Hit(
        t=uncompact(h.t, plan, jnp.inf), tri=tri,
        u=uncompact(h.u, plan, 0.0), v=uncompact(h.v, plan, 0.0),
        valid=tri >= 0)


def _compacted_any(fn, tg, o, d, min_t, max_t):
    if not _use_compact():
        return fn(tg, o, d, min_t, max_t)
    from ..ops.compaction import compact_rays, uncompact

    o_c, d_c, mn_c, mx_c, plan = compact_rays(o, d, min_t, max_t)
    return uncompact(fn(tg, o_c, d_c, mn_c, mx_c), plan, False)


def trace_closest(scene, o, d, min_t, max_t) -> traverse.Hit:
    if getattr(scene, "treelets", None) is not None:
        if _use_pallas():
            from ..ops.pallas_trace import fits_vmem, trace_closest_compact

            if fits_vmem(scene.treelets):
                # Compact-table variant: per-tile union gathered into a
                # small (U, 9K) table once, then the per-ray front-to-back
                # loop fetches from it — measured 31%/19% faster than the
                # full-table one-hot kernel on coherent/incoherent rays
                # (v5e, r2).
                return _compacted_closest(trace_closest_compact,
                                          scene.treelets, o, d, min_t,
                                          max_t)
            from ..ops.pallas_sweep import trace_closest_stream

            return _compacted_closest(trace_closest_stream, scene.treelets,
                                      o, d, min_t, max_t)
        return binned.trace_closest_slots(scene.treelets, o, d, min_t,
                                          max_t)
    return traverse.trace_closest(scene.geom, o, d, min_t, max_t)


def trace_any(scene, o, d, min_t, max_t):
    # Per-tile sweep kernel (ops/pallas_sweep.py) on TPU: exact in-VMEM
    # masks + per-tile early exit beat the XLA tile-sweep (which pays
    # max-over-ALL-tiles union iterations) 3.2x on the all-pairs
    # occlusion workload (measured v5e, K=128 table, r2 sweeps).  A
    # one-hot-matmul any-hit kernel was measured and removed in r2 —
    # its fetch costs O(NT*9K) MXU work per iteration and lost to both.
    if getattr(scene, "treelets", None) is not None:
        tg = getattr(scene, "treelets_any", None) or scene.treelets
        if _use_pallas():
            from ..ops.pallas_sweep import (
                fits_vmem as sweep_fits,
                trace_any_stream,
                trace_any_sweep,
            )

            if sweep_fits(tg):
                return _compacted_any(trace_any_sweep, tg, o, d, min_t,
                                      max_t)
            return _compacted_any(trace_any_stream, tg, o, d, min_t,
                                  max_t)
        return binned.trace_any_binned(tg, o, d, min_t, max_t)
    return traverse.trace_any(scene.geom, o, d, min_t, max_t)
