"""Scene-level tracing dispatch.

Selects the dense binned tracer (accel/binned.py, the fast TPU path) when
the scene carries treelet arrays, falling back to the stackless skip-link
tracer (accel/traverse.py, the correctness reference).  Both implement
identical intersection semantics; tests/test_binned.py enforces agreement.
"""
from __future__ import annotations

import os

from . import binned, traverse

# Closest-hit routes through the fused Pallas kernel (ops/pallas_trace.py)
# on TPU backends when the scene's treelet tables fit in VMEM (~3x faster
# than the XLA slot tracer on v5e).  BPT_PALLAS_TRACE=0 forces the XLA
# path; =1 forces Pallas (e.g. interpret-mode debugging).
_PALLAS_ENV = os.environ.get("BPT_PALLAS_TRACE", "")
# Live-lane compaction before the Pallas tracers (ops/compaction.py).
# Default on for batches of at least _COMPACT_MIN lanes; BPT_COMPACT=0/1
# forces.  The BDPT connection batches it targets are 13-50% live
# (benchmarks/prof_workload.py), and compaction makes their dead tiles
# hit the kernels' all-dead early exit.
_COMPACT_ENV = os.environ.get("BPT_COMPACT", "")
_COMPACT_MIN = 4096


def _use_pallas() -> bool:
    if _PALLAS_ENV in ("0", "1"):
        return _PALLAS_ENV == "1"
    import jax

    return jax.default_backend() == "tpu"


def _use_compact(n_lanes: int) -> bool:
    if _COMPACT_ENV in ("0", "1"):
        return _COMPACT_ENV == "1"
    return n_lanes >= _COMPACT_MIN


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
                if _use_compact(o.shape[0]):
                    from ..ops.compaction import compact_rays, uncompact

                    o_c, d_c, mn_c, mx_c, plan = compact_rays(
                        o, d, min_t, max_t)
                    h = trace_closest_compact(scene.treelets, o_c, d_c,
                                              mn_c, mx_c)
                    import jax.numpy as jnp

                    tri = uncompact(h.tri, plan, -1)
                    return traverse.Hit(
                        t=uncompact(h.t, plan, jnp.inf),
                        tri=tri,
                        u=uncompact(h.u, plan, 0.0),
                        v=uncompact(h.v, plan, 0.0),
                        valid=tri >= 0,
                    )
                return trace_closest_compact(scene.treelets, o, d, min_t,
                                             max_t)
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
            from ..ops.pallas_sweep import fits_vmem as sweep_fits
            from ..ops.pallas_sweep import trace_any_sweep

            if sweep_fits(tg):
                if _use_compact(o.shape[0]):
                    from ..ops.compaction import compact_rays, uncompact

                    o_c, d_c, mn_c, mx_c, plan = compact_rays(
                        o, d, min_t, max_t)
                    occ = trace_any_sweep(tg, o_c, d_c, mn_c, mx_c)
                    return uncompact(occ, plan, False)
                return trace_any_sweep(tg, o, d, min_t, max_t)
        return binned.trace_any_binned(tg, o, d, min_t, max_t)
    return traverse.trace_any(scene.geom, o, d, min_t, max_t)
