"""Pallas TPU kernel: fused slot-tracer closest-hit traversal.

Fuses the whole per-ray slot traversal of accel/binned.py into one kernel
per ray tile (SURVEY.md section 2.2: "this is the #1 Pallas-kernel
target"):

  * the treelet AABB table and the packed triangle-block matrix live in
    VMEM for the whole kernel (a 36k-triangle scene is ~2.5 MB);
  * the (S, NT) ray x treelet overlap mask is computed once in VMEM;
  * each slot iteration extracts every lane's first remaining overlapped
    treelet (argmax along NT), fetches the blocks for all lanes with a
    one-hot matmul on the MXU (in-VMEM -- the XLA version round-trips a
    ~200MB one-hot through HBM per iteration), intersects densely, and
    updates the running best hit;
  * the loop is a lax.while_loop bounded by the max per-lane overlap
    count.

Intersection semantics identical to accel/traverse.py (reference:
src/core/core.h:379-400, accel.h:43).  Scenes whose treelet tables exceed
the VMEM budget fall back to the XLA path (accel/binned.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is unavailable when targeting CPU interpret mode only
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from ..accel.traverse import Hit
from ..core.math import EPSILON, T_MIN_HIT

import os

TILE = int(os.environ.get("BPT_ONEHOT_TILE", "1024"))
# VMEM budget for the treelet tables (bytes); beyond this the caller should
# use the XLA tracer.
VMEM_TABLE_BUDGET = 8 * 1024 * 1024


def _split3(x):
    """Split f32 into three bf16 parts summing (exactly, in f32) back to x.

    Used for the one-hot block fetch: Mosaic only lowers DEFAULT (1-pass
    bf16, truncates operands) and HIGHEST (6-pass) dot precisions; a
    pre-split table + 3 DEFAULT passes recovers full f32 at half the
    HIGHEST cost, because the one-hot left operand is exact in bf16."""
    x = x.astype(jnp.float32)
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _fetch3(onehot, parts):
    """dot(onehot, x) exactly via the 3 bf16 split parts of x."""
    oh = onehot.astype(jnp.bfloat16)
    out = None
    for p in parts:
        acc = jnp.dot(oh, p, preferred_element_type=jnp.float32)
        out = acc if out is None else out + acc
    return out


def _kernel(bmin_ref, bmax_ref,
            blk_hi_ref, blk_mid_ref, blk_lo_ref,
            tri_hi_ref, tri_mid_ref, tri_lo_ref,
            ox_ref, oy_ref, oz_ref,
            dx_ref, dy_ref, dz_ref, mnt_ref, mxt_ref,
            t_ref, tri_out_ref, u_ref, v_ref, *, nt: int, k: int):
    # 1D f32 operands carry XLA layout T(1024), so the lane block must be a
    # 1024 multiple; VMEM pressure from the (S, NT) intermediates is covered
    # by the raised vmem_limit_bytes below.
    s = ox_ref.shape[0]
    ox = ox_ref[:][:, None]
    oy = oy_ref[:][:, None]
    oz = oz_ref[:][:, None]
    dx = dx_ref[:][:, None]
    dy = dy_ref[:][:, None]
    dz = dz_ref[:][:, None]
    mnt = mnt_ref[:][:, None]
    mxt = mxt_ref[:][:, None]

    # ---- (S, NT) overlap mask ------------------------------------------
    tiny = 1e-20
    def inv(c):
        return jnp.where(c < 0, -1.0, 1.0) / jnp.maximum(jnp.abs(c), tiny)

    tnear = jnp.full((s, nt), -jnp.inf, jnp.float32)
    tfar = jnp.full((s, nt), jnp.inf, jnp.float32)
    for axis, dc in ((0, dx), (1, dy), (2, dz)):
        oc = (ox, oy, oz)[axis]
        ic = inv(dc)
        t1 = (bmin_ref[axis, :][None, :] - oc) * ic
        t2 = (bmax_ref[axis, :][None, :] - oc) * ic
        tnear = jnp.maximum(tnear, jnp.minimum(t1, t2))
        tfar = jnp.minimum(tfar, jnp.maximum(t1, t2))
    mask = (tfar >= tnear) & (tnear <= mxt) & (tfar >= mnt)

    # Ordered traversal: carry the per-(ray, treelet) entry distance with
    # +inf for non-overlapped/visited entries; each iteration visits the
    # NEAREST remaining treelet (argmin), and a lane stops as soon as its
    # best hit is closer than every remaining entry distance -- the
    # classic front-to-back BVH pruning, vectorized.  (f32 carries/argmin:
    # Mosaic legalizes f32 where bool vectors fail.)
    entry = jnp.where(mask, jnp.maximum(tnear, 0.0), jnp.inf)  # (S, NT)

    iota_nt = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)

    blk_parts = (blk_hi_ref[:], blk_mid_ref[:], blk_lo_ref[:])  # (NT, 9K)
    tri_parts = (tri_hi_ref[:], tri_mid_ref[:], tri_lo_ref[:])  # (NT, K)

    def cond(state):
        entry_rem, t_best = state[0], state[1]
        # NOT entry_rem - t_best: inf - inf = nan when a lane has no hit
        # and no remaining treelets.
        nearest = jnp.min(entry_rem, axis=1)
        return jnp.max((nearest < t_best).astype(jnp.float32)) > 0.0

    def body(state):
        entry_rem, t_best, tri_best, u_best, v_best = state
        nearest = jnp.min(entry_rem, axis=1)     # (S,)
        has = nearest < t_best                   # (S,) still work to do
        first = jnp.argmin(entry_rem, axis=1)    # (S,) f32 operand
        onehot_b = (iota_nt == first[:, None]) & has[:, None]
        onehot = onehot_b.astype(jnp.float32)    # (S, NT)
        fetched = _fetch3(onehot, blk_parts)     # (S, 9K) exact f32
        trib = _fetch3(onehot, tri_parts)        # (S, K)

        def comp(c):
            return fetched[:, c * k:(c + 1) * k]

        v0x, v0y, v0z = comp(0), comp(1), comp(2)
        e1x, e1y, e1z = comp(3), comp(4), comp(5)
        e2x, e2y, e2z = comp(6), comp(7), comp(8)

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = jnp.abs(det) >= EPSILON
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        uu = (tx * px + ty * py + tz * pz) * inv_det
        ok &= (uu >= 0.0) & (uu <= 1.0)
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv_det
        ok &= (vv >= 0.0) & (uu + vv <= 1.0)
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok &= tt > T_MIN_HIT
        t_hi = jnp.minimum(t_best[:, None], mxt)
        ok &= (tt >= mnt) & (tt <= t_hi)
        ok &= has[:, None]

        t_m = jnp.where(ok, tt, jnp.inf)
        kk = jnp.argmin(t_m, axis=1)             # (S,)
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (s, k), 1)
        pick = iota_k == kk[:, None]
        t_new = jnp.min(t_m, axis=1)
        improved = t_new < t_best

        def sel(arr):
            return jnp.sum(jnp.where(pick, arr, 0.0), axis=1)

        t_best = jnp.where(improved, t_new, t_best)
        tri_best = jnp.where(improved, sel(trib), tri_best)
        u_best = jnp.where(improved, sel(uu), u_best)
        v_best = jnp.where(improved, sel(vv), v_best)
        entry_rem = jnp.where(onehot_b, jnp.inf, entry_rem)
        return entry_rem, t_best, tri_best, u_best, v_best

    init = (
        entry,
        jnp.full((s,), jnp.inf, jnp.float32),
        jnp.full((s,), -1.0, jnp.float32),
        jnp.zeros((s,), jnp.float32),
        jnp.zeros((s,), jnp.float32),
    )
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
        cond, body, init)

    t_ref[:] = t_best
    tri_out_ref[:] = tri_best.astype(jnp.int32)
    u_ref[:] = u_best
    v_ref[:] = v_best


def fits_vmem(tg) -> bool:
    nt, _, k = tg.block.shape
    return nt * (9 + 1) * k * 4 <= VMEM_TABLE_BUDGET


def trace_closest_pallas(tg, o, d, min_t, max_t, tile: int = TILE,
                         interpret: bool = False) -> Hit:
    """Pallas closest-hit (drop-in for accel.binned.trace_closest_slots)."""
    b_in = o.shape[0]
    nt, _, k = tg.block.shape
    min_t = jnp.broadcast_to(jnp.asarray(min_t, jnp.float32), (b_in,))
    max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (b_in,))
    pad = (-b_in) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], d.dtype),
                         (pad, 1))])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), jnp.float32)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0, jnp.float32)])
    b = b_in + pad
    n_tiles = b // tile

    bmin_t = tg.bmin.T  # (3, NT)
    bmax_t = tg.bmax.T
    blk_parts = _split3(tg.block.reshape(nt, 9 * k))
    tri_parts = _split3(tg.tri_index.astype(jnp.float32))

    lane_spec = pl.BlockSpec((tile,), lambda i: (i,))
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape))

    out_shape = [
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
    ]
    kwargs = {}
    if pltpu is not None and not interpret:
        # The (S, NT) masks + (S, 9K) fetch buffers exceed the compiler's
        # default 16MB scoped-VMEM cap at S=1024; the chip has far more.
        try:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        except AttributeError:  # older jax
            kwargs["compiler_params"] = pltpu.TPUCompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
    t, tri, u, v = pl.pallas_call(
        functools.partial(_kernel, nt=nt, k=k),
        grid=(n_tiles,),
        in_specs=[
            full((3, nt)), full((3, nt)),
            full((nt, 9 * k)), full((nt, 9 * k)), full((nt, 9 * k)),
            full((nt, k)), full((nt, k)), full((nt, k)),
            lane_spec, lane_spec, lane_spec,
            lane_spec, lane_spec, lane_spec,
            lane_spec, lane_spec,
        ],
        out_specs=[lane_spec, lane_spec, lane_spec, lane_spec],
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(bmin_t, bmax_t, *blk_parts, *tri_parts,
      o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
      min_t, max_t)

    return Hit(t=t[:b_in], tri=tri[:b_in], u=u[:b_in], v=v[:b_in],
               valid=tri[:b_in] >= 0)


# ---------------------------------------------------------------------------
# Compact-table variant: per-tile union gather + per-ray loop over it
# ---------------------------------------------------------------------------
#
# The kernel above pays a (S, NT) x (NT, 9K) one-hot matmul PER ITERATION
# (O(NT*9K) MXU work ~13us at NT=366, K=128) times the tile's max
# per-ray overlap count (~14).  Most of that table is never touched by
# the tile: its union of overlapped treelets is ~30-60.  Here each tile
# first COMPACTS its union into a small (U, 9K) table with one cheap
# (U, NT) matmul (one-hot rows built from a cumsum rank), then runs the
# same per-ray front-to-back loop against the compact table — the
# per-iteration matmul shrinks by NT/U (~5.7x).  Unions larger than U
# are handled by an outer loop over rounds of U treelets (rare; entries
# already beaten by t_best prune to nothing).
#
# Entry distances for the pruning order are moved through a 1-pass bf16
# dot (the one-hot columns select single values, truncated to bf16);
# pruning compares with a 1% conservative slack so a truncated entry can
# never wrongly skip a treelet (the slack only costs occasional extra
# tests).  Triangle data stays EXACT: the compact parts are selected
# from the pre-split bf16 hi/mid/lo tables, and one-hot selection of a
# bf16 value is exact.

COMPACT_U = int(os.environ.get("BPT_ONEHOT_U", "128"))
ENTRY_SLACK = 0.99  # conservative bf16-entry prune factor


def _compact_kernel(bmin_ref, bmax_ref,
                    blk_hi_ref, blk_mid_ref, blk_lo_ref,
                    tri_hi_ref, tri_mid_ref, tri_lo_ref,
                    ox_ref, oy_ref, oz_ref,
                    dx_ref, dy_ref, dz_ref, mnt_ref, mxt_ref,
                    t_ref, tri_out_ref, u_ref, v_ref,
                    *, nt: int, k: int, u: int):
    s = ox_ref.shape[0]
    # Miss defaults; all-dead tiles (every lane degenerate) write them
    # and skip the slab matrix + fetch loop entirely.  Live-lane
    # compaction (ops/compaction.py) packs batches so dead lanes cluster
    # into such tiles.
    t_ref[:] = jnp.full((s,), jnp.inf, jnp.float32)
    tri_out_ref[:] = jnp.full((s,), -1, jnp.int32)
    u_ref[:] = jnp.zeros((s,), jnp.float32)
    v_ref[:] = jnp.zeros((s,), jnp.float32)
    any_live = jnp.max(
        (mxt_ref[:] >= mnt_ref[:]).astype(jnp.float32)) > 0.0

    @pl.when(any_live)
    def _live_tile():
        _compact_body(bmin_ref, bmax_ref, blk_hi_ref, blk_mid_ref,
                      blk_lo_ref, tri_hi_ref, tri_mid_ref, tri_lo_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      mnt_ref, mxt_ref, t_ref, tri_out_ref, u_ref, v_ref,
                      nt=nt, k=k, u=u)


def _compact_body(bmin_ref, bmax_ref,
                  blk_hi_ref, blk_mid_ref, blk_lo_ref,
                  tri_hi_ref, tri_mid_ref, tri_lo_ref,
                  ox_ref, oy_ref, oz_ref,
                  dx_ref, dy_ref, dz_ref, mnt_ref, mxt_ref,
                  t_ref, tri_out_ref, u_ref, v_ref,
                  *, nt: int, k: int, u: int):
    s = ox_ref.shape[0]
    ox = ox_ref[:][:, None]
    oy = oy_ref[:][:, None]
    oz = oz_ref[:][:, None]
    dx = dx_ref[:][:, None]
    dy = dy_ref[:][:, None]
    dz = dz_ref[:][:, None]
    mnt = mnt_ref[:][:, None]
    mxt = mxt_ref[:][:, None]

    tiny = 1e-20

    def inv(c):
        return jnp.where(c < 0, -1.0, 1.0) / jnp.maximum(jnp.abs(c), tiny)

    tnear = jnp.full((s, nt), -jnp.inf, jnp.float32)
    tfar = jnp.full((s, nt), jnp.inf, jnp.float32)
    for axis, dc in ((0, dx), (1, dy), (2, dz)):
        oc = (ox, oy, oz)[axis]
        ic = inv(dc)
        t1 = (bmin_ref[axis, :][None, :] - oc) * ic
        t2 = (bmax_ref[axis, :][None, :] - oc) * ic
        tnear = jnp.maximum(tnear, jnp.minimum(t1, t2))
        tfar = jnp.minimum(tfar, jnp.maximum(t1, t2))
    mask = (tfar >= tnear) & (tnear <= mxt) & (tfar >= mnt)
    # Entries as finite values (0 where no overlap) for the bf16 moves;
    # BIG keeps pruning sane for untouched compact slots.
    entry0 = jnp.where(mask, jnp.maximum(tnear, 0.0), 0.0)   # (S, NT)
    mask_f = mask.astype(jnp.float32)

    um0 = jnp.max(mask_f, axis=0, keepdims=True)             # (1, NT)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (nt, u), 1)
    iota_su = jax.lax.broadcasted_iota(jnp.int32, (s, u), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (s, k), 1)

    blk_parts = (blk_hi_ref[:], blk_mid_ref[:], blk_lo_ref[:])
    tri_parts = (tri_hi_ref[:], tri_mid_ref[:], tri_lo_ref[:])

    def outer_cond(state):
        return jnp.max(state[0]) > 0.0

    def _prefix_sum_row(x):
        """Inclusive prefix sum of a (1, N) row via log-step shifts
        (Mosaic has no cumsum lowering)."""
        n = x.shape[1]
        shift = 1
        while shift < n:
            shifted = jnp.concatenate(
                [jnp.zeros((1, shift), x.dtype), x[:, :n - shift]], axis=1)
            x = x + shifted
            shift *= 2
        return x

    def outer_body(state):
        um_rem, t_best, tri_best, u_best, v_best = state
        csum = _prefix_sum_row(um_rem)                       # inclusive
        sel = um_rem * (csum <= float(u))                    # first U set
        rank = csum - 1.0                                    # (1, NT)
        mc = ((rank.T.astype(jnp.int32) == iota_u)
              & (sel.T > 0.0)).astype(jnp.bfloat16)          # (NT, U)

        # Compact tables: exact bf16 parts via one-hot column selection.
        def compact(parts, width):
            outs = []
            for p in parts:
                o32 = jax.lax.dot_general(
                    mc, p, dimension_numbers=((((0,), (0,))), ((), ())),
                    preferred_element_type=jnp.float32)      # (U, width)
                outs.append(o32.astype(jnp.bfloat16))
            return outs

        blkc = compact(blk_parts, 9 * k)
        tric = compact(tri_parts, k)

        # Compact per-lane entries/validity (1-pass bf16, slack-pruned).
        entry_c = jnp.dot(entry0.astype(jnp.bfloat16), mc,
                          preferred_element_type=jnp.float32)  # (S, U)
        valid_c = jnp.dot(mask_f.astype(jnp.bfloat16), mc,
                          preferred_element_type=jnp.float32) > 0.5
        entry_c = jnp.where(valid_c, entry_c, jnp.inf)

        def cond(st):
            e_rem, tb = st[0], st[1]
            nearest = jnp.min(e_rem, axis=1)
            return jnp.max(
                (nearest * ENTRY_SLACK < tb).astype(jnp.float32)) > 0.0

        def body(st):
            e_rem, tb, trib_b, ub, vb = st
            first = jnp.argmin(e_rem, axis=1)                # (S,)
            lane_e = jnp.min(e_rem, axis=1)
            has = lane_e * ENTRY_SLACK < tb
            onehot_b = (iota_su == first[:, None]) & has[:, None]
            onehot = onehot_b.astype(jnp.float32)
            fetched = _fetch3(onehot, blkc)                  # (S, 9K)
            trif = _fetch3(onehot, tric)                     # (S, K)

            def comp(c):
                return fetched[:, c * k:(c + 1) * k]

            v0x, v0y, v0z = comp(0), comp(1), comp(2)
            e1x, e1y, e1z = comp(3), comp(4), comp(5)
            e2x, e2y, e2z = comp(6), comp(7), comp(8)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) >= EPSILON
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            uu = (tx * px + ty * py + tz * pz) * inv_det
            ok &= (uu >= 0.0) & (uu <= 1.0)
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            ok &= (vv >= 0.0) & (uu + vv <= 1.0)
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok &= tt > T_MIN_HIT
            t_hi = jnp.minimum(tb[:, None], mxt)
            ok &= (tt >= mnt) & (tt <= t_hi)
            ok &= has[:, None]

            t_m = jnp.where(ok, tt, jnp.inf)
            kk = jnp.argmin(t_m, axis=1)
            pick = iota_k == kk[:, None]
            t_new = jnp.min(t_m, axis=1)
            improved = t_new < tb

            def sel_(arr):
                return jnp.sum(jnp.where(pick, arr, 0.0), axis=1)

            tb = jnp.where(improved, t_new, tb)
            trib_b = jnp.where(improved, sel_(trif), trib_b)
            ub = jnp.where(improved, sel_(uu), ub)
            vb = jnp.where(improved, sel_(vv), vb)
            e_rem = jnp.where(onehot_b, jnp.inf, e_rem)
            return e_rem, tb, trib_b, ub, vb

        entry_c, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
            cond, body, (entry_c, t_best, tri_best, u_best, v_best))
        um_rem = um_rem * (csum > float(u))   # drop this round's treelets
        return um_rem, t_best, tri_best, u_best, v_best

    init = (
        um0,
        jnp.full((s,), jnp.inf, jnp.float32),
        jnp.full((s,), -1.0, jnp.float32),
        jnp.zeros((s,), jnp.float32),
        jnp.zeros((s,), jnp.float32),
    )
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
        outer_cond, outer_body, init)

    t_ref[:] = t_best
    tri_out_ref[:] = tri_best.astype(jnp.int32)
    u_ref[:] = u_best
    v_ref[:] = v_best


def trace_closest_compact(tg, o, d, min_t, max_t, tile: int = TILE,
                          u: int = None, interpret: bool = False) -> Hit:
    """Compact-table closest hit (drop-in for trace_closest_pallas)."""
    if u is None:
        u = COMPACT_U
    b_in = o.shape[0]
    nt, _, k = tg.block.shape
    min_t = jnp.broadcast_to(jnp.asarray(min_t, jnp.float32), (b_in,))
    max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (b_in,))
    pad = (-b_in) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], d.dtype),
                         (pad, 1))])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), jnp.float32)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0, jnp.float32)])
    b = b_in + pad
    n_tiles = b // tile

    bmin_t = tg.bmin.T
    bmax_t = tg.bmax.T
    blk_parts = _split3(tg.block.reshape(nt, 9 * k))
    tri_parts = _split3(tg.tri_index.astype(jnp.float32))

    lane_spec = pl.BlockSpec((tile,), lambda i: (i,))
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape))

    out_shape = [
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.float32),
    ]
    kwargs = {}
    if pltpu is not None and not interpret:
        try:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        except AttributeError:  # older jax
            kwargs["compiler_params"] = pltpu.TPUCompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
    t, tri, uu, vv = pl.pallas_call(
        functools.partial(_compact_kernel, nt=nt, k=k, u=u),
        grid=(n_tiles,),
        in_specs=[
            full((3, nt)), full((3, nt)),
            full((nt, 9 * k)), full((nt, 9 * k)), full((nt, 9 * k)),
            full((nt, k)), full((nt, k)), full((nt, k)),
            lane_spec, lane_spec, lane_spec,
            lane_spec, lane_spec, lane_spec,
            lane_spec, lane_spec,
        ],
        out_specs=[lane_spec, lane_spec, lane_spec, lane_spec],
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(bmin_t, bmax_t, *blk_parts, *tri_parts,
      o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
      min_t, max_t)

    return Hit(t=t[:b_in], tri=tri[:b_in], u=uu[:b_in], v=vv[:b_in],
               valid=tri[:b_in] >= 0)


def _compact_any_kernel(bmin_ref, bmax_ref,
                        blk_hi_ref, blk_mid_ref, blk_lo_ref,
                        ox_ref, oy_ref, oz_ref,
                        dx_ref, dy_ref, dz_ref, mnt_ref, mxt_ref,
                        occ_ref, *, nt: int, k: int, u: int):
    """Occlusion variant of the compact-table kernel: per-ray loop with
    first-hit early exit over the tile's compacted union (unordered —
    any-hit needs no front-to-back).  Lanes drop out of the loop as soon
    as they find any hit, so iterations = max-over-lanes of
    min(overlap count, first-hit position)."""
    s = ox_ref.shape[0]
    ox = ox_ref[:][:, None]
    oy = oy_ref[:][:, None]
    oz = oz_ref[:][:, None]
    dx = dx_ref[:][:, None]
    dy = dy_ref[:][:, None]
    dz = dz_ref[:][:, None]
    mnt = mnt_ref[:][:, None]
    mxt = mxt_ref[:][:, None]

    tiny = 1e-20

    def inv(c):
        return jnp.where(c < 0, -1.0, 1.0) / jnp.maximum(jnp.abs(c), tiny)

    tnear = jnp.full((s, nt), -jnp.inf, jnp.float32)
    tfar = jnp.full((s, nt), jnp.inf, jnp.float32)
    for axis, dc in ((0, dx), (1, dy), (2, dz)):
        oc = (ox, oy, oz)[axis]
        ic = inv(dc)
        t1 = (bmin_ref[axis, :][None, :] - oc) * ic
        t2 = (bmax_ref[axis, :][None, :] - oc) * ic
        tnear = jnp.maximum(tnear, jnp.minimum(t1, t2))
        tfar = jnp.minimum(tfar, jnp.maximum(t1, t2))
    mask_f = ((tfar >= tnear) & (tnear <= mxt)
              & (tfar >= mnt)).astype(jnp.float32)           # (S, NT)

    um0 = jnp.max(mask_f, axis=0, keepdims=True)             # (1, NT)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (nt, u), 1)
    iota_su = jax.lax.broadcasted_iota(jnp.int32, (s, u), 1)
    blk_parts = (blk_hi_ref[:], blk_mid_ref[:], blk_lo_ref[:])

    def _prefix_sum_row(x):
        n = x.shape[1]
        shift = 1
        while shift < n:
            shifted = jnp.concatenate(
                [jnp.zeros((1, shift), x.dtype), x[:, :n - shift]], axis=1)
            x = x + shifted
            shift *= 2
        return x

    def outer_cond(state):
        um_rem, occ = state
        return (jnp.max(um_rem) > 0.0) & (jnp.min(occ) < 1.0)

    def outer_body(state):
        um_rem, occ = state
        csum = _prefix_sum_row(um_rem)
        sel = um_rem * (csum <= float(u))
        rank = csum - 1.0
        mc = ((rank.T.astype(jnp.int32) == iota_u)
              & (sel.T > 0.0)).astype(jnp.bfloat16)          # (NT, U)

        blkc = []
        for p in blk_parts:
            o32 = jax.lax.dot_general(
                mc, p, dimension_numbers=((((0,), (0,))), ((), ())),
                preferred_element_type=jnp.float32)
            blkc.append(o32.astype(jnp.bfloat16))

        mask_c = jnp.dot((mask_f * sel).astype(jnp.bfloat16), mc,
                         preferred_element_type=jnp.float32)  # (S, U) 0/1
        mask_c = mask_c * (1.0 - occ)

        def cond(st):
            return jnp.max(st[0]) > 0.0

        def body(st):
            m_rem, occ_i = st
            has = jnp.max(m_rem, axis=1) > 0.0
            first = jnp.argmax(m_rem, axis=1)
            onehot_b = (iota_su == first[:, None]) & has[:, None]
            onehot = onehot_b.astype(jnp.float32)
            fetched = _fetch3(onehot, blkc)                  # (S, 9K)

            def comp(c):
                return fetched[:, c * k:(c + 1) * k]

            v0x, v0y, v0z = comp(0), comp(1), comp(2)
            e1x, e1y, e1z = comp(3), comp(4), comp(5)
            e2x, e2y, e2z = comp(6), comp(7), comp(8)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) >= EPSILON
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            uu = (tx * px + ty * py + tz * pz) * inv_det
            ok &= (uu >= 0.0) & (uu <= 1.0)
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            ok &= (vv >= 0.0) & (uu + vv <= 1.0)
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok &= (tt > T_MIN_HIT) & (tt >= mnt) & (tt <= mxt)
            ok &= has[:, None]

            hit = jnp.max(ok.astype(jnp.float32), axis=1, keepdims=True)
            occ_i = jnp.maximum(occ_i, hit)
            m_rem = (m_rem * (1.0 - onehot)) * (1.0 - occ_i)
            return m_rem, occ_i

        _, occ = jax.lax.while_loop(cond, body, (mask_c, occ))
        um_rem = um_rem * (csum > float(u))
        # Fully-occluded tiles skip remaining rounds via outer_cond.
        return um_rem, occ

    init = (um0, jnp.zeros((s, 1), jnp.float32))
    _, occ = jax.lax.while_loop(outer_cond, outer_body, init)
    occ_ref[:] = occ[:, 0]


def trace_any_compact(tg, o, d, min_t, max_t, tile: int = TILE,
                      u: int = None, interpret: bool = False) -> jnp.ndarray:
    """Compact-table occlusion query (drop-in for trace_any_sweep)."""
    if u is None:
        u = COMPACT_U
    b_in = o.shape[0]
    nt, _, k = tg.block.shape
    min_t = jnp.broadcast_to(jnp.asarray(min_t, jnp.float32), (b_in,))
    max_t = jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), (b_in,))
    pad = (-b_in) % tile
    if pad:
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e9, o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], d.dtype),
                         (pad, 1))])
        min_t = jnp.concatenate([min_t, jnp.zeros((pad,), jnp.float32)])
        max_t = jnp.concatenate([max_t, jnp.full((pad,), -1.0, jnp.float32)])
    b = b_in + pad
    n_tiles = b // tile

    bmin_t = tg.bmin.T
    bmax_t = tg.bmax.T
    blk_parts = _split3(tg.block.reshape(nt, 9 * k))

    lane_spec = pl.BlockSpec((tile,), lambda i: (i,))
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape))

    kwargs = {}
    if pltpu is not None and not interpret:
        try:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        except AttributeError:  # older jax
            kwargs["compiler_params"] = pltpu.TPUCompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
    occ = pl.pallas_call(
        functools.partial(_compact_any_kernel, nt=nt, k=k, u=u),
        grid=(n_tiles,),
        in_specs=[
            full((3, nt)), full((3, nt)),
            full((nt, 9 * k)), full((nt, 9 * k)), full((nt, 9 * k)),
            lane_spec, lane_spec, lane_spec,
            lane_spec, lane_spec, lane_spec,
            lane_spec, lane_spec,
        ],
        out_specs=[lane_spec],
        out_shape=[jax.ShapeDtypeStruct((b,), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(bmin_t, bmax_t, *blk_parts,
      o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
      min_t, max_t)[0]
    return occ[:b_in] > 0.0
