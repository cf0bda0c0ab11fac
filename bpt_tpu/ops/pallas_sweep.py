"""Pallas TPU kernels: per-tile treelet-sweep traversal (v2 tracers).

Replaces both fetch mechanisms that bounded round-1 performance
(SURVEY.md section 2.2 is the design target; VERDICT r1 item 1 the
motivation):

  * the XLA tile-sweep (accel/binned.py) runs `max-over-ALL-tiles` union
    iterations because its while_loop is global — measured waste vs the
    per-tile mean is 3-8x on the BDPT workloads (benchmarks/
    prof_workload.py);
  * the round-1 Pallas kernels (ops/pallas_trace.py) fetch triangle
    blocks with a one-hot matmul against the whole (NT, 9K) table, i.e.
    O(NT*9K) MXU work per iteration regardless of how little is needed.

Here each grid step owns one tile of S rays and:

  1. computes the EXACT (S, NT) ray x treelet slab mask in VMEM (no HBM
     traffic — the XLA path materializes conservative per-tile-AABB
     lists instead precisely because the exact mask would round-trip
     HBM);
  2. loops over the tile's own union of overlapped treelets (argmax /
     argmin extraction from a carried (1, NT) row), fetching each
     treelet's packed triangle block from the VMEM-resident table with a
     dynamic slice — O(9K) per fetch, no matmul;
  3. exits as soon as the tile is done: for any-hit when every live lane
     is occluded or exhausted; for closest-hit when no lane's remaining
     nearest entry distance can beat its current best (the classic
     front-to-back pruning, per lane).

Intersection semantics identical to accel/traverse.py (Moeller-Trumbore,
|det| >= EPSILON, t > T_MIN_HIT, t in [min_t, max_t]; reference:
src/core/core.h:379-400, accel.h:43).  Degenerate rays (max_t < min_t)
have empty masks and cost nothing beyond the slab matrix — callers mask
dead lanes that way (integrators/bdpt.py `_visible`).
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

# Swept on the real caustic bench (v5e, r2): 128 beat 256 by 9% and 512
# by 22%; 64 compiled pathologically slowly.  J=4 and J=8 tied.
TILE = int(os.environ.get("BPT_SWEEP_TILE", "128"))
# treelet blocks fetched per any-kernel loop iteration.  r5 A/B on the
# caustic bench (v5e): J=8 5.29M > J=4 5.12M rays/s (the loop is
# iteration-overhead-bound; J=16 and tile=256 were also measured — see
# RESULTS_r05.md).  Any-table K stayed 128: K=64 lost 7% (2x the
# argmax/fetch overhead), K=32 lost 2x.
ANY_J = int(os.environ.get("BPT_SWEEP_ANY_J", "8"))
# treelet blocks fetched per closest-kernel loop iteration.  J=1: J>1
# compiles pathologically slowly on Mosaic (>9min) and this kernel lost
# the in-render closest A/B to the one-hot kernel anyway (unrouted).
CLOSEST_J = int(os.environ.get("BPT_SWEEP_CLOSEST_J", "1"))


def _compiler_params():
    if pltpu is None:
        return {}
    try:
        cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except AttributeError:  # older jax
        cp = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return {"compiler_params": cp}


def _unpack_rays(rays_ref):
    """One packed (1, 8, S) block -> 8 (S, 1) columns.

    Packing all per-tile ray operands into a single BlockSpec fetch
    replaces eight tiny per-tile DMAs with one, which is most of a
    tile's fixed cost when unions are small."""
    r = rays_ref[0]  # (8, S)
    s = r.shape[-1]

    def col(c):
        return r[c, :].reshape(s, 1)

    o = (col(0), col(1), col(2))
    d = (col(3), col(4), col(5))
    return o, d, col(6), col(7)


def _slab(bmin_ref, bmax_ref, o, d, mnt, mxt, nt):
    """Exact (S, NT) slab mask + entry distances, all in VMEM.

    o/d/mnt/mxt: (S, 1) columns.  Returns (mask, entry) where entry is
    max(tnear, 0) for overlapped entries and +inf elsewhere."""
    s = o[0].shape[0]
    tiny = 1e-20

    tnear = jnp.full((s, nt), -jnp.inf, jnp.float32)
    tfar = jnp.full((s, nt), jnp.inf, jnp.float32)
    for axis in range(3):
        dc = d[axis]
        ic = jnp.where(dc < 0, -1.0, 1.0) / jnp.maximum(jnp.abs(dc), tiny)
        t1 = (bmin_ref[axis, :][None, :] - o[axis]) * ic
        t2 = (bmax_ref[axis, :][None, :] - o[axis]) * ic
        tnear = jnp.maximum(tnear, jnp.minimum(t1, t2))
        tfar = jnp.minimum(tfar, jnp.maximum(t1, t2))
    mask = (tfar >= tnear) & (tnear <= mxt) & (tfar >= mnt)
    entry = jnp.where(mask, jnp.maximum(tnear, 0.0), jnp.inf)
    return mask, entry


def _mt_tile(blk, o, d, k):
    """Moeller-Trumbore of one treelet block against the tile.

    blk: (9, K) fetched rows (v0xyz, e1xyz, e2xyz); o/d: (S, 1) columns.
    Returns (ok, t, u, v) each (S, K)."""
    def row(c):
        return blk[c, :][None, :]

    v0x, v0y, v0z = row(0), row(1), row(2)
    e1x, e1y, e1z = row(3), row(4), row(5)
    e2x, e2y, e2z = row(6), row(7), row(8)
    ox, oy, oz = o
    dx, dy, dz = d

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
    return ok, tt, uu, vv


def _any_loop(bmin_ref, bmax_ref, blk_ref, o, d, mnt, mxt, dead, occ0,
              nt, k):
    """Union sweep over one resident table (NT treelets): returns the
    (S, 1) occlusion flags, starting from occ0 (non-zero entries are
    already-settled lanes — they are excluded from the union).

    The tile union is RECOMPUTED from the still-open lanes every
    iteration (r5): a lane settles the moment it is occluded, and its
    treelets leave the union immediately — the r4 version froze the
    union at entry, so one early-occluded lane's long overlap list kept
    the whole tile sweeping.  Correctness is unaffected: a true in-range
    hit implies slab overlap, so treelets overlapping only settled lanes
    can never change an open lane's result.  The per-iteration masked
    column-max costs ~S*NT flops vs the fetch+MT's ~30*S*J*K — a few
    percent — and cuts iterations wherever occlusion is common (shadow
    rays in closed scenes)."""
    s = o[0].shape[0]
    mask, _ = _slab(bmin_ref, bmax_ref, o, d, mnt, mxt, nt)
    mask_rem = (mask.astype(jnp.float32)
                * (1.0 - jnp.maximum(dead, occ0)))             # (S, NT)
    iota_nt = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)

    def cond(state):
        mask_rem, occ = state
        return jnp.max(mask_rem * (1.0 - occ)) > 0.0

    def body(state):
        mask_rem, occ = state
        # Union over OPEN lanes only (not yet occluded, not dead),
        # weighted by open-lane overlap COUNT: argmax then visits the
        # treelet the most open lanes overlap (greedy max-coverage), so
        # common occluders settle many lanes in the first iterations and
        # the recomputed union collapses fastest.  (r5 A/B vs the 0/1
        # max: see RESULTS_r05.md.)
        um = jnp.sum(mask_rem * (1.0 - occ), axis=0,
                     keepdims=True)                            # (1, NT)
        # J treelets per iteration: divides loop-overhead-bound trips.
        # When fewer remain, duplicates point at already-cleared
        # entries; the extra tests are safe — any true in-range hit
        # implies AABB overlap, so they can only confirm occlusion.
        parts = []
        um_j = um
        keep = jnp.ones((1, nt), jnp.float32)
        for _ in range(ANY_J):
            tau = jnp.argmax(um_j[0, :])
            # (1, 9, K) leading-dim dynamic fetch: Mosaic allows any
            # index on the untiled dim (a row slice at tau*9 needs an
            # 8-aligned sublane offset and fails for K != 128).
            parts.append(blk_ref[pl.ds(tau, 1)].reshape(9, k))
            sel = (iota_nt == tau).astype(jnp.float32)
            um_j = um_j * (1.0 - sel)
            keep = keep * (1.0 - sel)
        blk = jnp.concatenate(parts, axis=1)             # (9, J*K)
        ok, tt, _, _ = _mt_tile(blk, o, d, ANY_J * k)
        ok &= (tt >= mnt) & (tt <= mxt)
        hit = jnp.max(ok.astype(jnp.float32), axis=1, keepdims=True)
        occ = jnp.maximum(occ, hit)
        return mask_rem * keep, occ

    _, occ = jax.lax.while_loop(cond, body, (mask_rem, occ0))
    return occ


def _any_kernel(bmin_ref, bmax_ref, blk_ref, rays_ref, occ_ref,
                *, nt: int, k: int):
    o, d, mnt, mxt = _unpack_rays(rays_ref)
    s = o[0].shape[0]

    # All-dead tiles (every lane degenerate) skip even the slab matrix;
    # live-lane compaction (ops/compaction.py) packs batches so most
    # dead lanes land in such tiles.
    occ_ref[:] = jnp.zeros((1, 1, s), jnp.float32)
    any_live = jnp.max((mxt >= mnt).astype(jnp.float32)) > 0.0

    @pl.when(any_live)
    def _live_tile():
        dead = (mxt < mnt).astype(jnp.float32)                 # (S, 1)
        occ = _any_loop(bmin_ref, bmax_ref, blk_ref, o, d, mnt, mxt,
                        dead, jnp.zeros((s, 1), jnp.float32), nt, k)
        occ_ref[:] = occ.reshape(1, 1, s)


def _any_stream_kernel(bmin_ref, bmax_ref, blk_ref, rays_ref, occ_ref,
                       *, nt: int, k: int):
    """Streaming any-hit: grid = (n_tiles, n_chunks); each step owns one
    (tile, treelet-chunk) pair.  The chunk tables stream through VMEM
    (Pallas double-buffers the varying input blocks) while the per-tile
    occlusion accumulates in the revisited output block — this is the
    beyond-VMEM path for large scenes (VERDICT r2 item 4b)."""
    c = pl.program_id(1)
    o, d, mnt, mxt = _unpack_rays(rays_ref)
    s = o[0].shape[0]

    @pl.when(c == 0)
    def _init():
        occ_ref[:] = jnp.zeros((1, 1, s), jnp.float32)

    occ0 = occ_ref[0, 0, :].reshape(s, 1)
    dead = (mxt < mnt).astype(jnp.float32)
    # Skip the chunk when every lane is degenerate or already occluded.
    any_open = jnp.max(
        (mxt >= mnt).astype(jnp.float32) * (1.0 - occ0)) > 0.0

    @pl.when(any_open)
    def _live():
        occ = _any_loop(bmin_ref, bmax_ref, blk_ref, o, d, mnt, mxt,
                        dead, occ0, nt, k)
        occ_ref[:] = occ.reshape(1, 1, s)


def _closest_kernel(bmin_ref, bmax_ref, blk_ref, tri_ref, rays_ref,
                    out_ref, *, nt: int, k: int):
    o, d, mnt, mxt = _unpack_rays(rays_ref)
    s = o[0].shape[0]

    # Miss defaults; all-dead tiles write them and skip the slab matrix
    # (see _any_kernel / ops/compaction.py).
    miss = jnp.concatenate(
        [jnp.full((s, 1), jnp.inf, jnp.float32),
         jnp.full((s, 1), -1.0, jnp.float32),
         jnp.zeros((s, 2), jnp.float32)], axis=1)
    out_ref[:] = miss.T.reshape(1, 4, s)
    any_live = jnp.max((mxt >= mnt).astype(jnp.float32)) > 0.0

    @pl.when(any_live)
    def _live_tile():
        init = (
            jnp.full((s, 1), jnp.inf, jnp.float32),
            jnp.full((s, 1), -1.0, jnp.float32),
            jnp.zeros((s, 1), jnp.float32),
            jnp.zeros((s, 1), jnp.float32),
        )
        _closest_body(bmin_ref, bmax_ref, blk_ref, tri_ref, out_ref,
                      o, d, mnt, mxt, s, nt, k, init)


def _closest_stream_kernel(bmin_ref, bmax_ref, blk_ref, tri_ref, rays_ref,
                           out_ref, *, nt: int, k: int):
    """Streaming closest-hit: grid = (n_tiles, n_chunks); chunk tables
    stream through VMEM while the per-tile best hit accumulates in the
    revisited output block.  Front-to-back pruning works within each
    chunk, and the carried t_best prunes across chunks (VERDICT r2 item
    4b: the beyond-VMEM large-scene path)."""
    c = pl.program_id(1)
    o, d, mnt, mxt = _unpack_rays(rays_ref)
    s = o[0].shape[0]

    @pl.when(c == 0)
    def _init():
        miss = jnp.concatenate(
            [jnp.full((s, 1), jnp.inf, jnp.float32),
             jnp.full((s, 1), -1.0, jnp.float32),
             jnp.zeros((s, 2), jnp.float32)], axis=1)
        out_ref[:] = miss.T.reshape(1, 4, s)

    any_live = jnp.max((mxt >= mnt).astype(jnp.float32)) > 0.0

    @pl.when(any_live)
    def _live_tile():
        cur = out_ref[0]                                   # (4, S)
        init = tuple(cur[i, :].reshape(s, 1) for i in range(4))
        _closest_body(bmin_ref, bmax_ref, blk_ref, tri_ref, out_ref,
                      o, d, mnt, mxt, s, nt, k, init)


def _closest_body(bmin_ref, bmax_ref, blk_ref, tri_ref, out_ref,
                  o, d, mnt, mxt, s, nt, k, init):
    _, entry = _slab(bmin_ref, bmax_ref, o, d, mnt, mxt, nt)  # (S, NT)
    iota_nt = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)
    iota_jk = jax.lax.broadcasted_iota(jnp.int32, (s, CLOSEST_J * k), 1)

    def cond(state):
        entry_rem, t_best = state[0], state[1]
        # Front-to-back pruning, per lane: a lane still needs work only
        # while its nearest remaining entry is closer than its best hit.
        nearest = jnp.min(entry_rem, axis=1, keepdims=True)   # (S, 1)
        return jnp.max((nearest < t_best).astype(jnp.float32)) > 0.0

    def body(state):
        entry_rem, t_best, tri_best, u_best, v_best = state
        # Visit the tile's J nearest remaining treelets (tile-global
        # front-to-back order); lanes whose entry to an entry can't beat
        # their best skip it via the per-half mask.  Duplicate picks when
        # fewer remain are harmless (their lane_entry is +inf).
        blks, tris, lane_entries = [], [], []
        rem_j = entry_rem
        for _ in range(CLOSEST_J):
            tile_entry = jnp.min(rem_j, axis=0, keepdims=True)  # (1, NT)
            tau = jnp.argmin(tile_entry[0, :])
            blks.append(blk_ref[pl.ds(tau, 1)].reshape(9, k))   # (9, K)
            tris.append(tri_ref[pl.ds(tau, 1), :])              # (1, K)
            # Per-lane entry distance via masked reduce (value-level
            # dynamic_slice does not lower on Mosaic TC).
            sel = iota_nt == tau
            lane_entries.append(jnp.min(
                jnp.where(sel, rem_j, jnp.inf), axis=1, keepdims=True))
            rem_j = jnp.where(sel, jnp.inf, rem_j)
        blk = jnp.concatenate(blks, axis=1)                     # (9, J*K)
        trib = jnp.concatenate(tris, axis=1)                    # (1, J*K)
        ok, tt, uu, vv = _mt_tile(blk, o, d, CLOSEST_J * k)
        lane_entry = jnp.concatenate(
            [jnp.broadcast_to(e, (s, k)) for e in lane_entries],
            axis=1)                                             # (S, J*K)
        ok &= lane_entry < t_best
        t_hi = jnp.minimum(t_best, mxt)
        ok &= (tt >= mnt) & (tt <= t_hi)

        t_m = jnp.where(ok, tt, jnp.inf)
        kk = jnp.argmin(t_m, axis=1)                            # (S,)
        pick = iota_jk == kk[:, None]
        t_new = jnp.min(t_m, axis=1, keepdims=True)             # (S, 1)
        improved = t_new < t_best

        tri_f = jnp.broadcast_to(trib, (s, CLOSEST_J * k))
        sel_tri = jnp.sum(jnp.where(pick, tri_f, 0.0), axis=1,
                          keepdims=True)
        sel_u = jnp.sum(jnp.where(pick, uu, 0.0), axis=1, keepdims=True)
        sel_v = jnp.sum(jnp.where(pick, vv, 0.0), axis=1, keepdims=True)

        t_best = jnp.where(improved, t_new, t_best)
        tri_best = jnp.where(improved, sel_tri, tri_best)
        u_best = jnp.where(improved, sel_u, u_best)
        v_best = jnp.where(improved, sel_v, v_best)
        return rem_j, t_best, tri_best, u_best, v_best

    t0, tri0, u0, v0 = init
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
        cond, body, (entry, t0, tri0, u0, v0))
    out = jnp.concatenate(
        [t_best, tri_best, u_best, v_best], axis=1)  # (S, 4)
    out_ref[:] = out.T.reshape(1, 4, s)


def _pad_tiles(o, d, min_t, max_t, tile):
    """Pad rays to a tile multiple and reshape to (n_tiles, S) rows.

    Pad lanes are degenerate (max_t < min_t): empty slab masks."""
    b_in = o.shape[0]
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

    # (n_tiles, 8, S) packed rays: Mosaic requires the last two block
    # dims to be (8,128)-divisible or equal to the array dims; (1, 8, S)
    # blocks satisfy both clauses, and one block = one DMA per tile.
    packed = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         min_t, max_t], axis=0).reshape(8, n_tiles, tile)
    packed = jnp.swapaxes(packed, 0, 1)  # (n_tiles, 8, S)
    return b_in, n_tiles, packed


def _tables(tg):
    nt, _, k = tg.block.shape
    return (tg.bmin.T, tg.bmax.T, tg.block,
            tg.tri_index.astype(jnp.float32), nt, k)


def sweep_vmem_bytes(tg) -> int:
    """VMEM footprint of the resident tables (lane dim padded to 128;
    the (NT, 9, K) block's sublane dim pads 9 -> 16)."""
    nt, _, k = tg.block.shape
    kp = max(k, 128)
    return (nt * 16 * kp + nt * kp + 2 * 3 * ((nt + 127) // 128) * 128) * 4


def fits_vmem(tg, tile: int = TILE, budget: int = 8 * 1024 * 1024) -> bool:
    nt, _, k = tg.block.shape
    # tables + the (S, NT) mask/entry intermediates (x3 for slack)
    return sweep_vmem_bytes(tg) + 3 * tile * nt * 4 <= budget


def trace_any_sweep(tg, o, d, min_t, max_t, tile: int = TILE,
                    interpret: bool = False) -> jnp.ndarray:
    """Occlusion query; drop-in for accel.binned.trace_any_binned."""
    b_in, n_tiles, packed = _pad_tiles(o, d, min_t, max_t, tile)
    bmin_t, bmax_t, blk, _, nt, k = _tables(tg)

    ray_spec = pl.BlockSpec((1, 8, tile), lambda i: (i, 0, 0))
    occ_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape))

    occ = pl.pallas_call(
        functools.partial(_any_kernel, nt=nt, k=k),
        grid=(n_tiles,),
        in_specs=[full((3, nt)), full((3, nt)), full((nt, 9, k)),
                  ray_spec],
        out_specs=[occ_spec],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32)],
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(bmin_t, bmax_t, blk, packed)[0]
    return occ.reshape(-1)[:b_in] > 0.0


def trace_closest_sweep(tg, o, d, min_t, max_t, tile: int = TILE,
                        interpret: bool = False) -> Hit:
    """Closest hit; drop-in for accel.binned.trace_closest_slots."""
    b_in, n_tiles, packed = _pad_tiles(o, d, min_t, max_t, tile)
    bmin_t, bmax_t, blk, tri, nt, k = _tables(tg)

    ray_spec = pl.BlockSpec((1, 8, tile), lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((1, 4, tile), lambda i: (i, 0, 0))
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape))

    out = pl.pallas_call(
        functools.partial(_closest_kernel, nt=nt, k=k),
        grid=(n_tiles,),
        in_specs=[full((3, nt)), full((3, nt)), full((nt, 9, k)),
                  full((nt, k)), ray_spec],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 4, tile), jnp.float32)],
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(bmin_t, bmax_t, blk, tri, packed)[0]
    t = out[:, 0, :].reshape(-1)[:b_in]
    tri_o = out[:, 1, :].reshape(-1)[:b_in].astype(jnp.int32)
    u = out[:, 2, :].reshape(-1)[:b_in]
    v = out[:, 3, :].reshape(-1)[:b_in]
    return Hit(t=t, tri=tri_o, u=u, v=v, valid=tri_o >= 0)


# ---------------------------------------------------------------------------
# HBM-streaming variants: scenes beyond the VMEM table budget
# ---------------------------------------------------------------------------

# Treelets per streamed chunk.  256 keeps a chunk's tables at ~1.3 MB
# (so two chunks double-buffer comfortably) while amortizing the
# per-chunk slab matrix.
STREAM_NC = int(os.environ.get("BPT_STREAM_NC", "256"))


def _chunked_tables(tg, nc):
    """Tables padded to an NC-multiple treelet count by REPEATING the
    last real treelet.  A duplicate treelet is semantically harmless:
    any-hit finds the same occluders, closest-hit finds the identical
    (t, tri) twice — unlike 'empty AABB' padding, it has no unhittable-
    box edge cases under infinite max_t."""
    nt, _, k = tg.block.shape
    pad = (-nt) % nc
    bmin, bmax, blk, tri = (tg.bmin, tg.bmax, tg.block,
                            tg.tri_index.astype(jnp.float32))
    if pad:
        rep = lambda a: jnp.concatenate(
            [a, jnp.repeat(a[-1:], pad, axis=0)])
        bmin, bmax, blk, tri = rep(bmin), rep(bmax), rep(blk), rep(tri)
    ntp = nt + pad
    return (bmin.T, bmax.T, blk, tri, ntp, k)


def trace_any_stream(tg, o, d, min_t, max_t, tile: int = TILE,
                     chunk_nt: int = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Occlusion query with HBM-streamed treelet chunks (beyond-VMEM
    scenes)."""
    nc = chunk_nt or STREAM_NC
    b_in, n_tiles, packed = _pad_tiles(o, d, min_t, max_t, tile)
    bmin_t, bmax_t, blk, _, ntp, k = _chunked_tables(tg, nc)
    n_chunks = ntp // nc

    ray_spec = pl.BlockSpec((1, 8, tile), lambda i, c: (i, 0, 0))
    occ_spec = pl.BlockSpec((1, 1, tile), lambda i, c: (i, 0, 0))

    occ = pl.pallas_call(
        functools.partial(_any_stream_kernel, nt=nc, k=k),
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((3, nc), lambda i, c: (0, c)),
                  pl.BlockSpec((3, nc), lambda i, c: (0, c)),
                  pl.BlockSpec((nc, 9, k), lambda i, c: (c, 0, 0)),
                  ray_spec],
        out_specs=[occ_spec],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32)],
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(bmin_t, bmax_t, blk, packed)[0]
    return occ.reshape(-1)[:b_in] > 0.0


def trace_closest_stream(tg, o, d, min_t, max_t, tile: int = TILE,
                         chunk_nt: int = None,
                         interpret: bool = False) -> Hit:
    """Closest hit with HBM-streamed treelet chunks (beyond-VMEM
    scenes)."""
    nc = chunk_nt or STREAM_NC
    b_in, n_tiles, packed = _pad_tiles(o, d, min_t, max_t, tile)
    bmin_t, bmax_t, blk, tri, ntp, k = _chunked_tables(tg, nc)
    n_chunks = ntp // nc

    ray_spec = pl.BlockSpec((1, 8, tile), lambda i, c: (i, 0, 0))
    out_spec = pl.BlockSpec((1, 4, tile), lambda i, c: (i, 0, 0))

    out = pl.pallas_call(
        functools.partial(_closest_stream_kernel, nt=nc, k=k),
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((3, nc), lambda i, c: (0, c)),
                  pl.BlockSpec((3, nc), lambda i, c: (0, c)),
                  pl.BlockSpec((nc, 9, k), lambda i, c: (c, 0, 0)),
                  pl.BlockSpec((nc, k), lambda i, c: (c, 0)),
                  ray_spec],
        out_specs=[out_spec],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 4, tile), jnp.float32)],
        interpret=interpret,
        **({} if interpret else _compiler_params()),
    )(bmin_t, bmax_t, blk, tri, packed)[0]
    t = out[:, 0, :].reshape(-1)[:b_in]
    tri_o = out[:, 1, :].reshape(-1)[:b_in].astype(jnp.int32)
    u = out[:, 2, :].reshape(-1)[:b_in]
    v = out[:, 3, :].reshape(-1)[:b_in]
    return Hit(t=t, tri=tri_o, u=u, v=v, valid=tri_o >= 0)
