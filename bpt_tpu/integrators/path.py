"""Unidirectional path tracer: implicit and explicit (NEE + MIS) variants.

Wavefront reformulation of the reference path tracer (reference:
src/integrators/path.h), replicating its estimator family:

  * implicit: BSDF-sampling-only recursion (path.h:35-64) including the
    one-sided emitter check `dot(ns, -wi) > 0` (path.h:53);
  * explicit: NEE with the balance heuristic over emitter-area and BSDF
    strategies (path.h:116-195), the 0.95-probability re-roll of BSDF
    samples that land on emitters (path.h:86-103, bounded here by a fixed
    retry count), and Russian roulette in maxDepth==-1 mode
    (path.h:73, 199-202);
  * primary emitter hits return Le directly (path.h:214-217, 231-234).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..accel.api import trace_closest
from ..bsdf import bsdf
from ..core import rng
from ..core.camera import generate_rays
from ..core.math import (
    EPSILON,
    frame_n,
    frame_to_local,
    frame_to_world,
    is_zero_rgb,
    length2,
    normalize,
)
from ..scene.scene import SceneData
from .common import (emission_at, make_interaction,
                     sample_emitter_position, textured_kd)

# Bounded replacement for the reference's unbounded emitter re-roll loop
# (path.h:86-103); P(needing more) decays by 0.95 * P(hit emitter) per try.
MAX_REROLLS = 8


@dataclasses.dataclass(frozen=True)
class PathConfig:
    width: int
    height: int
    spp: int
    is_explicit: bool = True
    max_depth: int = -1       # -1 => Russian roulette mode (path.h:73)
    rr_depth: int = 5
    rr_prob: float = 0.95
    emitter_samples: int = 1
    bsdf_samples: int = 0
    max_bounces: int = 32     # hard cap for RR mode
    near: float = 1.0
    far: float = 1000.0

    @property
    def n_steps(self) -> int:
        if self.max_depth >= 0:
            return self.max_depth
        # maxDepth == -1: explicit mode switches to Russian roulette
        # (path.h:73); the implicit recursion has no RR path and
        # immediately returns black (path.h:36 `depth < -1`).
        return self.max_bounces if self.is_explicit else 0


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    """(reference: path.h:30-33)"""
    f = nf * f_pdf
    g = ng * g_pdf
    return f / jnp.maximum(f + g, 1e-30)


def _direct_illumination(scene, cfg: PathConfig, lkeys, it, active,
                         kd_ov=None):
    """Direct-illumination estimator at one vertex: emitter-strategy +
    BSDF-strategy samples combined by the balance heuristic
    (reference: path.h:116-195). Returns (B, 3)."""
    b = it.p.shape[0]
    total = jnp.zeros((b, 3), jnp.float32)

    # --- emitter samples (path.h:121-154) ---
    em_est = jnp.zeros((b, 3), jnp.float32)
    for i in range(cfg.emitter_samples):
        lk = rng.lane_fold(lkeys, 1000 + i)
        es = sample_emitter_position(scene, lk)
        wi_w = normalize(es.pos - it.p)
        wi_local = frame_to_local(it.frame_ns, wi_w)
        dist2 = jnp.maximum(length2(es.pos - it.p), 1e-20)
        cos_out = jnp.sum(-wi_w * es.normal, axis=-1)
        ok = active & (cos_out > 0.0) & (wi_local[..., 2] > 0.0)

        # The reference checks visibility by closest-hit + shape id match
        # (path.h:134-150).
        hit = trace_closest(scene, it.p, wi_w, EPSILON, jnp.inf)
        hit_shape = scene.shape_id[jnp.maximum(hit.tri, 0)]
        em_shape = scene.emitters.shape_id[es.em_id]
        ok &= hit.valid & (hit_shape == em_shape)

        le = es.radiance
        area_to_solid = cos_out / dist2
        safe_a2s = jnp.where(ok, jnp.maximum(area_to_solid, 1e-20), 1.0)
        bsdf_pdf = bsdf.pdf_bsdf(scene.mat, it.mat_id, it.wo, wi_local,
                                 kd_ov)
        em_pdf_w = es.pos_pdf * es.select_pdf / safe_a2s
        weight = balance_heuristic(
            cfg.emitter_samples, em_pdf_w, cfg.bsdf_samples, bsdf_pdf
        )
        f = bsdf.eval_bsdf(scene.mat, it.mat_id, it.wo, wi_local, kd_ov)
        contrib = (
            weight[..., None] * le * f
            * (safe_a2s / (es.pos_pdf * es.select_pdf))[..., None]
        )
        em_est = em_est + jnp.where(ok[..., None], contrib, 0.0)
    if cfg.emitter_samples > 0:
        total = total + em_est / cfg.emitter_samples

    # --- BSDF samples (path.h:156-192) ---
    bs_est = jnp.zeros((b, 3), jnp.float32)
    for i in range(cfg.bsdf_samples):
        lk = rng.lane_fold(lkeys, 2000 + i)
        u2 = rng.uniform2(rng.lane_fold(lk, rng.BSDF_SAMPLE))
        s = bsdf.sample_bsdf(scene.mat, it.mat_id, it.wo, u2, kd_ov)
        ok = active & ~is_zero_rgb(s.value)
        wi_w = frame_to_world(it.frame_ns, s.wi)
        hit = trace_closest(scene, it.p, wi_w, EPSILON, jnp.inf)
        it2 = make_interaction(scene, wi_w, hit)
        le = emission_at(scene, it2.mat_id)
        ok &= hit.valid & ~is_zero_rgb(le)

        em_id = jnp.maximum(scene.shape_emitter[it2.shape_id], 0)
        n_em = scene.emitters.radiance.shape[0]
        em_area_pdf = 1.0 / scene.emitters.area[em_id]
        em_pdf = 1.0 / n_em
        dist2 = jnp.maximum(length2(it2.p - it.p), 1e-20)
        # Geometric-normal cosine (path.h:179 uses frameNg).
        cos_out = jnp.sum(-wi_w * it2.ng, axis=-1)
        ok &= cos_out > 0.0
        area_to_solid = jnp.where(ok, jnp.maximum(cos_out / dist2, 1e-20),
                                  1.0)
        weight = balance_heuristic(
            cfg.bsdf_samples, s.pdf, cfg.emitter_samples,
            em_pdf * em_area_pdf / area_to_solid,
        )
        safe_pdf = jnp.where(s.pdf > 0, s.pdf, 1.0)
        contrib = weight[..., None] * le * s.value / safe_pdf[..., None]
        bs_est = bs_est + jnp.where(ok[..., None], contrib, 0.0)
    if cfg.bsdf_samples > 0:
        total = total + bs_est / cfg.bsdf_samples

    return total


def render_sample_path(scene: SceneData, cam_consts, cfg: PathConfig, key,
                       pixel_idx):
    """One explicit/implicit path-traced sample per pixel lane.

    Returns (framebuffer contribution (W*H, 3), ray count)."""
    b = pixel_idx.shape[0]
    w, h = cfg.width, cfg.height
    lkeys = rng.lane_keys(key, pixel_idx)

    jitter = None
    if cfg.spp > 1:
        jitter = rng.uniform2(rng.lane_fold(lkeys, rng.PIXEL_JITTER))
    o, d = generate_rays(cam_consts, w, h, pixel_idx, jitter)

    hit = trace_closest(scene, o, d, cfg.near, cfg.far)
    it = make_interaction(scene, d, hit)
    nrays = jnp.int32(b)

    li = jnp.zeros((b, 3), jnp.float32)
    le0 = emission_at(scene, it.mat_id)
    primary_emitter = hit.valid & ~is_zero_rgb(le0)
    # Primary emitter hit: return Le (path.h:214-217, 231-234).
    li = li + jnp.where(primary_emitter[..., None], le0, 0.0)

    alive0 = hit.valid & ~primary_emitter
    throughput0 = jnp.ones((b, 3), jnp.float32)

    def step(carry, depth):
        (it_p, it_wo, it_frame, it_mid, it_tri, it_u, it_v, alive,
         throughput, li, nrays) = carry
        it_cur = _pack_it(scene, it_p, it_wo, it_frame, it_mid, it_tri,
                          it_u, it_v)
        kd = rng.lane_fold(rng.lane_fold(lkeys, rng.EYE_WALK), depth)

        # Depth/RR continuation (path.h:73, 199-202).
        if cfg.max_depth == -1:
            u_rr = rng.uniform1(rng.lane_fold(kd, rng.RR))
            in_rr = depth >= cfg.rr_depth
            cont = (~in_rr) | (u_rr < cfg.rr_prob)
            alive = alive & cont
            rr_scale = jnp.where(in_rr, 1.0 / cfg.rr_prob, 1.0)
        else:
            rr_scale = jnp.ones((b,), jnp.float32)

        kd_ov = textured_kd(scene, it_cur)
        if cfg.is_explicit:
            direct = _direct_illumination(scene, cfg, kd, it_cur, alive,
                                          kd_ov)
            nrays = nrays + jnp.sum(alive) * (
                cfg.emitter_samples + cfg.bsdf_samples)
            li = li + throughput * rr_scale[..., None] * direct

            # Indirect: sample BSDF, re-rolling emitter hits with
            # probability 0.95 (path.h:86-103).
            def reroll(rc, i):
                (best_it, best_val, best_pdf, need, n_used, rngk) = rc
                rki = rng.lane_fold(rngk, i)
                u2 = rng.uniform2(rng.lane_fold(rki, rng.BSDF_SAMPLE))
                s = bsdf.sample_bsdf(scene.mat, it_cur.mat_id, it_cur.wo,
                                     u2, kd_ov)
                wi_w = frame_to_world(it_cur.frame_ns, s.wi)
                h2 = trace_closest(scene, it_cur.p, wi_w, EPSILON,
                                   jnp.inf)
                it2 = make_interaction(scene, wi_w, h2)
                le = emission_at(scene, it2.mat_id)
                hit_emitter = h2.valid & ~is_zero_rgb(le)
                take = need
                new_it = jax.tree_util.tree_map(
                    lambda a, bnew: jnp.where(
                        _bmask(take, a), bnew, a), best_it, it2)
                best_val = jnp.where(take[..., None], s.value, best_val)
                best_pdf = jnp.where(take, s.pdf, best_pdf)
                n_used = n_used + take.astype(jnp.int32)
                u_re = rng.uniform1(rng.lane_fold(rki, rng.RR))
                need = need & hit_emitter & (u_re < 0.95)
                return (new_it, best_val, best_pdf, need, n_used, rngk), None

            init_it = it_cur
            rc0 = (
                init_it,
                jnp.zeros((b, 3), jnp.float32),
                jnp.ones((b,), jnp.float32),
                alive,
                jnp.zeros((b,), jnp.int32),
                rng.lane_fold(kd, 3000),
            )
            (it2, val, pdf, still, n_used, _), _ = jax.lax.scan(
                reroll, rc0, jnp.arange(MAX_REROLLS))
            nrays = nrays + jnp.sum(n_used)

            le2 = emission_at(scene, it2.mat_id)
            ok_ind = (
                alive & it2.valid & is_zero_rgb(le2) & ~is_zero_rgb(val)
                & ~still
            )
            cum_rr = jnp.where(n_used > 1, 0.95, 1.0)
            safe_pdf = jnp.where(pdf > 0, pdf, 1.0)
            scale = (
                val / safe_pdf[..., None]
                / jnp.maximum(n_used, 1)[..., None]
                / cum_rr[..., None]
            )
            throughput = jnp.where(
                ok_ind[..., None],
                throughput * rr_scale[..., None] * scale,
                throughput,
            )
            alive = alive & ok_ind
            return (
                (it2.p, it2.wo, it2.frame_ns, it2.mat_id, it2.tri, it2.u,
                 it2.v, alive, throughput, li, nrays),
                None,
            )
        else:
            # Implicit recursion (path.h:35-64).
            u2 = rng.uniform2(rng.lane_fold(kd, rng.BSDF_SAMPLE))
            s = bsdf.sample_bsdf(scene.mat, it_cur.mat_id, it_cur.wo, u2,
                                 kd_ov)
            wi_w = frame_to_world(it_cur.frame_ns, s.wi)
            h2 = trace_closest(scene, it_cur.p, wi_w, EPSILON, jnp.inf)
            nrays = nrays + jnp.sum(alive)
            it2 = make_interaction(scene, wi_w, h2)
            le = emission_at(scene, it2.mat_id)
            safe_pdf = jnp.where(s.pdf > 0, s.pdf, 1.0)
            factor = s.value / safe_pdf[..., None]
            hit_emitter = h2.valid & ~is_zero_rgb(le)
            # One-sided emitter (path.h:53).
            facing = jnp.sum(frame_n(it2.frame_ns) * -wi_w, axis=-1) > 0.0
            li = li + jnp.where(
                (alive & hit_emitter & facing)[..., None],
                throughput * factor * le,
                0.0,
            )
            throughput = jnp.where(
                alive[..., None], throughput * factor, throughput)
            alive = alive & h2.valid & ~hit_emitter & ~is_zero_rgb(s.value)
            return (
                (it2.p, it2.wo, it2.frame_ns, it2.mat_id, it2.tri, it2.u,
                 it2.v, alive, throughput, li, nrays),
                None,
            )

    if cfg.n_steps > 0:
        init = (it.p, it.wo, it.frame_ns, it.mat_id, it.tri, it.u, it.v,
                alive0, throughput0, li, nrays)
        carry, _ = jax.lax.scan(step, init, jnp.arange(cfg.n_steps))
        li, nrays = carry[-2], carry[-1]

    fb = jnp.zeros((w * h, 3), jnp.float32)
    fb = fb.at[pixel_idx].add(li / cfg.spp)
    return fb, nrays


class _ItLite:
    pass


def _pack_it(scene, p, wo, frame, mid, tri=None, u=None, v=None):
    """Lightweight Interaction view for helpers that only need these."""
    from .common import Interaction

    b = p.shape[0]
    z = jnp.zeros((b,), jnp.float32)
    return Interaction(
        p=p, t=z,
        u=z if u is None else u,
        v=z if v is None else v,
        tri=jnp.zeros((b,), jnp.int32) if tri is None else tri,
        mat_id=mid,
        shape_id=jnp.zeros((b,), jnp.int32),
        frame_ns=frame,
        ng=frame[..., 2, :],
        wo=wo,
        valid=jnp.ones((b,), bool),
    )


def _bmask(mask, like):
    """Broadcast a (B,) mask against `like`'s trailing dims."""
    extra = like.ndim - mask.ndim
    return mask.reshape(mask.shape + (1,) * extra)


@partial(jax.jit, static_argnames=("cfg", "spp_chunk"))
def render_chunk_path(scene: SceneData, cam_consts, cfg: PathConfig, key,
                      spp_chunk: int = 1, sample_offset=0):
    w, h = cfg.width, cfg.height
    pixel_idx = jnp.arange(w * h, dtype=jnp.int32)

    def body(carry, s):
        fb, nrays = carry
        fb_s, nr = render_sample_path(
            scene, cam_consts, cfg,
            jax.random.fold_in(key, sample_offset + s), pixel_idx
        )
        return (fb + fb_s, nrays + nr), None

    (fb, nrays), _ = jax.lax.scan(
        body,
        (jnp.zeros((w * h, 3), jnp.float32), jnp.int32(0)),
        jnp.arange(spp_chunk),
    )
    return fb, nrays


def render_image_path(scene: SceneData, camera, cfg: PathConfig,
                      seed: int = 0, spp_chunk: int = 4):
    cam_consts = camera.device_constants()
    fb = jnp.zeros((cfg.width * cfg.height, 3), jnp.float32)
    total_rays = 0
    key = jax.random.key(seed)
    done = 0
    while done < cfg.spp:
        n = min(spp_chunk, cfg.spp - done)
        fb_c, nr = render_chunk_path(
            scene, cam_consts, cfg, key, n, sample_offset=done
        )
        fb = fb + fb_c
        total_rays += int(nr)
        done += n
    return fb.reshape(cfg.height, cfg.width, 3), total_rays
