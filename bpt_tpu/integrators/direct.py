"""Direct-illumination integrator: 5 strategies (area, solidAngle,
cosineHemisphere, bsdf, mis).

Wavefront port of the reference DirectIntegrator (reference:
src/integrators/direct.h), whose emitter sampling is *sphere-specific*:
emitters are approximated by a bounding sphere (center from the shape's
vertex mean, radius from its AABB extent, renderer.cpp:349-358), sampled
uniformly by area (direct.h:96-109) or by subtended solid-angle cone
(direct.h:111-141), with an analytic ray-sphere fallback for visibility
(direct.h:37-69, 304-330).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..accel.api import trace_closest
from ..bsdf import bsdf
from ..core import rng, warp
from ..core.math import (
    EPSILON,
    INV_TWOPI,
    frame_to_local,
    frame_to_world,
    is_zero_rgb,
    length2,
    make_frame,
    normalize,
)
from ..scene.scene import SceneData
from .common import emission_at, make_interaction, textured_kd
from .path import balance_heuristic


@dataclasses.dataclass(frozen=True)
class DirectConfig:
    width: int
    height: int
    spp: int
    strategy: str = "mis"  # mis|area|solidAngle|cosineHemisphere|bsdf
    emitter_samples: int = 1
    bsdf_samples: int = 1
    near: float = 1.0
    far: float = 1000.0


class SphereLights:
    """Host-precomputed bounding-sphere emitter approximations
    (reference: Scene::getShapeCenter/getShapeRadius,
    renderer.cpp:349-358: radius = aabb.max.x - center.x)."""

    def __init__(self, scene: SceneData, meta):
        import numpy as np

        e = int(scene.emitters.radiance.shape[0])
        centers = np.zeros((e, 3), np.float32)
        radii = np.ones(e, np.float32)
        shape_ids = np.asarray(scene.emitters.shape_id)
        for i in range(e):
            sid = int(shape_ids[i])
            if sid >= 0:
                centers[i] = meta.shapes_center[sid]
                radii[i] = (
                    meta.shapes_aabb_max[sid][0] - meta.shapes_center[sid][0]
                )
        self.center = jnp.asarray(centers)
        self.radius = jnp.asarray(radii)


def _ray_sphere_hit(o, d, center, radius, min_t, max_t):
    """Analytic sphere test (reference: direct.h:37-69)."""
    no = o - center
    c = jnp.sum(no * no, axis=-1) - radius * radius
    b = 2.0 * jnp.sum(no * d, axis=-1)
    a = jnp.sum(d * d, axis=-1)
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 1.0 / (2.0 * a)
    r1 = (-b + sq) * inv2a
    r2 = (-b - sq) * inv2a
    inf = jnp.inf
    r1 = jnp.where((r1 > min_t) & (r1 < max_t) & (r1 >= 0), r1, inf)
    r2 = jnp.where((r2 > min_t) & (r2 < max_t) & (r2 >= 0), r2, inf)
    t = jnp.minimum(r1, r2)
    return ok & (t > min_t) & (t < max_t)


def _select_emitter_sphere(scene, lights, u):
    n = scene.emitters.radiance.shape[0]
    em_id = jnp.minimum((u * n).astype(jnp.int32), n - 1)
    return (
        em_id,
        jnp.full_like(u, 1.0 / n),
        lights.center[em_id],
        lights.radius[em_id],
        scene.emitters.radiance[em_id],
        scene.emitters.shape_id[em_id],
    )


def render_sample_direct(scene: SceneData, lights: SphereLights, cam_consts,
                         cfg: DirectConfig, key, pixel_idx):
    from ..core.camera import generate_rays

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

    le0 = emission_at(scene, it.mat_id)
    on_emitter = hit.valid & ~is_zero_rgb(le0)
    shade = hit.valid & ~on_emitter
    lr = jnp.where(on_emitter[..., None], le0, 0.0)
    kd_ov = textured_kd(scene, it)

    def emitter_loop(n_samples, body):
        acc = jnp.zeros((b, 3), jnp.float32)
        for i in range(n_samples):
            acc = acc + body(rng.lane_fold(lkeys, 5000 + i))
        return acc / max(n_samples, 1)

    if cfg.strategy == "area":
        def body(lk):
            u_sel = rng.uniform1(rng.lane_fold(lk, rng.EMITTER_SELECT))
            em_id, em_pdf, c, r, rad, _ = _select_emitter_sphere(
                scene, lights, u_sel)
            u2 = rng.uniform2(rng.lane_fold(lk, rng.EMITTER_POSITION))
            ne = warp.square_to_uniform_sphere(u2)
            pos = ne * r[..., None] + c
            wi_w = normalize(pos - it.p)
            pdf = 1.0 / (4.0 * jnp.pi * r * r)
            dist2 = jnp.maximum(length2(pos - it.p), 1e-20)
            cos_out = jnp.sum(-wi_w * ne, axis=-1)
            wi_l = frame_to_local(it.frame_ns, wi_w)
            ok = shade & (cos_out > 0.0) & (wi_l[..., 2] > 0.0)
            # Shadow ray to just short of the sampled point
            # (direct.h:178).
            occ = trace_closest(
                scene, it.p, wi_w, EPSILON,
                jnp.sqrt(dist2) - EPSILON).valid
            ok &= ~occ
            a2s = cos_out / dist2
            f = bsdf.eval_bsdf(scene.mat, it.mat_id, it.wo, wi_l, kd_ov)
            out = rad * f * (a2s / (pdf * em_pdf))[..., None]
            return jnp.where(ok[..., None], out, 0.0)

        lr = lr + emitter_loop(cfg.emitter_samples, body)

    elif cfg.strategy == "cosineHemisphere":
        def body(lk):
            u2 = rng.uniform2(rng.lane_fold(lk, rng.EMITTER_POSITION))
            wi_l = warp.square_to_cosine_hemisphere(u2)
            wi_w = normalize(frame_to_world(it.frame_ns, wi_l))
            h2 = trace_closest(scene, it.p, wi_w, EPSILON, jnp.inf)
            it2 = make_interaction(scene, wi_w, h2)
            le = emission_at(scene, it2.mat_id)
            ok = shade & h2.valid
            pdf = warp.square_to_cosine_hemisphere_pdf(wi_l)
            safe = jnp.where(pdf > 0, pdf, 1.0)
            f = bsdf.eval_bsdf(scene.mat, it.mat_id, it.wo, wi_l, kd_ov)
            return jnp.where(ok[..., None], le * f / safe[..., None], 0.0)

        lr = lr + emitter_loop(cfg.emitter_samples, body)

    elif cfg.strategy == "bsdf":
        def body(lk):
            u2 = rng.uniform2(rng.lane_fold(lk, rng.BSDF_SAMPLE))
            s = bsdf.sample_bsdf(scene.mat, it.mat_id, it.wo, u2, kd_ov)
            wi_w = frame_to_world(it.frame_ns, s.wi)
            h2 = trace_closest(scene, it.p, wi_w, EPSILON, jnp.inf)
            it2 = make_interaction(scene, wi_w, h2)
            le = emission_at(scene, it2.mat_id)
            ok = shade & h2.valid
            safe = jnp.where(s.pdf > 0, s.pdf, 1.0)
            return jnp.where(ok[..., None], le * s.value / safe[..., None],
                             0.0)

        lr = lr + emitter_loop(cfg.bsdf_samples, body)

    elif cfg.strategy in ("solidAngle", "mis"):
        is_mis = cfg.strategy == "mis"

        def body(lk):
            u_sel = rng.uniform1(rng.lane_fold(lk, rng.EMITTER_SELECT))
            em_id, em_pdf, c, r, rad, em_shape = _select_emitter_sphere(
                scene, lights, u_sel)
            u2 = rng.uniform2(rng.lane_fold(lk, rng.EMITTER_POSITION))
            # Cone sampling toward the bounding sphere (direct.h:111-141).
            center_dir = normalize(c - it.p)
            cone_frame = make_frame(center_dir)
            d2c = jnp.maximum(length2(c - it.p), 1e-20)
            sin2max = r * r / d2c
            cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2max))
            wi_w = frame_to_world(
                cone_frame, warp.square_to_uniform_cone(u2, cos_max))
            pdf = INV_TWOPI / jnp.maximum(1.0 - cos_max, 1e-12)
            wi_l = frame_to_local(it.frame_ns, wi_w)
            ok = shade & (wi_l[..., 2] > 0.0)
            if is_mis:
                # MIS variant: unbounded shadow ray, shape-id check
                # (direct.h:377-381).
                h2 = trace_closest(scene, it.p, wi_w, EPSILON, jnp.inf)
                hit_shape = scene.shape_id[jnp.maximum(h2.tri, 0)]
                vis = h2.valid & (hit_shape == em_shape)
                vis |= ~h2.valid & _ray_sphere_hit(
                    it.p, wi_w, c, r, EPSILON, jnp.inf)
            else:
                # solidAngle variant: shadow ray to center distance + eps
                # (direct.h:304-330).
                maxt = jnp.sqrt(d2c) + EPSILON
                h2 = trace_closest(scene, it.p, wi_w, EPSILON, maxt)
                hit_shape = scene.shape_id[jnp.maximum(h2.tri, 0)]
                vis = h2.valid & (hit_shape == em_shape)
                vis |= ~h2.valid & _ray_sphere_hit(
                    it.p, wi_w, c, r, EPSILON, maxt)
            ok &= vis
            f = bsdf.eval_bsdf(scene.mat, it.mat_id, it.wo, wi_l, kd_ov)
            contrib = rad * f / (pdf * em_pdf)[..., None]
            if is_mis:
                b_pdf = bsdf.pdf_bsdf(scene.mat, it.mat_id, it.wo, wi_l, kd_ov)
                wgt = balance_heuristic(
                    cfg.emitter_samples, pdf * em_pdf, cfg.bsdf_samples,
                    b_pdf)
                contrib = contrib * wgt[..., None]
            return jnp.where(ok[..., None], contrib, 0.0)

        lr = lr + emitter_loop(cfg.emitter_samples, body)

        if is_mis and cfg.bsdf_samples > 0:
            def body_b(lk):
                u2 = rng.uniform2(rng.lane_fold(lk, rng.BSDF_SAMPLE))
                s = bsdf.sample_bsdf(scene.mat, it.mat_id, it.wo, u2, kd_ov)
                wi_w = frame_to_world(it.frame_ns, s.wi)
                h2 = trace_closest(scene, it.p, wi_w, EPSILON, jnp.inf)
                it2 = make_interaction(scene, wi_w, h2)
                le = emission_at(scene, it2.mat_id)
                ok = shade & h2.valid & ~is_zero_rgb(le)
                em_id = jnp.maximum(scene.shape_emitter[it2.shape_id], 0)
                c = lights.center[em_id]
                r = lights.radius[em_id]
                d2c = jnp.maximum(length2(c - it.p), 1e-20)
                sin2max = r * r / d2c
                cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2max))
                em_sa_pdf = INV_TWOPI / jnp.maximum(1.0 - cos_max, 1e-12)
                n_em = scene.emitters.radiance.shape[0]
                em_sa_pdf = em_sa_pdf * (1.0 / n_em)
                wgt = balance_heuristic(
                    cfg.bsdf_samples, s.pdf, cfg.emitter_samples, em_sa_pdf)
                safe = jnp.where(s.pdf > 0, s.pdf, 1.0)
                out = le * s.value * wgt[..., None] / safe[..., None]
                return jnp.where(ok[..., None], out, 0.0)

            acc = jnp.zeros((b, 3), jnp.float32)
            for i in range(cfg.bsdf_samples):
                acc = acc + body_b(rng.lane_fold(lkeys, 6000 + i))
            lr = lr + acc / cfg.bsdf_samples
    else:
        raise ValueError(f"unknown strategy {cfg.strategy!r}")

    fb = jnp.zeros((w * h, 3), jnp.float32)
    fb = fb.at[pixel_idx].add(lr / cfg.spp)
    return fb, nrays


def render_image_direct(scene: SceneData, meta, camera, cfg: DirectConfig,
                        seed: int = 0):
    lights = SphereLights(scene, meta)
    cam_consts = camera.device_constants()
    key = jax.random.key(seed)
    w, h = cfg.width, cfg.height
    pixel_idx = jnp.arange(w * h, dtype=jnp.int32)

    @partial(jax.jit, static_argnames=())
    def chunk(k):
        fb, nr = render_sample_direct(
            scene, lights, cam_consts, cfg, k, pixel_idx)
        return fb, nr

    fb = jnp.zeros((w * h, 3), jnp.float32)
    total = 0
    for s in range(cfg.spp):
        fb_c, nr = chunk(jax.random.fold_in(key, s))
        fb = fb + fb_c
        total += int(nr)
    return fb.reshape(h, w, 3), total
