"""Normal / Simple / AO / RO integrators.

These are integrator-registry slots in the reference whose render() bodies
were left as TODO stubs returning constants (reference: src/integrators/
normal.h, simple.h, ao.h:18-24, ro.h; SURVEY.md section 2.3).  Here they are
implemented with their intended course semantics so the registry slots carry
real behavior:

  * normal: |shading normal| visualization;
  * simple: direct illumination from the first emitter treated as a point
    light (Scene::getFirstLightPosition/Intensity, renderer.cpp:341-347);
  * ao: cosine-hemisphere ambient occlusion;
  * ro: reflective occlusion, Phong-lobe sampled with a config exponent
    (main.cpp:84-87).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..accel.api import trace_any, trace_closest
from ..bsdf import bsdf
from ..core import rng, warp
from ..core.math import (
    EPSILON,
    INV_PI,
    frame_n,
    frame_to_local,
    frame_to_world,
    length2,
    make_frame,
    normalize,
    reflect_local,
)
from ..scene.scene import SceneData
from .common import make_interaction, textured_kd


@dataclasses.dataclass(frozen=True)
class MiscConfig:
    width: int
    height: int
    spp: int
    integrator: str = "normal"  # normal | simple | ao | ro
    exponent: float = 30.0      # ro (main.cpp:86)
    near: float = 1.0
    far: float = 1000.0


def render_sample_misc(scene: SceneData, first_light_pos,
                       first_light_intensity, cam_consts, cfg: MiscConfig,
                       key, pixel_idx):
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
    ok = hit.valid

    if cfg.integrator == "normal":
        li = jnp.abs(frame_n(it.frame_ns))
    elif cfg.integrator == "simple":
        to_l = first_light_pos - it.p
        d2 = jnp.maximum(length2(to_l), 1e-20)
        wi_w = to_l / jnp.sqrt(d2)[..., None]
        wi_l = frame_to_local(it.frame_ns, wi_w)
        occ = trace_any(scene, it.p, wi_w, EPSILON,
                        jnp.sqrt(d2) - 1e-4)
        kd_ov = textured_kd(scene, it)
        albedo = scene.mat.diffuse[it.mat_id] if kd_ov is None else kd_ov
        li = (
            albedo * INV_PI
            * jnp.maximum(wi_l[..., 2:3], 0.0)
            * first_light_intensity
            / d2[..., None]
        )
        li = jnp.where(occ[..., None], 0.0, li)
    elif cfg.integrator == "ao":
        u2 = rng.uniform2(rng.lane_fold(lkeys, rng.BSDF_SAMPLE))
        wi_l = warp.square_to_cosine_hemisphere(u2)
        wi_w = frame_to_world(it.frame_ns, wi_l)
        occ = trace_any(scene, it.p, wi_w, EPSILON, jnp.inf)
        # cos/pi sampling cancels the cos/pi integrand -> visibility only.
        li = jnp.where(occ[..., None], 0.0, jnp.ones((b, 3), jnp.float32))
    elif cfg.integrator == "ro":
        u2 = rng.uniform2(rng.lane_fold(lkeys, rng.BSDF_SAMPLE))
        lobe = warp.square_to_phong_lobe(u2, cfg.exponent)
        refl_frame = make_frame(reflect_local(it.wo))
        wi_l = frame_to_world(refl_frame, lobe)
        wi_w = frame_to_world(it.frame_ns, wi_l)
        occ = trace_any(scene, it.p, wi_w, EPSILON, jnp.inf)
        pdf = warp.square_to_phong_lobe_pdf(lobe, cfg.exponent)
        # (n+2)/(2pi) cos^n / pdf == 1 for the sampled lobe; weight by the
        # clamped surface cosine.
        vis = jnp.where(occ, 0.0, 1.0)
        li = (vis * jnp.maximum(wi_l[..., 2], 0.0))[..., None] * jnp.ones(
            (b, 3), jnp.float32)
    else:
        raise ValueError(cfg.integrator)

    li = jnp.where(ok[..., None], li, 0.0)
    fb = jnp.zeros((w * h, 3), jnp.float32)
    fb = fb.at[pixel_idx].add(li / cfg.spp)
    return fb, jnp.int32(b)


def render_image_misc(scene: SceneData, meta, camera, cfg: MiscConfig,
                      seed: int = 0):
    import numpy as np

    # First light (reference: Scene::getFirstLight*, renderer.cpp:341-363).
    shape_ids = np.asarray(scene.emitters.shape_id)
    if len(shape_ids) and shape_ids[0] >= 0:
        flp = jnp.asarray(meta.shapes_center[int(shape_ids[0])])
        fli = scene.emitters.radiance[0]
    else:
        flp = jnp.zeros(3, jnp.float32)
        fli = jnp.zeros(3, jnp.float32)

    cam_consts = camera.device_constants()
    key = jax.random.key(seed)
    w, h = cfg.width, cfg.height
    pixel_idx = jnp.arange(w * h, dtype=jnp.int32)

    @jax.jit
    def chunk(k):
        return render_sample_misc(
            scene, flp, fli, cam_consts, cfg, k, pixel_idx)

    fb = jnp.zeros((w * h, 3), jnp.float32)
    total = 0
    for s in range(cfg.spp):
        fb_c, nr = chunk(jax.random.fold_in(key, s))
        fb = fb + fb_c
        total += int(nr)
    return fb.reshape(h, w, 3), total
