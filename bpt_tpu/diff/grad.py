"""Differentiable rendering: parameter pytrees, loss, gradients, FD checks.

The estimator is differentiable end-to-end w.r.t. material parameters
(albedo Kd, specular Ks, emission Ke, transmittance Tf) under the
*detached sampling* convention (SURVEY.md section 7): sampling decisions
(BSDF directions, their pdfs, RR, MIS weights) are stopped gradients;
parameter gradients flow through the contribution arithmetic only.  BVH
traversal therefore stays outside the autodiff graph.

Known detached-estimator limitations (documented, matching the plan):
no gradient through the refraction *direction* w.r.t. IOR, and none
through discrete reflect/refract choices (glass.h:96-105 uses Fresnel as
the choice probability).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..integrators.bdpt import BDPTConfig, render_chunk
from ..scene.scene import SceneData

# Material fields exposed as differentiable parameters.
PARAM_FIELDS = ("diffuse", "specular", "emission", "transmittance")


def extract_params(scene: SceneData) -> Dict[str, jnp.ndarray]:
    return {f: getattr(scene.mat, f) for f in PARAM_FIELDS}


def apply_params(scene: SceneData, params: Dict[str, jnp.ndarray]) -> SceneData:
    mat = scene.mat._replace(**params)
    # Rebind emitter radiance to the (possibly updated) material emission so
    # emission gradients flow through light-subpath throughput and NEE, not
    # only the s=0 technique.
    emitters = scene.emitters._replace(
        radiance=mat.emission[scene.emitters.mat_id]
    )
    return scene._replace(mat=mat, emitters=emitters)


def render_with_params(params, scene: SceneData, cam_consts,
                       cfg: BDPTConfig, key, spp_chunk: int):
    """Differentiable forward render (one spp chunk)."""
    fb, _ = render_chunk(apply_params(scene, params), cam_consts, cfg, key,
                         spp_chunk)
    return fb


def image_loss(params, scene, cam_consts, cfg, key, spp_chunk, target_fb):
    fb = render_with_params(params, scene, cam_consts, cfg, key, spp_chunk)
    # Account for rendering only spp_chunk of cfg.spp samples: rescale so
    # the chunk estimates the full-spp image.
    scale = cfg.spp / spp_chunk
    return jnp.mean((fb * scale - target_fb) ** 2)


def loss_and_grad(params, scene, cam_consts, cfg: BDPTConfig, key,
                  spp_chunk, target_fb):
    return jax.value_and_grad(image_loss)(
        params, scene, cam_consts, cfg, key, spp_chunk, target_fb
    )


def finite_difference_check(params, scene, cam_consts, cfg, key, spp_chunk,
                            target_fb, field: str, index, eps: float = 1e-3):
    """Central finite difference of the loss w.r.t. one scalar parameter,
    using the SAME rng key (common random numbers) so the FD is exact for
    the detached estimator (SURVEY.md section 4 item d)."""
    def loss_of(p):
        return image_loss(p, scene, cam_consts, cfg, key, spp_chunk,
                          target_fb)

    def bump(p, delta):
        arr = p[field].at[index].add(delta)
        return {**p, field: arr}

    f_plus = loss_of(bump(params, eps))
    f_minus = loss_of(bump(params, -eps))
    return (f_plus - f_minus) / (2 * eps)
