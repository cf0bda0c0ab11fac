"""Shared integrator machinery: surface interactions, emitter sampling.

Wavefront formulation: every function maps over a (B,)-batch of
pixel-samples ("lanes"); terminated lanes are masked, never compacted out
(static shapes for XLA).  Mirrors the reference Integrator helpers
(reference: src/core/integrator.{h,cpp}).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..accel.api import trace_closest
from ..accel.traverse import Hit
from ..core import rng, warp
from ..core.math import barycentric, frame_to_local, make_frame, normalize
from ..scene.scene import SceneData


class Interaction(NamedTuple):
    """Batched SurfaceInteraction (reference: src/core/core.h:173-180).
    Directions are in the shading frame; `wo` points back along the
    incoming ray."""

    p: jnp.ndarray         # (B, 3)
    t: jnp.ndarray         # (B,)
    u: jnp.ndarray
    v: jnp.ndarray
    tri: jnp.ndarray       # (B,) BVH-order triangle id
    mat_id: jnp.ndarray    # (B,)
    shape_id: jnp.ndarray  # (B,)
    frame_ns: jnp.ndarray  # (B, 3, 3) shading frame rows (s, t, n)
    ng: jnp.ndarray        # (B, 3) geometric normal
    wo: jnp.ndarray        # (B, 3) local outgoing (toward previous vertex)
    valid: jnp.ndarray     # (B,)


def make_interaction(scene: SceneData, d, hit: Hit) -> Interaction:
    """Reconstruct the full surface interaction from a closest-hit record
    (reference: src/core/accel.h:125-172)."""
    tri = jnp.maximum(hit.tri, 0)
    v0 = scene.geom.v0[tri]
    e1 = scene.geom.e1[tri]
    e2 = scene.geom.e2[tri]
    u, v = hit.u, hit.v
    p = v0 + e1 * u[:, None] + e2 * v[:, None]
    n0 = scene.n0[tri]
    n1 = scene.n1[tri]
    n2 = scene.n2[tri]
    ns = normalize(barycentric(n0, n1, n2, u, v))
    frame_ns = make_frame(ns)
    wo = frame_to_local(frame_ns, -d)
    return Interaction(
        p=p,
        t=hit.t,
        u=u,
        v=v,
        tri=tri,
        mat_id=scene.mat_id[tri],
        shape_id=scene.shape_id[tri],
        frame_ns=frame_ns,
        ng=scene.ng[tri],
        wo=wo,
        valid=hit.valid,
    )


class EmitterSample(NamedTuple):
    em_id: jnp.ndarray       # (B,)
    select_pdf: jnp.ndarray  # (B,) 1/numEmitters
    pos: jnp.ndarray         # (B, 3)
    normal: jnp.ndarray      # (B, 3) interpolated shading normal
    pos_pdf: jnp.ndarray     # (B,) 1/emitter.area
    radiance: jnp.ndarray    # (B, 3)


def select_emitter(scene: SceneData, u):
    """Uniform emitter selection (reference: integrator.cpp:46-51)."""
    n = scene.emitters.radiance.shape[0]
    em_id = jnp.minimum((u * n).astype(jnp.int32), n - 1)
    return em_id, jnp.full_like(u, 1.0 / n)


def sample_emitter_position(scene: SceneData, lkeys) -> EmitterSample:
    """selectEmitter + sampleEmitterPosition (reference:
    integrator.cpp:46-51, 73-100): face from the per-emitter area CDF,
    uniform-triangle warp, barycentric position + normal, pdf = 1/area.

    `lkeys` is a (B,) per-lane key array (see core/rng.py)."""
    u_sel = rng.uniform1(rng.lane_fold(lkeys, rng.EMITTER_SELECT))
    em_id, select_pdf = select_emitter(scene, u_sel)

    u_face = rng.uniform1(rng.lane_fold(lkeys, rng.EMITTER_FACE))
    cdf = scene.emitters.face_cdf[em_id]  # (B, F+1)
    # std::upper_bound(cdf, u) - 1 semantics, clamped (math.h:107-111).
    face = jnp.sum(cdf <= u_face[:, None], axis=-1) - 1
    nf = scene.emitters.face_tri.shape[1]
    face = jnp.clip(face, 0, nf - 1)
    tri = scene.emitters.face_tri[em_id, face]

    uv = rng.uniform2(rng.lane_fold(lkeys, rng.EMITTER_POSITION))
    buv = warp.square_to_uniform_triangle(uv)
    bu, bv = buv[..., 0], buv[..., 1]

    v0 = scene.geom.v0[tri]
    e1 = scene.geom.e1[tri]
    e2 = scene.geom.e2[tri]
    pos = v0 + e1 * bu[:, None] + e2 * bv[:, None]
    n = normalize(
        barycentric(scene.n0[tri], scene.n1[tri], scene.n2[tri], bu, bv)
    )
    return EmitterSample(
        em_id=em_id,
        select_pdf=select_pdf,
        pos=pos,
        normal=n,
        pos_pdf=1.0 / scene.emitters.area[em_id],
        radiance=scene.emitters.radiance[em_id],
    )


def emission_at(scene: SceneData, mat_id):
    """getEmission (reference: integrator.cpp:41-44)."""
    return scene.mat.emission[mat_id]


def textured_kd(scene: SceneData, it: Interaction):
    """Per-lane textured diffuse override at an interaction (None when the
    scene has no bitmap textures)."""
    from ..scene.textures import albedo_at

    return albedo_at(scene, it.tri, it.u, it.v)


def primary_trace(scene: SceneData, o, d, near, far):
    hit = trace_closest(scene, o, d, near, far)
    return hit, make_interaction(scene, d, hit)
