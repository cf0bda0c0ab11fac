"""Square -> distribution warps and their pdfs, batched in jnp.

Semantics mirror the reference's Warp namespace (reference:
src/core/math.h:118-268) including its deliberate quirks:
  * uniform-hemisphere pdf is the constant 1/(2*pi) regardless of direction
    (reference math.h:146-151);
  * the concentric-disk mapping uses the reference's "minus" variant for the
    top/bottom triangles (math.h:166-176).
All samplers take u of shape (..., 2) and return (..., 3) directions in the
local frame (+z up), except the 2D warps which return (..., 2).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import INV_FOURPI, INV_PI, INV_TWOPI, PI


def square_to_uniform_sphere(u):
    """(reference: math.h:119-127)"""
    phi = u[..., 0] * (2.0 * PI)
    cos_theta = 1.0 - 2.0 * u[..., 1]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_uniform_sphere_pdf():
    return INV_FOURPI


def square_to_uniform_hemisphere(u):
    """cosTheta = u.y directly (reference: math.h:136-144)."""
    phi = u[..., 0] * (2.0 * PI)
    cos_theta = u[..., 1]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_uniform_hemisphere_pdf(_v=None):
    """Constant 1/(2 pi); the reference ignores its argument
    (math.h:146-151)."""
    return INV_TWOPI


def square_to_uniform_disk_concentric(u):
    """Concentric disk mapping, reference variant (math.h:153-180)."""
    rx = 2.0 * u[..., 0] - 1.0
    ry = 2.0 * u[..., 1] - 1.0
    use_x = (rx * rx) > (ry * ry)
    # Guard divisions; the branch outputs are selected by `use_x` and the
    # degenerate (0,0) case collapses to radius 0 anyway.
    safe_rx = jnp.where(rx == 0.0, 1.0, rx)
    safe_ry = jnp.where(ry == 0.0, 1.0, ry)
    radius = jnp.where(use_x, rx, ry)
    phi = jnp.where(
        use_x,
        (PI * 0.25) * (ry / safe_rx),
        (PI * 0.5) - (PI * 0.25) * (rx / safe_ry),
    )
    both_zero = (rx == 0.0) & (ry == 0.0)
    radius = jnp.where(both_zero, 0.0, radius)
    phi = jnp.where(both_zero, 0.0, phi)
    return jnp.stack([radius * jnp.cos(phi), radius * jnp.sin(phi)], axis=-1)


def square_to_cosine_hemisphere(u):
    """Disk lift (reference: math.h:182-192)."""
    d = square_to_uniform_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(d * d, axis=-1), 0.0))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    """cos(theta)/pi for z >= 0 else 0 (reference: math.h:194-208)."""
    z = v[..., 2]
    return jnp.where(z >= 0.0, z * INV_PI, 0.0)


def square_to_phong_lobe(u, exponent):
    """Modified-Phong lobe sample; cosTheta = u.x^(1/(n+2))
    (reference: math.h:210-219)."""
    cos_theta = jnp.power(u[..., 0], 1.0 / (exponent + 2.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = u[..., 1] * (2.0 * PI)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_phong_lobe_pdf(v, exponent):
    """(n+2)/(2 pi) cos^n(theta) for z >= 0 else 0
    (reference: math.h:221-227).

    Reference quirk, replicated for parity: this is NOT the true density of
    `square_to_phong_lobe` (which is (n+2)/(2 pi) cos^(n+1)); it integrates
    to (n+2)/(n+1) over the hemisphere, not 1.  The reference uses this
    function consistently for both its Phong sample() weights and its MIS
    reverse pdfs, so the bias largely cancels in importance weights but is
    part of the estimator's definition."""
    z = v[..., 2]
    return jnp.where(
        z >= 0.0,
        (exponent + 2.0) * INV_TWOPI * jnp.power(jnp.maximum(z, 0.0), exponent),
        0.0,
    )


def square_to_uniform_triangle(u):
    """Uniform barycentric (u, v) on a triangle (reference: math.h:229-234)."""
    a = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))
    return jnp.stack([1.0 - a, a * u[..., 1]], axis=-1)


def square_to_uniform_cone(u, cos_theta_max):
    """(reference: math.h:236-245)"""
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    phi = u[..., 1] * (2.0 * PI)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_uniform_cone_pdf(cos_theta_max):
    """(reference: math.h:247-254)"""
    return INV_TWOPI / (1.0 - cos_theta_max)
