"""VCM-style recursive MIS bookkeeping, as pure functions.

The vc/vcm recursion (Georgiev, "Implementing Vertex Connection and
Merging", tech report 2012; reference: src/integrators/bdpt.h:274-285,
335-353, 426-479) is the subtlest arithmetic in the renderer.  Keeping it
in pure, scene-free functions lets tests/test_mis.py drive the recursion
along hand-built analytic paths and compare every technique's weight
against a direct balance-heuristic computation — the "weights sum to one"
invariant of SURVEY.md section 4c.

Conventions (identical to the reference):
  * vcm, vc are the partial MIS sums carried along a walk (Eqs. 35-39);
  * `*_pdf_w` are solid-angle pdfs, `*_pdf_a` area pdfs; `rr` factors are
    already folded into the pdfs by the callers;
  * weights are 1 / (1 + sum of other-technique pdf ratios) — the balance
    heuristic evaluated recursively.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "light_walk_init",
    "eye_walk_init",
    "measure_update",
    "bounce_update",
    "weight_s0",
    "weight_s1",
    "weight_connect",
    "weight_t1",
]


def light_walk_init(cos_out, emission_pdf, area_pdf):
    """vc/vcm after sampling the emitter position+direction
    (reference: bdpt.h:173-177).  emission_pdf is the full solid-angle
    emission pdf (dir_pdf_w * pos_pdf_a * select_pdf); area_pdf is
    pos_pdf_a * select_pdf."""
    vc = cos_out / emission_pdf
    vcm = area_pdf / emission_pdf
    return vc, vcm


def eye_walk_init(n_light, t1_pdf):
    """vc/vcm after the camera samples the primary ray
    (reference: bdpt.h:49-62).  n_light = W*H is the reference's
    light-path count; t1_pdf the image-area-to-solid-angle jacobian."""
    vc = jnp.zeros_like(t1_pdf)
    vcm = n_light * (1.0 / t1_pdf)
    return vc, vcm


def measure_update(vc, vcm, dist2, abs_cos_in):
    """Solid-angle -> area measure jacobians applied at each new hit
    (reference: bdpt.h:196-197, 76-77)."""
    return vc / abs_cos_in, vcm * dist2 / abs_cos_in


def bounce_update(vc, vcm, abs_cos_out, pdf_w, prev_rev_pdf_w, delta):
    """vc/vcm recursion across a BSDF bounce (reference: bdpt.h:274-285;
    delta case is Georgiev Eqs. 53-54).  pdf_w includes the RR factor;
    prev_rev_pdf_w is the pdf of sampling the reverse direction (equal to
    pdf_w for delta lobes)."""
    ratio = abs_cos_out / pdf_w
    vc_delta = ratio * (prev_rev_pdf_w * vc)
    vc_smooth = ratio * (vcm + prev_rev_pdf_w * vc)
    vc = jnp.where(delta, vc_delta, vc_smooth)
    vcm = jnp.where(delta, 0.0, 1.0 / pdf_w)
    return vc, vcm


def weight_s0(pos_pdf_a, dir_pdf_w, vc, vcm):
    """s=0: the eye path hit the emitter (reference: bdpt.h:83-118).
    pos_pdf_a is the reference's 1/(area*emitterPdf) quirk value."""
    camera_weight = jnp.nan_to_num(
        pos_pdf_a * vcm + (pos_pdf_a * dir_pdf_w) * vc, nan=jnp.inf)
    return 1.0 / (1.0 + camera_weight)


def weight_s1(light_rev_pdf_w, connect_pdf_w, eye_cur_rev_pdf_a,
              eye_prev_rev_pdf_w, vc, vcm):
    """s=1: next-event estimation (reference: bdpt.h:374-430,
    VCM Eqs. 44-45)."""
    light_weight = jnp.nan_to_num(light_rev_pdf_w / connect_pdf_w,
                                  nan=jnp.inf)
    eye_weight = jnp.nan_to_num(
        eye_cur_rev_pdf_a * (vcm + eye_prev_rev_pdf_w * vc), nan=jnp.inf)
    return 1.0 / (light_weight + 1.0 + eye_weight)


def weight_connect(light_rev_a, light_prev_rev_pdf_w, lv_vc, lv_vcm,
                   eye_rev_a, eye_prev_rev_pdf_w, vc, vcm):
    """s>=2, t>=2 deterministic connection (reference: bdpt.h:434-483,
    VCM Eqs. 40-41)."""
    light_weight = jnp.nan_to_num(
        light_rev_a * (lv_vcm + light_prev_rev_pdf_w * lv_vc), nan=jnp.inf)
    eye_weight = jnp.nan_to_num(
        eye_rev_a * (vcm + eye_prev_rev_pdf_w * vc), nan=jnp.inf)
    return 1.0 / (light_weight + 1.0 + eye_weight)


def weight_t1(reverse_pdf_a, n_light, prev_rev_pdf_w, vc, vcm):
    """t=1: light vertex splatted onto the image plane
    (reference: bdpt.h:335-353, VCM Eqs. 46-47).  The 1/n_light factor is
    the reference's light-path counting quirk."""
    light_weight = jnp.nan_to_num(
        (reverse_pdf_a / n_light) * (vcm + prev_rev_pdf_w * vc),
        nan=jnp.inf)
    return 1.0 / (light_weight + 1.0)
