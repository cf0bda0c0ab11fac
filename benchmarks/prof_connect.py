"""Micro-profile of the s>=2 connect-phase SHADING cost (r4).

The bench's telescoping attribution says the all-pairs stage is ~46% of
wall, of which only ~45% is the occlusion trace — this harness times the
non-trace remainder (BSDF evals/pdfs, frame transforms, MIS recursion,
eye-array tiling) in isolation at the real 458k-lane width, so kernel
work on the connect phase is aimed at measured cost, not guesses.

Run on the chip: python benchmarks/prof_connect.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=10):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _i in range(n):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0 - 0.03) / n


def main():
    from bench import _load_scene
    from bpt_tpu.bsdf import bsdf
    from bpt_tpu.core.math import frame_to_local, make_frame
    from bpt_tpu.integrators import mis as mis_fn
    from bpt_tpu.integrators.bdpt import BDPTConfig, _connect_vertices
    from bpt_tpu.scene.textures import albedo_at

    scene, cam, label = _load_scene()
    w = h = 256
    L = 7
    b = w * h
    lb = L * b
    cfg = BDPTConfig(w, h, spp=16, rr_depth=8)

    key = jax.random.key(3)
    ks = jax.random.split(key, 12)

    def unit(k, n):
        v = jax.random.normal(k, (n, 3))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    # Synthetic but realistically-shaped operands.
    lv_p = jax.random.uniform(ks[0], (lb, 3), minval=-1.0, maxval=1.0)
    lv_ns = unit(ks[1], lb)
    lv_frame = make_frame(lv_ns)
    lv_wo = unit(ks[2], lb)
    lv_thr = jax.random.uniform(ks[3], (lb, 3))
    lv_vcm = jax.random.uniform(ks[4], (lb,))
    lv_vc = jax.random.uniform(ks[5], (lb,))
    lv_rr = jnp.ones((lb,))
    n_mat = scene.mat.diffuse.shape[0]
    lv_mid = jax.random.randint(ks[6], (lb,), 0, n_mat)
    lv_tri = jnp.zeros((lb,), jnp.int32)
    lv_kd = albedo_at(scene, lv_tri, jnp.zeros((lb,)), jnp.zeros((lb,)))
    lv_lane = bsdf.gather_lane(scene.mat, lv_mid, lv_kd)
    lv_valid = jax.random.uniform(ks[7], (lb,)) < 0.3

    from bpt_tpu.integrators.common import make_interaction
    from bpt_tpu.accel.api import trace_closest
    from bpt_tpu.core.camera import generate_rays

    cc = cam.device_constants()
    pix = jnp.arange(b, dtype=jnp.int32)
    o, d = generate_rays(cc, w, h, pix, None)
    hit = jax.jit(lambda o, d: trace_closest(scene, o, d, 1.0, jnp.inf))(
        o, d)
    it_b = make_interaction(scene, d, hit)
    it = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape).reshape(
            (lb,) + a.shape[1:]), it_b)
    eye_lane = bsdf.gather_lane(
        scene.mat, it.mat_id,
        albedo_at(scene, it.tri, it.u, it.v))
    thr = jnp.ones((lb, 3))
    vcm = jnp.ones((lb,))
    vc = jnp.ones((lb,))
    rr = jnp.ones((lb,))
    active = jax.random.uniform(ks[8], (lb,)) < 0.5

    report = {"lanes": lb, "device": str(jax.devices()[0])}

    # Full connect, no occlusion trace (pure shading+MIS+masks).
    f_nc = jax.jit(lambda: _connect_vertices(
        scene, lv_p, lv_frame, lv_wo, lv_thr, lv_vcm, lv_vc, lv_rr,
        lv_lane, lv_valid, it, eye_lane, thr, vcm, vc, rr, active,
        trace_vis=False))
    report["connect_noTrace_ms"] = round(timeit(f_nc) * 1e3, 3)

    # Full connect WITH trace.
    f_tr = jax.jit(lambda: _connect_vertices(
        scene, lv_p, lv_frame, lv_wo, lv_thr, lv_vcm, lv_vc, lv_rr,
        lv_lane, lv_valid, it, eye_lane, thr, vcm, vc, rr, active,
        trace_vis=True))
    report["connect_withTrace_ms"] = round(timeit(f_tr) * 1e3, 3)

    # Isolated BSDF dispatch costs at (lb,) width.
    wi = unit(ks[9], lb)
    wi_l = frame_to_local(lv_frame, wi)
    f_ev = jax.jit(lambda: bsdf.eval_lane(lv_lane, lv_wo, wi_l))
    report["eval_lane_ms"] = round(timeit(f_ev) * 1e3, 3)
    f_pdf = jax.jit(lambda: bsdf.pdf_lane(lv_lane, lv_wo, wi_l))
    report["pdf_lane_ms"] = round(timeit(f_pdf) * 1e3, 3)

    # MIS weight alone.
    f_mis = jax.jit(lambda: mis_fn.weight_connect(
        vcm, vc, lv_vc, lv_vcm, vcm, vc, lv_vc, lv_vcm))
    report["mis_connect_ms"] = round(timeit(f_mis) * 1e3, 3)

    # Eye-array tiling (the tree_map broadcast+reshape in the eye walk).
    def tile_all():
        def te(a):
            return jnp.broadcast_to(
                a[None], (L,) + a.shape).reshape((lb,) + a.shape[1:])
        return jax.tree_util.tree_map(te, (it_b, thr[:b], vcm[:b],
                                           vc[:b], rr[:b]))
    report["tile_eye_ms"] = round(timeit(jax.jit(tile_all)) * 1e3, 3)

    # gather_lane + albedo_at at full width (the lv build, per sample).
    f_gl = jax.jit(lambda: bsdf.gather_lane(
        scene.mat, lv_mid,
        albedo_at(scene, lv_tri, jnp.zeros((lb,)), jnp.zeros((lb,)))))
    report["gather_lane_ms"] = round(timeit(f_gl) * 1e3, 3)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
