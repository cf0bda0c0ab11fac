"""Benchmark: rays/sec/chip on the BDPT caustic scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference CPU renderer sustains ~124k
pixel-samples/s on the 800x600 cbox at 256spp (990s best case), which is
~1.0e6 rays/s counting subpath + shadow rays (BASELINE.md "derived
throughput" row).  vs_baseline = our rays/s / 1.0e6.

Scene: the glass-sphere (caustic) Cornell box, full BDPT with MIS at
256x256 (BASELINE.json config #3).  Loads the reference's cbox_mirror
glass scene when mounted; falls back to the procedural caustic box.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

REF_TOML = "/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml"
BASELINE_RAYS_PER_SEC = 1.0e6

WIDTH = HEIGHT = 256
SPP = 16           # timed samples (after warmup)
RR_DEPTH = 8       # the reference caustic config (cbox_bdpt_glass.toml)


def _load_scene():
    from bpt_tpu.core.camera import Camera

    if os.path.exists(REF_TOML):
        from bpt_tpu.scene.scene import load_scene
        from bpt_tpu.scene.toml_config import load_toml

        cfg_t = load_toml(REF_TOML)
        scene, meta = load_scene(cfg_t.obj_file)
        cam = Camera.make(
            o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up,
            fov=cfg_t.camera.fov, width=WIDTH, height=HEIGHT,
        )
        label = "reference cbox_bdpt_glass"
    else:
        from bpt_tpu.scene.procedural import cornell_box_scene

        scene, meta, cam = cornell_box_scene(
            WIDTH, HEIGHT, right_object="glass_sphere", sphere_subdiv=3
        )
        label = "procedural glass cbox"
    return scene, cam, label


def main():
    from bpt_tpu.integrators.bdpt import BDPTConfig, render_chunk

    scene, cam, label = _load_scene()
    cfg = BDPTConfig(width=WIDTH, height=HEIGHT, spp=SPP, rr_depth=RR_DEPTH)
    cam_consts = cam.device_constants()
    key = jax.random.key(7)

    import numpy as np

    # Warmup / compile with the SAME chunk length as the timed run (the
    # scan length is baked into the compiled program; a different length
    # would recompile inside the timed region).  NOTE: timings must end
    # with a host fetch; on the axon relay backend block_until_ready only
    # confirms enqueue.
    fb, nr = render_chunk(scene, cam_consts, cfg, key, SPP)
    float(fb.sum())

    t0 = time.time()
    fb, nrays = render_chunk(scene, cam_consts, cfg, key, SPP)
    nrays = int(nrays)
    _ = float(fb.sum())
    dt = time.time() - t0

    # Per-stage attribution (VERDICT r1 item 6): the light-only and
    # eye-only estimators isolate the two walks; the remainder of the
    # full-BDPT time is the s>=2 all-pairs connection block (its
    # (L*B)-wide visibility sweep + shading).
    stages = {}
    for mode, name in (("light_trace", "light_walk_s"),
                       ("path_trace", "eye_walk_s")):
        cfg_m = BDPTConfig(width=WIDTH, height=HEIGHT, spp=SPP,
                           rr_depth=RR_DEPTH, mode=mode)
        fb_m, _n = render_chunk(scene, cam_consts, cfg_m, key, SPP)
        float(fb_m.sum())
        t1 = time.time()
        fb_m, _n = render_chunk(scene, cam_consts, cfg_m, key, SPP)
        float(fb_m.sum())
        stages[name] = round(time.time() - t1, 3)
    stages["all_pairs_connect_s"] = round(
        max(dt - stages["light_walk_s"] - stages["eye_walk_s"], 0.0), 3)

    rays_per_sec = float(nrays) / dt
    result = {
        "metric": "rays/sec/chip (BDPT, caustic scene)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "detail": {
            "scene": label,
            "resolution": f"{WIDTH}x{HEIGHT}",
            "spp_timed": SPP,
            "rr_depth": RR_DEPTH,
            "wall_s": round(dt, 3),
            "rays": int(nrays),
            "device": str(jax.devices()[0]),
            "pixel_samples_per_sec": round(WIDTH * HEIGHT * SPP / dt, 1),
            "stages": stages,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
