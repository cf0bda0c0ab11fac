"""BASELINE config #4 demo: 512x512 render with Russian roulette + long
light subpaths (VERDICT r3 item 5a).

Renders the reference's bonus cbox scene (the HardLightSample view:
`/root/reference/HardLightSample.png`, README.md:21-23) at 512x512 with
the RR estimator (`no_rr=False` — rrDepth=2 luminance-gated continuation,
bdpt.h:129-132) and long light subpaths (max_bounces=12), through the
same chunked driver the CLI uses.  Writes the EXR + a .meta.json sidecar
and prints one JSON line with wall time and rays/s.

Self-limiting: renders in spp chunks and stops cleanly at the time
budget, scaling the accumulated framebuffer to the completed spp count.

Run on the chip: python benchmarks/hardlight_512.py [--spp 64]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

TOML = "/root/reference/data/a5/bonus_bdpt/tinyrender/cbox_bdpt.toml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--budget-s", type=float, default=420.0)
    ap.add_argument("--out", default="artifacts/hardlight_512.exr")
    args = ap.parse_args()

    from bpt_tpu.core.camera import Camera
    from bpt_tpu.integrators.bdpt import BDPTConfig, render_chunk
    from bpt_tpu.io.exr import write_exr
    from bpt_tpu.scene.scene import load_scene
    from bpt_tpu.scene.toml_config import load_toml

    w = h = 512
    cfg_t = load_toml(TOML)
    scene, meta = load_scene(cfg_t.obj_file)
    cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at,
                      up=cfg_t.camera.up, fov=cfg_t.camera.fov,
                      width=w, height=h)
    cfg = BDPTConfig(width=w, height=h, spp=args.spp, rr_depth=2,
                     no_rr=False, max_bounces=12)
    cam_consts = cam.device_constants()
    key = jax.random.key(0)

    t_start = time.time()
    fb = jnp.zeros((w * h, 3), jnp.float32)
    rays = 0
    done = 0
    t_compile = None
    while done < args.spp:
        n = min(args.chunk, args.spp - done)
        t0 = time.time()
        fb_c, nr = render_chunk(scene, cam_consts, cfg, key, n,
                                sample_offset=done)
        fb = fb + fb_c
        rays += int(nr)   # host sync
        done += n
        if t_compile is None:
            t_compile = time.time() - t0
        if time.time() - t_start > args.budget_s:
            break
    wall = time.time() - t_start

    # Accumulated at 1/cfg.spp per sample; rescale to the completed spp.
    img = np.asarray(fb).reshape(h, w, 3) * (args.spp / done)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    write_exr(args.out, img)
    timed = wall - (t_compile or 0.0)
    report = {
        "which": "hardlight_512 (BASELINE config #4)",
        "scene": TOML, "resolution": f"{w}x{h}",
        "spp_done": done, "spp_target": args.spp,
        "rr": "on (rr_depth=2, max_bounces=12)",
        "device": str(jax.devices()[0]),
        "wall_s": round(wall, 1),
        "first_chunk_s": round(t_compile or 0.0, 1),
        "rays": rays,
        "rays_per_s_steady": round(
            rays * (1 - (t_compile or 0) / wall) / max(timed, 1e-9), 0),
        "mean_luma": round(float(
            (img @ np.array([0.2126, 0.7152, 0.0722])).mean()), 5),
        "exr": args.out,
    }
    with open(args.out.replace(".exr", ".meta.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
