"""A/B live-lane compaction (ops/compaction.py) inside the real BDPT
pipeline: times render_chunk with compaction off / any-hit only /
closest only / both, at the bench scene + config.

Run on the TPU: python benchmarks/tune_compact.py [--spp 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=8)
    args = ap.parse_args()

    from bench import _load_scene
    from bpt_tpu.accel import api
    from bpt_tpu.integrators.bdpt import BDPTConfig, render_chunk

    scene, cam, label = _load_scene()
    cfg = BDPTConfig(width=256, height=256, spp=args.spp, rr_depth=8)
    cc = cam.device_constants()
    key = jax.random.key(7)

    def run(name, pred):
        api._use_compact = pred
        # new predicate -> retrace: drop the jit cache
        render_chunk.clear_cache()
        fb, nr = render_chunk(scene, cc, cfg, key, args.spp)
        float(fb.sum())
        t0 = time.time()
        fb, nr = render_chunk(scene, cc, cfg, key, args.spp)
        s = float(fb.sum())
        dt = time.time() - t0
        print(json.dumps({"variant": name, "wall_s": round(dt, 3),
                          "rays_per_s": round(int(nr) / dt, 1),
                          "fb_sum": round(s, 4)}), flush=True)

    # The (L*B) all-pairs batch is ~459k lanes; walk batches are 65k.
    run("off", lambda n: False)
    run("any-allpairs-only", lambda n: n > 100000)
    run("walks-only", lambda n: n <= 100000)
    run("both", lambda n: True)


if __name__ == "__main__":
    main()
