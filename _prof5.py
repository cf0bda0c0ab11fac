import time, jax, jax.numpy as jnp
from bpt_tpu.scene.scene import load_scene
from bpt_tpu.scene.toml_config import load_toml
from bpt_tpu.core.camera import Camera
from bpt_tpu.integrators.bdpt import BDPTConfig, render_chunk

cfg_t = load_toml("/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml")
scene, meta = load_scene(cfg_t.obj_file)
W=H=256
cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up, fov=cfg_t.camera.fov, width=W, height=H)
cc = cam.device_constants()
key = jax.random.key(7)
for mode in ("bdpt", "path_trace", "light_trace"):
    cfg = BDPTConfig(width=W, height=H, spp=4, rr_depth=8, mode=mode)
    fb, nr = render_chunk(scene, cc, cfg, key, 4); float(fb.sum())
    t0=time.time(); fb, nr = render_chunk(scene, cc, cfg, key, 4); float(fb.sum()); dt=time.time()-t0
    print(mode, "per-spp:", round(dt/4, 4))
