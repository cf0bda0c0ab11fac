import time, glob, jax, jax.numpy as jnp
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
cfg = BDPTConfig(width=W, height=H, spp=2, rr_depth=8)
fb, nr = render_chunk(scene, cc, cfg, key, 2)
float(fb.sum())
print("warm", flush=True)
with jax.profiler.trace("/tmp/jaxprof"):
    fb, nr = render_chunk(scene, cc, cfg, key, 2)
    float(fb.sum())
print(glob.glob("/tmp/jaxprof/**/*", recursive=True), flush=True)
