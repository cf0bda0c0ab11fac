import sys, time, jax, jax.numpy as jnp
from bpt_tpu.scene.scene import load_scene
from bpt_tpu.scene.toml_config import load_toml
from bpt_tpu.core.camera import Camera
from bpt_tpu.integrators.bdpt import BDPTConfig, render_chunk

sb = int(sys.argv[1])
cfg_t = load_toml("/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml")
scene, meta = load_scene(cfg_t.obj_file)
W=H=256
cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up, fov=cfg_t.camera.fov, width=W, height=H)
cc = cam.device_constants()
key = jax.random.key(7)
cfg = BDPTConfig(width=W, height=H, spp=8, rr_depth=8)
t0=time.time()
fb, nr = render_chunk(scene, cc, cfg, key, 8, samples_per_batch=sb)
float(fb.sum())
print(f"sb={sb}: compile+first {time.time()-t0:.1f}s", flush=True)
t0=time.time()
fb, nr = render_chunk(scene, cc, cfg, key, 8, samples_per_batch=sb)
nr=int(nr); s=float(fb.sum())
dt=time.time()-t0
print(f"sb={sb}: {dt:.2f}s rays={nr} -> {nr/dt/1e6:.2f}M rays/s sum={s:.4f}", flush=True)
