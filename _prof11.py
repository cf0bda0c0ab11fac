import time, sys, jax, jax.numpy as jnp, numpy as np
from bpt_tpu.scene.scene import load_scene
from bpt_tpu.scene.toml_config import load_toml
from bpt_tpu.core.camera import Camera, generate_rays
from bpt_tpu.accel.api import trace_closest, trace_any

cfg_t = load_toml("/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml")
scene, meta = load_scene(cfg_t.obj_file)
W=H=256; B=W*W
cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up, fov=cfg_t.camera.fov, width=W, height=H)
cc = cam.device_constants()
o, d = generate_rays(cc, W, H, jnp.arange(B, dtype=jnp.int32))
print("scene loaded", flush=True)

def timeit(f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time()-t0)/n

fc = jax.jit(lambda o,d: trace_closest(scene, o, d, 1e-8, jnp.inf))
t = timeit(fc, o, d)
print(f"trace_closest B={B}: {t*1e3:.2f}ms -> {B/t/1e6:.1f}M rays/s", flush=True)

hit = fc(o, d)
p = o + d * jnp.where(hit.valid, hit.t, 1.0)[:, None]
lt = jnp.asarray([0.0, 1.58, 0.0])
seg = lt - p; dist = jnp.linalg.norm(seg, axis=-1); sd = seg/dist[:,None]
fa = jax.jit(lambda p,sd,mt: trace_any(scene, p, sd, 1e-4, mt))
t = timeit(fa, p, sd, dist-1e-4)
print(f"trace_any B={B}: {t*1e3:.2f}ms -> {B/t/1e6:.1f}M rays/s", flush=True)

for mult in (2, 4):
    Bm = B*mult
    om = jnp.tile(o, (mult,1)); dm = jnp.tile(d, (mult,1))
    t = timeit(fc, om, dm, n=5)
    print(f"trace_closest B={Bm}: {t*1e3:.2f}ms -> {Bm/t/1e6:.1f}M rays/s", flush=True)
