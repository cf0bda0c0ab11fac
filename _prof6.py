import time, jax, jax.numpy as jnp
from bpt_tpu.scene.scene import load_scene
from bpt_tpu.scene.toml_config import load_toml
from bpt_tpu.core.camera import Camera, generate_rays
from bpt_tpu.accel.api import trace_closest, trace_any

cfg_t = load_toml("/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml")
scene, meta = load_scene(cfg_t.obj_file)
def timeit(f, *a, n=5):
    r = f(*a); float(jax.tree_util.tree_leaves(r)[0].sum())
    t0=time.time()
    for _ in range(n):
        r = f(*a); float(jax.tree_util.tree_leaves(r)[0].sum())
    return (time.time()-t0)/n
for W in (256, 512):
    B = W*W
    cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up, fov=cfg_t.camera.fov, width=W, height=W)
    cc = cam.device_constants()
    o, d = generate_rays(cc, W, W, jnp.arange(B, dtype=jnp.int32))
    tc = jax.jit(lambda o,d: trace_closest(scene, o, d, 1e-8, jnp.inf))
    ta = jax.jit(lambda o,d: trace_any(scene, o, d, 1e-8, 100.0))
    c = timeit(tc, o, d); a = timeit(ta, o, d)
    print(f"B={B}: closest {c*1e3:.1f}ms ({B/c/1e6:.1f}M rays/s), any {a*1e3:.1f}ms ({B/a/1e6:.1f}M/s)")
