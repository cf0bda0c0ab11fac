import time, jax, jax.numpy as jnp, numpy as np
from bpt_tpu.scene.scene import load_scene
from bpt_tpu.scene.toml_config import load_toml
from bpt_tpu.core.camera import Camera, generate_rays
from bpt_tpu.accel import binned
from bpt_tpu.ops.pallas_trace import fits_vmem, trace_closest_pallas

cfg_t = load_toml("/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml")
scene, meta = load_scene(cfg_t.obj_file)
W=H=256; B=W*H
cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up, fov=cfg_t.camera.fov, width=W, height=H)
cc = cam.device_constants()
pix = jnp.arange(B, dtype=jnp.int32)
o, d = generate_rays(cc, W, H, pix)
tg = scene.treelets

def timeit(f, *a, n=5):
    r = f(*a); float(jax.tree_util.tree_leaves(r)[0].sum())
    t0=time.time()
    for _ in range(n):
        r = f(*a); float(jax.tree_util.tree_leaves(r)[0].sum())
    return (time.time()-t0)/n

f_slot = jax.jit(lambda o,d: binned.trace_closest_slots(tg, o, d, 1e-8, jnp.inf))
f_pal = jax.jit(lambda o,d: trace_closest_pallas(tg, o, d, 1e-8, jnp.inf))
print("slots:", timeit(f_slot, o, d))
print("pallas:", timeit(f_pal, o, d))
h1 = f_slot(o, d); h2 = f_pal(o, d)
t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
v1, v2 = np.asarray(h1.valid), np.asarray(h2.valid)
tr1, tr2 = np.asarray(h1.tri), np.asarray(h2.tri)
print("valid match:", (v1==v2).mean(), "tri match:", (tr1[v1]==tr2[v1]).mean())
m = v1 & v2
print("t frac>1e-3:", (np.abs(t1[m]-t2[m])>1e-3).mean())
