import time, jax, jax.numpy as jnp, numpy as np
from bpt_tpu.scene.scene import load_scene
from bpt_tpu.scene.toml_config import load_toml
from bpt_tpu.core.camera import Camera, generate_rays
from bpt_tpu.accel import binned
from bpt_tpu.ops.pallas_trace import fits_vmem, trace_any_pallas

cfg_t = load_toml("/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml")
scene, meta = load_scene(cfg_t.obj_file)
W=H=256; B=W*H
cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up, fov=cfg_t.camera.fov, width=W, height=H)
cc = cam.device_constants()
pix = jnp.arange(B, dtype=jnp.int32)
o, d = generate_rays(cc, W, H, pix)
tg = scene.treelets_any
print("any NT:", tg.bmin.shape[0], "K:", tg.tri_index.shape[1], "fits:", fits_vmem(tg))

def timeit(f, *a, n=5):
    r = f(*a); float(jax.tree_util.tree_leaves(r)[0].sum())
    t0=time.time()
    for _ in range(n):
        r = f(*a); float(jax.tree_util.tree_leaves(r)[0].sum())
    return (time.time()-t0)/n

f_x = jax.jit(lambda o,d: binned.trace_any_binned(tg, o, d, 1e-8, 100.0))
f_p = jax.jit(lambda o,d: trace_any_pallas(tg, o, d, 1e-8, 100.0))
print("xla any:", timeit(f_x, o, d))
print("pallas any:", timeit(f_p, o, d))
o7 = jnp.tile(o, (7,1)); d7 = jnp.tile(d, (7,1))
print("xla any 7x:", timeit(f_x, o7, d7))
print("pallas any 7x:", timeit(f_p, o7, d7))
occ1 = np.asarray(f_x(o, d)); occ2 = np.asarray(f_p(o, d))
print("agree:", (occ1==occ2).mean())
tg64 = scene.treelets
f_p64 = jax.jit(lambda o,d: trace_any_pallas(tg64, o, d, 1e-8, 100.0))
print("pallas any K64:", timeit(f_p64, o, d))
print("pallas any K64 7x:", timeit(f_p64, o7, d7))
occ3 = np.asarray(f_p64(o, d))
print("agree64:", (occ1==occ3).mean())
