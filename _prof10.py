import time, jax, jax.numpy as jnp, numpy as np
from bpt_tpu.scene.scene import load_scene
from bpt_tpu.scene.toml_config import load_toml
from bpt_tpu.core.camera import Camera, generate_rays
from bpt_tpu.accel import binned
from bpt_tpu.accel.api import trace_closest

cfg_t = load_toml("/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml")
scene, meta = load_scene(cfg_t.obj_file)
W=H=256; B=W*W
cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up, fov=cfg_t.camera.fov, width=W, height=H)
cc = cam.device_constants()
o, d = generate_rays(cc, W, H, jnp.arange(B, dtype=jnp.int32))
key = jax.random.key(0)
hit = trace_closest(scene, o, d, 1e-8, jnp.inf)
p = o + d * jnp.where(hit.valid, hit.t, 1.0)[:, None]
light_target = jnp.asarray([0.0, 1.58, 0.0])
seg = light_target - p
dist = jnp.linalg.norm(seg, axis=-1)
sd = seg / dist[:, None]
tg = scene.treelets_any

def timeit(f, *a, n=5):
    r = f(*a); float(jax.tree_util.tree_leaves(r)[0].sum())
    t0=time.time()
    for _ in range(n):
        r = f(*a); float(jax.tree_util.tree_leaves(r)[0].sum())
    return (time.time()-t0)/n

base = None
for j in (1, 2, 4, 8, 16):
    f = jax.jit(lambda o,d,mt,j=j: binned.trace_any_binned(tg, o, d, 1e-4, mt, j=j))
    t = timeit(f, p, sd, dist-1e-4)
    occ = np.asarray(f(p, sd, dist-1e-4))
    if base is None: base = occ
    print(f"j={j}: {t*1e3:.1f}ms agree={np.mean(occ==base):.6f}")

f_prep = jax.jit(lambda o,d,mt: binned._prep(tg, o, d, 1e-4, mt, 128)[6])
print("prep-only:", timeit(f_prep, p, sd, dist-1e-4)*1e3, "ms")
f_mask = jax.jit(lambda o,d,mt: binned._treelet_mask(tg, o, d, jnp.broadcast_to(jnp.float32(1e-4),(B,)), mt).sum())
print("mask-only:", timeit(f_mask, p, sd, dist-1e-4)*1e3, "ms")

tg64 = scene.treelets
for j in (1, 4, 8):
    f = jax.jit(lambda o,d,mt,j=j: binned.trace_any_binned(tg64, o, d, 1e-4, mt, j=j))
    t = timeit(f, p, sd, dist-1e-4)
    occ = np.asarray(f(p, sd, dist-1e-4))
    print(f"K64 j={j}: {t*1e3:.1f}ms agree={np.mean(occ==base):.6f}")

import functools
mask_f = jax.jit(lambda o,d,mt: binned._treelet_mask(tg, o, d, jnp.broadcast_to(jnp.float32(1e-4),(B,)), mt))
ta_f = jax.jit(lambda o,d,mt: binned._tile_lists(binned._treelet_mask(tg, o, d, jnp.broadcast_to(jnp.float32(1e-4),(B,)), mt), B//128, 128)[0])
print("mask+lists:", timeit(ta_f, p, sd, dist-1e-4)*1e3, "ms")
# tile_any reduce only
red_f = jax.jit(lambda o,d,mt: jnp.any(binned._treelet_mask(tg, o, d, jnp.broadcast_to(jnp.float32(1e-4),(B,)), mt).reshape(B//128,128,-1), axis=1))
print("mask+reduce:", timeit(red_f, p, sd, dist-1e-4)*1e3, "ms")
ta = red_f(p, sd, dist-1e-4)
sort_f = jax.jit(lambda ta: jnp.argsort(~ta, axis=-1, stable=True).astype(jnp.int32))
print("argsort only:", timeit(sort_f, ta)*1e3, "ms")

for tg_name, tgx in (("K16", tg), ("K64", tg64)):
    f = jax.jit(lambda o,d,mt,tgx=tgx: binned.trace_any_peel(tgx, o, d, 1e-4, mt))
    t = timeit(f, p, sd, dist-1e-4)
    occ = np.asarray(f(p, sd, dist-1e-4))
    print(f"peel {tg_name}: {t*1e3:.1f}ms agree={np.mean(occ==base):.6f}")
