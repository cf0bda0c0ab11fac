import jax, jax.numpy as jnp, numpy as np
from bpt_tpu.scene.scene import load_scene
from bpt_tpu.scene.toml_config import load_toml
from bpt_tpu.core.camera import Camera, generate_rays
from bpt_tpu.accel import binned

cfg_t = load_toml("/root/reference/data/a5/cbox/tinyrender/cbox_bdpt_glass.toml")
scene, meta = load_scene(cfg_t.obj_file)
W=H=256; B=W*W
cam = Camera.make(o=cfg_t.camera.o, at=cfg_t.camera.at, up=cfg_t.camera.up, fov=cfg_t.camera.fov, width=W, height=H)
cc = cam.device_constants()
o, d = generate_rays(cc, W, H, jnp.arange(B, dtype=jnp.int32))
# surrogate shadow rays: from primary hitpoints toward the light area (coherent-ish)
# and random bounce dirs (incoherent)
key = jax.random.key(0)
from bpt_tpu.accel.api import trace_closest
hit = trace_closest(scene, o, d, 1e-8, jnp.inf)
p = o + d * jnp.where(hit.valid, hit.t, 1.0)[:, None]
light_target = jnp.asarray([0.0, 1.58, 0.0])  # approx cbox light
seg = light_target - p
dist = jnp.linalg.norm(seg, axis=-1)
sd = seg / dist[:, None]
rd = jax.random.normal(key, (B,3)); rd = rd/jnp.linalg.norm(rd,axis=-1,keepdims=True)
for name, oo, dd, mt in (("shadow", p, sd, dist-1e-4), ("bounce", p, rd, jnp.full((B,), jnp.inf))):
    for tile in (128, 256, 1024):
        tg = scene.treelets_any
        (b_in, b, tile_, n_tiles, rx, lists, counts, mint, maxt) = binned._prep(tg, oo, dd, 1e-4, mt, tile)
        c = np.asarray(counts)
        print(f"{name} tile={tile_}: n_tiles={n_tiles} count mean={c.mean():.1f} p50={np.percentile(c,50):.0f} p99={np.percentile(c,99):.0f} max={c.max()}")
