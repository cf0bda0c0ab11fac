"""Pooled light transport + ring-rotated light-vertex shards.

SURVEY §5's "long-context analog" row: light subpaths sharded across the
'dp' mesh axis, the quadratic eye x light connect phase computed
blockwise by rotating pool shards around the ring with ppermute
(reference anchor: the all-pairs loop at src/integrators/bdpt.h:146-148).

Gates:
  1. sharding invariance: the 8-device ring render equals the
     single-device pooled render (same global pool RNG) to float
     tolerance;
  2. estimator consistency: the pooled estimator agrees with the
     standard per-pixel BDPT estimator within Monte-Carlo noise
     (both are unbiased estimators of the same transport).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.integrators import bdpt as bd
from bpt_tpu.integrators.bdpt import BDPTConfig
from bpt_tpu.parallel.mesh import make_mesh, render_chunk_pool_ring
from bpt_tpu.scene.procedural import cornell_box_scene

W = H = 16
POOL = 32


@pytest.fixture(scope="module")
def box():
    return cornell_box_scene(W, H)


def _single_device_pool(scene, cam_consts, cfg, key, spp):
    pixel_idx = jnp.arange(W * H, dtype=jnp.int32)
    pool_ids = jnp.arange(cfg.light_pool, dtype=jnp.int32)

    @jax.jit
    def run():
        fb = jnp.zeros((W * H, 3), jnp.float32)
        nrays = jnp.int32(0)
        for s in range(spp):
            k = jax.random.fold_in(key, s)
            fb_s, nr = bd.render_sample_pool(
                scene, cam_consts, cfg, k, pixel_idx, pool_ids)
            fb, nrays = fb + fb_s, nrays + nr
        return fb, nrays

    return run()


def test_ring_matches_single_device(box):
    scene, meta, cam = box
    cfg = BDPTConfig(W, H, spp=2, rr_depth=3, light_pool=POOL)
    cam_consts = cam.device_constants()
    key = jax.random.key(11)

    fb1, nr1 = _single_device_pool(scene, cam_consts, cfg, key, cfg.spp)

    mesh = make_mesh(n_dp=8, n_sp=1)
    fb8, nr8 = jax.jit(
        lambda: render_chunk_pool_ring(scene, cam_consts, cfg, mesh, key,
                                       cfg.spp))()
    np.testing.assert_allclose(np.asarray(fb8), np.asarray(fb1),
                               rtol=2e-4, atol=2e-6)
    # Same pairs traced in both layouts.
    assert int(nr8) == int(nr1)


def test_ring_reduce_scatter_mode(box):
    scene, meta, cam = box
    cfg = BDPTConfig(W, H, spp=1, rr_depth=3, light_pool=POOL)
    cam_consts = cam.device_constants()
    key = jax.random.key(5)
    mesh = make_mesh(n_dp=4, n_sp=2)
    fb_ps, _ = jax.jit(
        lambda: render_chunk_pool_ring(scene, cam_consts, cfg, mesh, key,
                                       cfg.spp))()
    fb_rs, _ = jax.jit(
        lambda: render_chunk_pool_ring(scene, cam_consts, cfg, mesh, key,
                                       cfg.spp, fb_mode="reduce_scatter"))()
    np.testing.assert_allclose(np.asarray(fb_rs), np.asarray(fb_ps),
                               rtol=2e-4, atol=2e-6)


def test_pool_estimator_consistency(box):
    """Pooled and per-pixel BDPT estimate the same transport: image means
    must agree within a variance-aware bound (z-test style gate)."""
    scene, meta, cam = box
    cam_consts = cam.device_constants()
    key = jax.random.key(0)

    R, SPP = 4, 8
    cfg_pool = BDPTConfig(W, H, spp=SPP, rr_depth=3, light_pool=POOL)
    means_pool = []
    for r in range(R):
        fb, _ = _single_device_pool(scene, cam_consts, cfg_pool,
                                    jax.random.key(50 + r), SPP)
        means_pool.append(float(jnp.mean(fb)))

    means_std = []
    from bpt_tpu.integrators.bdpt import render_image
    cfg_std = BDPTConfig(W, H, spp=SPP, rr_depth=3)
    for r in range(R):
        img, _ = render_image(scene, cam, cfg_std, seed=70 + r,
                              spp_chunk=SPP)
        means_std.append(float(jnp.mean(img)))

    mp, ms = np.mean(means_pool), np.mean(means_std)
    se = np.sqrt(np.var(means_pool) / R + np.var(means_std) / R)
    assert abs(mp - ms) < max(4.0 * se, 0.05 * ms), (
        f"pool mean {mp:.4f} vs standard {ms:.4f} (se {se:.4f})")
