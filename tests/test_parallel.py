"""Sharded rendering == single-device rendering (8 virtual CPU devices).

The mesh axes ('dp' pixels x 'sp' samples) must not change the image:
RNG is keyed by pixel identity, so any sharding produces the same set of
pixel-sample estimates, merged by psum (SURVEY.md sections 2.7, 4e)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.integrators.bdpt import BDPTConfig, render_image
from bpt_tpu.parallel.mesh import make_mesh, render_image_sharded
from bpt_tpu.scene.procedural import cornell_box_scene

W = H = 16


@pytest.fixture(scope="module")
def setup():
    scene, meta, cam = cornell_box_scene(W, H)
    cfg = BDPTConfig(W, H, spp=4, rr_depth=3)
    img_single, nrays = render_image(scene, cam, cfg, seed=0,
                                     spp_chunk=cfg.spp)
    return scene, cam, cfg, np.asarray(img_single), nrays


@pytest.mark.parametrize("n_dp,n_sp", [(8, 1), (4, 2), (2, 2), (1, 4)])
def test_sharded_matches_single(setup, n_dp, n_sp):
    scene, cam, cfg, img_single, nrays_single = setup
    if len(jax.devices()) < n_dp * n_sp:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dp=n_dp, n_sp=n_sp)
    img, nrays = render_image_sharded(scene, cam, cfg, mesh, seed=0)
    np.testing.assert_allclose(np.asarray(img), img_single, rtol=1e-4,
                               atol=1e-5)
    assert nrays == nrays_single


@pytest.mark.parametrize("n_dp,n_sp", [(8, 1), (4, 2)])
def test_reduce_scatter_matches_psum(setup, n_dp, n_sp):
    """The memory-scalable reduce_scatter framebuffer merge produces the
    same image as the replicating psum merge (VERDICT r1 item 4)."""
    scene, cam, cfg, img_single, nrays_single = setup
    if len(jax.devices()) < n_dp * n_sp:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dp=n_dp, n_sp=n_sp)
    img, nrays = render_image_sharded(scene, cam, cfg, mesh, seed=0,
                                      fb_mode="reduce_scatter")
    np.testing.assert_allclose(np.asarray(img), img_single, rtol=1e-4,
                               atol=1e-5)
    assert nrays == nrays_single


def test_psum_framebuffer_conserves_splats(setup):
    """Total splat energy is preserved under sharding (the psum replaces
    the reference's per-pixel mutexes)."""
    scene, cam, cfg, img_single, _ = setup
    mesh = make_mesh(n_dp=8, n_sp=1)
    cfg_lt = BDPTConfig(W, H, spp=4, rr_depth=3, mode="light_trace")
    img_s, _ = render_image_sharded(scene, cam, cfg_lt, mesh, seed=0)
    img_1, _ = render_image(scene, cam, cfg_lt, seed=0, spp_chunk=4)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_1),
                               rtol=1e-4, atol=1e-5)
