"""Differentiable rendering: finite gradients + finite-difference check
(SURVEY.md section 4 item d)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.diff.grad import (
    apply_params,
    extract_params,
    finite_difference_check,
    image_loss,
    loss_and_grad,
)
from bpt_tpu.integrators.bdpt import BDPTConfig, render_sample
from bpt_tpu.scene.procedural import cornell_box_scene

W = H = 16


@pytest.fixture(scope="module")
def setup():
    scene, meta, cam = cornell_box_scene(
        W, H, right_object="glass_sphere", sphere_subdiv=1
    )
    cc = cam.device_constants()
    cfg = BDPTConfig(W, H, spp=4, rr_depth=3)
    key = jax.random.key(11)
    params = extract_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)
    return scene, cc, cfg, key, params, target


def test_gradients_finite_all_modes(setup):
    scene, cc, cfg, key, params, target = setup
    import dataclasses

    for mode in ("bdpt", "path_trace", "light_trace"):
        cfg_m = dataclasses.replace(cfg, mode=mode)
        loss, g = loss_and_grad(params, scene, cc, cfg_m, key, 2, target)
        assert np.isfinite(float(loss))
        for k, v in g.items():
            assert bool(jnp.all(jnp.isfinite(v))), (mode, k)


def test_emission_gradient_nonzero(setup):
    scene, cc, cfg, key, params, target = setup
    _, g = loss_and_grad(params, scene, cc, cfg, key, 2, target)
    assert float(jnp.linalg.norm(g["emission"])) > 0


def test_albedo_gradient_matches_finite_difference(setup):
    """Central FD with common random numbers vs autodiff, on one wall's
    red albedo channel."""
    scene, cc, cfg, key, params, target = setup
    _, g = loss_and_grad(params, scene, cc, cfg, key, 2, target)
    idx = (0, 0)  # floor material, red channel
    fd = finite_difference_check(
        params, scene, cc, cfg, key, 2, target, "diffuse", idx, eps=1e-2
    )
    ad = float(g["diffuse"][idx])
    assert np.isclose(float(fd), ad, rtol=0.05, atol=1e-4), (float(fd), ad)


def test_emission_gradient_matches_finite_difference(setup):
    scene, cc, cfg, key, params, target = setup
    _, g = loss_and_grad(params, scene, cc, cfg, key, 2, target)
    idx = (5, 1)  # light material, green channel
    fd = finite_difference_check(
        params, scene, cc, cfg, key, 2, target, "emission", idx, eps=1e-2
    )
    ad = float(g["emission"][idx])
    assert np.isclose(float(fd), ad, rtol=0.05, atol=1e-4), (float(fd), ad)


def test_gradient_descent_reduces_loss(setup):
    """Three SGD steps on albedo reduce an image-matching loss."""
    scene, cc, cfg, key, params, target_unused = setup
    # Target: the scene with darker walls.
    dark = {**params, "diffuse": params["diffuse"] * 0.5}
    from bpt_tpu.diff.grad import render_with_params

    target_fb = render_with_params(dark, scene, cc, cfg, key, 2) * (
        cfg.spp / 2)
    p = {k: v for k, v in params.items()}
    losses = []
    for i in range(3):
        loss, g = loss_and_grad(p, scene, cc, cfg, key, 2, target_fb)
        losses.append(float(loss))
        p = {k: v - 2.0 * g[k] for k, v in p.items()}
    assert losses[-1] < losses[0], losses
