"""BDPT correctness: cross-estimator consistency + determinism.

Mirrors the reference's own quality strategy (SURVEY.md section 4): the
same scene rendered by the path tracer and by BDPT must agree (the
reference keeps paired cbox_bdpt.toml / cbox_bdpt_path.toml configs for
exactly this check), extended with the light-tracing ablation and
determinism guarantees the reference cannot make (its shared-sampler race,
renderer.cpp:160)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.integrators.bdpt import BDPTConfig, render_image
from bpt_tpu.scene.procedural import cornell_box_scene

W = H = 32


@pytest.fixture(scope="module")
def box():
    return cornell_box_scene(W, H)


@pytest.fixture(scope="module")
def renders(box):
    scene, meta, cam = box
    out = {}
    for mode in ("bdpt", "path_trace", "light_trace"):
        cfg = BDPTConfig(W, H, spp=32, rr_depth=3, mode=mode)
        img, nrays = render_image(scene, cam, cfg, seed=5, spp_chunk=16)
        out[mode] = np.asarray(img)
        assert nrays > 0
    return out


def test_all_modes_finite_nonnegative(renders):
    for mode, img in renders.items():
        assert np.isfinite(img).all(), mode
        assert (img >= 0).all(), mode


def test_bdpt_matches_path_tracer(renders):
    """Cross-algorithm consistency: converged means agree."""
    m_bdpt = renders["bdpt"].mean()
    m_path = renders["path_trace"].mean()
    assert abs(m_bdpt - m_path) / m_path < 0.08, (m_bdpt, m_path)


def test_bdpt_matches_light_tracer(renders):
    m_bdpt = renders["bdpt"].mean()
    m_light = renders["light_trace"].mean()
    assert abs(m_bdpt - m_light) / m_light < 0.08, (m_bdpt, m_light)


def test_blockwise_agreement(renders):
    """8x8 block means of BDPT vs PT agree within MC noise."""
    def blocks(img):
        return img.reshape(H // 8, 8, W // 8, 8, 3).mean(axis=(1, 3))

    b_bdpt = blocks(renders["bdpt"])
    b_path = blocks(renders["path_trace"])
    denom = np.maximum(b_path, 0.05)
    rel = np.abs(b_bdpt - b_path) / denom
    # allow a few noisy blocks; the bulk must agree
    assert np.quantile(rel, 0.9) < 0.35, np.quantile(rel, 0.9)


def test_deterministic(box):
    scene, meta, cam = box
    cfg = BDPTConfig(W, H, spp=4, rr_depth=2)
    img1, _ = render_image(scene, cam, cfg, seed=9)
    img2, _ = render_image(scene, cam, cfg, seed=9)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_seed_changes_noise(box):
    scene, meta, cam = box
    cfg = BDPTConfig(W, H, spp=2, rr_depth=2)
    img1, _ = render_image(scene, cam, cfg, seed=1)
    img2, _ = render_image(scene, cam, cfg, seed=2)
    assert not np.array_equal(np.asarray(img1), np.asarray(img2))


def test_rr_mode_runs(box):
    """Russian-roulette mode (NO_RR=0 analog) terminates and agrees
    roughly with the fixed-depth estimate."""
    scene, meta, cam = box
    cfg = BDPTConfig(W, H, spp=8, rr_depth=2, no_rr=False, max_bounces=8,
                     mode="path_trace")
    img, _ = render_image(scene, cam, cfg, seed=3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and (a >= 0).all()
    assert a.mean() > 0.1
