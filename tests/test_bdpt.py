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


R = 4          # independent replicates per mode (variance estimation)
SPP_REP = 8    # spp per replicate


@pytest.fixture(scope="module")
def renders(box):
    """Per mode: R independent replicate renders (disjoint seeds) so the
    cross-estimator gates can be variance-aware z-tests instead of fixed
    percentage tolerances (VERDICT r1 item 7)."""
    scene, meta, cam = box
    out = {}
    for mode in ("bdpt", "path_trace", "light_trace"):
        cfg = BDPTConfig(W, H, spp=SPP_REP, rr_depth=3, mode=mode)
        imgs = []
        for r in range(R):
            img, nrays = render_image(scene, cam, cfg, seed=100 + r,
                                      spp_chunk=SPP_REP)
            imgs.append(np.asarray(img))
            assert nrays > 0
        out[mode] = np.stack(imgs)  # (R, H, W, 3)
    return out


def _mean_se(imgs):
    """Mean of replicate image-means and its standard error."""
    m = imgs.mean(axis=(1, 2, 3))  # (R,)
    return float(m.mean()), float(m.std(ddof=1) / np.sqrt(len(m)))


def _z(a, b):
    ma, sa = _mean_se(a)
    mb, sb = _mean_se(b)
    return abs(ma - mb) / np.sqrt(sa * sa + sb * sb + 1e-30)


Z_GATE = 4.0  # |z| >= 4 has p < 1e-4 under the null (agreement)


def test_all_modes_finite_nonnegative(renders):
    for mode, imgs in renders.items():
        assert np.isfinite(imgs).all(), mode
        assert (imgs >= 0).all(), mode


def test_bdpt_matches_path_tracer(renders):
    """Cross-algorithm consistency as a z-test: the difference of means
    must be within Z_GATE standard errors (a bias of a few standard
    errors fails, unlike the old fixed 8% tolerance)."""
    z = _z(renders["bdpt"], renders["path_trace"])
    assert z < Z_GATE, f"z={z:.2f}"


def test_bdpt_matches_light_tracer(renders):
    z = _z(renders["bdpt"], renders["light_trace"])
    assert z < Z_GATE, f"z={z:.2f}"


def test_blockwise_agreement(renders):
    """8x8 block means of BDPT vs PT: variance-aware per-block z-scores
    (block SE estimated from the replicate spread)."""
    def blocks(imgs):  # (R, H, W, 3) -> (R, nby, nbx)
        b = imgs.reshape(R, H // 8, 8, W // 8, 8, 3).mean(axis=(2, 4))
        return b @ np.array([0.2126, 0.7152, 0.0722])

    b1, b2 = blocks(renders["bdpt"]), blocks(renders["path_trace"])
    m1, m2 = b1.mean(0), b2.mean(0)
    se1 = b1.std(0, ddof=1) / np.sqrt(R)
    se2 = b2.std(0, ddof=1) / np.sqrt(R)
    z = np.abs(m1 - m2) / np.sqrt(se1 ** 2 + se2 ** 2 + 1e-12)
    # With R=4 the SE has 3 dof, so these are t_3 statistics (fat
    # tails: |t_3| quantiles are ~2.4 at p90, ~10 at p999 under the
    # null); the bulk of blocks must be statistically consistent.
    assert np.quantile(z, 0.9) < 8.0, np.quantile(z, 0.9)
    assert np.median(z) < 3.0, np.median(z)


def test_injected_technique_bias_fails_gate(box):
    """VERDICT r1 item 7 'done' criterion: a 3% radiance bias injected
    into one technique (the s=1 NEE MIS weight) must trip the
    cross-estimator z-gate.  Paired seeds make the test sharp: the MC
    noise is common to both renders, so the bias dominates."""
    import bpt_tpu.integrators.bdpt as bd
    from bpt_tpu.integrators import mis as mis_mod

    scene, meta, cam = box
    cfg = BDPTConfig(W, H, spp=SPP_REP, rr_depth=3)

    def render_reps():
        imgs = []
        for r in range(R):
            img, _ = render_image(scene, cam, cfg, seed=100 + r,
                                  spp_chunk=SPP_REP)
            imgs.append(np.asarray(img))
        return np.stack(imgs)

    clean = render_reps()
    orig = mis_mod.weight_s1
    try:
        mis_mod.weight_s1 = lambda *a, **k: 1.03 * orig(*a, **k)
        bd.render_chunk.clear_cache()  # jit captured the clean closure
        biased = render_reps()
    finally:
        mis_mod.weight_s1 = orig
        bd.render_chunk.clear_cache()

    # Paired z: difference image has common noise removed.
    d = (biased - clean).mean(axis=(1, 2, 3))
    z = abs(d.mean()) / (d.std(ddof=1) / np.sqrt(R) + 1e-30)
    rel = abs(d.mean()) / clean.mean()
    assert z > Z_GATE, f"bias not detected: z={z:.2f} rel={rel:.4f}"


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
