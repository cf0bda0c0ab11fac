"""Per-tile sweep kernels (ops/pallas_sweep.py) vs the reference tracer
(interpret mode on CPU; the compiled path runs on TPU — routed for
any-hit by accel/api.py).

Covers coherent/incoherent/bounded closest-hit, segment occlusion with
degenerate (dead) lanes, and non-tile-multiple batch sizes (padding)."""
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.accel.traverse import trace_any, trace_closest
from bpt_tpu.core.camera import generate_rays
from bpt_tpu.ops.pallas_sweep import (
    fits_vmem,
    trace_any_sweep,
    trace_closest_sweep,
)
from bpt_tpu.scene.procedural import cornell_box_scene


@pytest.fixture(scope="module")
def scene():
    s, meta, cam = cornell_box_scene(
        32, 32, right_object="glass_sphere", sphere_subdiv=2)
    return s, cam


def test_fits_vmem(scene):
    s, _ = scene
    assert fits_vmem(s.treelets)


def _ray_cases(scene):
    s, cam = scene
    cc = cam.device_constants()
    b = 700  # deliberately not a tile multiple (exercises padding)
    pix = jnp.arange(b, dtype=jnp.int32) % (32 * 32)
    o1, d1 = generate_rays(cc, 32, 32, pix)
    rng = np.random.RandomState(3)
    o2 = jnp.asarray(rng.uniform([-1, 0.1, -1], [1, 1.9, 1],
                                 (b, 3)).astype(np.float32))
    d2 = rng.normal(size=(b, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    return [(o1, d1, 1.0, 1000.0), (o2, jnp.asarray(d2), 1e-8, 1e30),
            (o2, jnp.asarray(d2), 0.5, 2.0)]


def test_closest_sweep_matches_reference(scene):
    s, _ = scene
    for (o, d, mn, mx) in _ray_cases(scene):
        h_ref = trace_closest(s.geom, o, d, mn, mx)
        h_sw = trace_closest_sweep(s.treelets, o, d, mn, mx,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(h_ref.valid),
                                      np.asarray(h_sw.valid))
        v = np.asarray(h_ref.valid)
        np.testing.assert_allclose(np.asarray(h_ref.t)[v],
                                   np.asarray(h_sw.t)[v], rtol=1e-5)


def test_any_sweep_matches_reference(scene):
    s, cam = scene
    cc = cam.device_constants()
    b = 700
    pix = jnp.arange(b, dtype=jnp.int32) % (32 * 32)
    o, d = generate_rays(cc, 32, 32, pix)
    hit = trace_closest(s.geom, o, d, 1.0, 1000.0)
    p = o + d * jnp.where(jnp.isfinite(hit.t), hit.t, 1.0)[:, None]
    tgt = jnp.asarray([[0.0, 1.9, 0.0]], jnp.float32)
    seg = tgt - p
    dist = jnp.linalg.norm(seg, axis=-1)
    dn = seg / dist[:, None]
    max_t = dist - 1e-5
    # degenerate (dead) lanes must come back unoccluded and must not
    # perturb live lanes sharing their tile
    max_t = max_t.at[::5].set(-1.0)
    occ_ref = trace_any(s.geom, p, dn, 1e-8, max_t)
    occ_sw = trace_any_sweep(s.treelets, p, dn, 1e-8, max_t,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ_sw))
    assert not np.asarray(occ_sw)[::5].any()
