"""The dense binned tracers (the routed XLA fallbacks: per-ray slot
closest hit, tile-sweep any hit) must agree exactly with the skip-link
tracer (both implement the reference's intersection semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.accel.binned import trace_any_binned, trace_closest_slots
from bpt_tpu.accel.traverse import trace_any, trace_closest
from bpt_tpu.core.camera import generate_rays
from bpt_tpu.scene.procedural import cornell_box_scene


@pytest.fixture(scope="module")
def scene():
    s, meta, cam = cornell_box_scene(
        32, 32, right_object="glass_sphere", sphere_subdiv=2)
    return s, cam


def _ray_sets(scene, cam, b=2048):
    cc = cam.device_constants()
    pix = jnp.arange(b, dtype=jnp.int32) % (32 * 32)
    o1, d1 = generate_rays(cc, 32, 32, pix)
    rng = np.random.RandomState(3)
    o2 = jnp.asarray(rng.uniform([-1, 0.1, -1], [1, 1.9, 1],
                                 (b, 3)).astype(np.float32))
    d2 = rng.normal(size=(b, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    return [(o1, d1, 1.0, 1000.0), (o2, jnp.asarray(d2), 1e-8, 1e30),
            (o2, jnp.asarray(d2), 0.5, 2.0)]


def test_closest_slots_agrees(scene):
    s, cam = scene
    for (o, d, mn, mx) in _ray_sets(s, cam):
        h_ref = trace_closest(s.geom, o, d, mn, mx)
        h_bin = trace_closest_slots(s.treelets, o, d, mn, mx)
        np.testing.assert_array_equal(np.asarray(h_ref.valid),
                                      np.asarray(h_bin.valid))
        v = np.asarray(h_ref.valid)
        np.testing.assert_allclose(np.asarray(h_ref.t)[v],
                                   np.asarray(h_bin.t)[v], rtol=1e-5)
        # Triangle ids may differ on shared-edge ties (equal t); t and
        # validity above are the geometric ground truth.
        assert (np.asarray(h_ref.tri) == np.asarray(h_bin.tri)).mean() \
            > 0.98


def test_any_binned_agrees(scene):
    s, cam = scene
    for (o, d, mn, mx) in _ray_sets(s, cam):
        a_ref = trace_any(s.geom, o, d, mn, mx)
        a_bin = trace_any_binned(s.treelets, o, d, mn, mx, tile=256)
        np.testing.assert_array_equal(np.asarray(a_ref),
                                      np.asarray(a_bin))


def test_odd_batch_sizes(scene):
    """Padding path: batch not a multiple of the tile size."""
    s, cam = scene
    for b in (1, 7, 255, 300):
        (o, d, mn, mx) = _ray_sets(s, cam, b=max(b, 1))[1]
        o, d = o[:b], d[:b]
        h_ref = trace_closest(s.geom, o, d, mn, mx)
        h_bin = trace_closest_slots(s.treelets, o, d, mn, mx)
        np.testing.assert_array_equal(np.asarray(h_ref.valid),
                                      np.asarray(h_bin.valid))
        a_ref = trace_any(s.geom, o, d, 0.5, 2.0)
        a_bin = trace_any_binned(s.treelets, o, d, 0.5, 2.0, tile=256)
        np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_bin))
