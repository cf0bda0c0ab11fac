"""Pallas fused slot-tracer kernel vs the reference tracer (interpret mode
on CPU; the compiled path runs on TPU via BPT_PALLAS_TRACE=1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.accel.traverse import trace_closest
from bpt_tpu.core.camera import generate_rays
from bpt_tpu.ops.pallas_trace import fits_vmem, trace_closest_pallas
from bpt_tpu.scene.procedural import cornell_box_scene


@pytest.fixture(scope="module")
def scene():
    s, meta, cam = cornell_box_scene(
        32, 32, right_object="glass_sphere", sphere_subdiv=2)
    return s, cam


def test_fits_vmem(scene):
    s, _ = scene
    assert fits_vmem(s.treelets)


def test_pallas_matches_reference(scene):
    s, cam = scene
    cc = cam.device_constants()
    b = 512
    pix = jnp.arange(b, dtype=jnp.int32) % (32 * 32)
    o1, d1 = generate_rays(cc, 32, 32, pix)
    rng = np.random.RandomState(3)
    o2 = jnp.asarray(rng.uniform([-1, 0.1, -1], [1, 1.9, 1],
                                 (b, 3)).astype(np.float32))
    d2 = rng.normal(size=(b, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    cases = [(o1, d1, 1.0, 1000.0), (o2, jnp.asarray(d2), 1e-8, 1e30),
             (o2, jnp.asarray(d2), 0.5, 2.0)]
    for (o, d, mn, mx) in cases:
        h_ref = trace_closest(s.geom, o, d, mn, mx)
        h_pal = trace_closest_pallas(s.treelets, o, d, mn, mx,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(h_ref.valid),
                                      np.asarray(h_pal.valid))
        v = np.asarray(h_ref.valid)
        np.testing.assert_allclose(np.asarray(h_ref.t)[v],
                                   np.asarray(h_pal.t)[v], rtol=1e-5)


@pytest.mark.parametrize("u,tile", [(128, 1024), (8, 512)])
def test_compact_matches_reference(scene, u, tile):
    """The compact-table kernel (per-tile union gather + per-ray loop)
    agrees with the reference tracer, including multi-round unions
    (u=8 forces several compact rounds per tile)."""
    from bpt_tpu.ops.pallas_trace import trace_closest_compact

    s, cam = scene
    cc = cam.device_constants()
    b = 700  # exercises padding too
    pix = jnp.arange(b, dtype=jnp.int32) % (32 * 32)
    o1, d1 = generate_rays(cc, 32, 32, pix)
    rng = np.random.RandomState(3)
    o2 = jnp.asarray(rng.uniform([-1, 0.1, -1], [1, 1.9, 1],
                                 (b, 3)).astype(np.float32))
    d2 = rng.normal(size=(b, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    cases = [(o1, d1, 1.0, 1000.0), (o2, jnp.asarray(d2), 1e-8, 1e30),
             (o2, jnp.asarray(d2), 0.5, 2.0)]
    for (o, d, mn, mx) in cases:
        h_ref = trace_closest(s.geom, o, d, mn, mx)
        h_c = trace_closest_compact(s.treelets, o, d, mn, mx, tile=tile,
                                    u=u, interpret=True)
        np.testing.assert_array_equal(np.asarray(h_ref.valid),
                                      np.asarray(h_c.valid))
        v = np.asarray(h_ref.valid)
        np.testing.assert_allclose(np.asarray(h_ref.t)[v],
                                   np.asarray(h_c.t)[v], rtol=1e-5)
