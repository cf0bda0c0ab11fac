"""Camera tests: raygen <-> splat round trip (the reference keeps
splatToImagePlane on the Renderer 'just for unit testing',
reference: src/core/renderer.h:35-47 -- here we actually test it)."""
import jax.numpy as jnp
import numpy as np

from bpt_tpu.core.camera import Camera, generate_rays, splat_to_image_plane


def _cam(w=64, h=48, fov=30.0):
    return Camera.make(o=[0.0, 0.8, 3.8], at=[0.0, 0.8, 0.0],
                       up=[0.0, 1.0, 0.0], fov=fov, width=w, height=h)


def test_splat_roundtrip():
    cam = _cam()
    cc = cam.device_constants()
    w, h = cam.width, cam.height
    pix = jnp.arange(w * h, dtype=jnp.int32)
    o, d = generate_rays(cc, w, h, pix)
    # A point along each center ray must splat back to its own pixel.
    p = o + d * 2.5
    x, y, ok = splat_to_image_plane(cc, w, h, p)
    assert bool(jnp.all(ok))
    back = np.asarray(y) * w + np.asarray(x)
    assert (back == np.asarray(pix)).all()


def test_splat_rejects_outside():
    cam = _cam()
    cc = cam.device_constants()
    # A point far off to the side.
    p = jnp.array([[100.0, 0.8, 0.0]])
    _, _, ok = splat_to_image_plane(cc, cam.width, cam.height, p)
    assert not bool(ok[0])


def test_rays_through_lookat():
    """The center pixel's ray passes (approximately) through `at`."""
    cam = _cam(w=65, h=49)  # odd so there is an exact center pixel
    cc = cam.device_constants()
    center = (49 // 2) * 65 + 65 // 2
    o, d = generate_rays(cc, 65, 49, jnp.array([center], jnp.int32))
    o = np.asarray(o)[0]
    d = np.asarray(d)[0]
    at = np.array([0.0, 0.8, 0.0])
    t = np.dot(at - o, d)
    closest = o + t * d
    assert np.linalg.norm(closest - at) < 1e-3


def test_jitter_stays_in_pixel_neighborhood():
    cam = _cam()
    cc = cam.device_constants()
    pix = jnp.zeros((16,), jnp.int32) + 100
    jit = jnp.asarray(np.random.RandomState(0).uniform(size=(16, 2)),
                      jnp.float32)
    o, d = generate_rays(cc, cam.width, cam.height, pix, jitter=jit)
    p = o + d * 2.5
    x, y, ok = splat_to_image_plane(cc, cam.width, cam.height, p)
    # Reference jitter spans only half an NDC pixel (renderer.cpp:183-192),
    # so all jittered rays stay within the pixel.
    assert bool(jnp.all(ok))
    assert (np.asarray(y) * cam.width + np.asarray(x) == 100).all()
