"""Bitmap texture tests: PPM/PFM loaders + UV lookup + render wiring."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.scene import textures
from bpt_tpu.scene.obj import Material, ObjData, Shape
from bpt_tpu.scene.scene import build_scene


def _write_ppm(path, img_u8):
    h, w, _ = img_u8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img_u8.tobytes())


def test_ppm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (4, 6, 3), np.uint8)
    p = str(tmp_path / "t.ppm")
    _write_ppm(p, img)
    loaded = textures.load_ppm(p)
    # Gamma-expanded + vertically flipped (reference core.h:430-443).
    expected = np.power(img[::-1].astype(np.float32) / 255.0, 2.2)
    np.testing.assert_allclose(loaded, expected, rtol=1e-5)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.rand(3, 5, 3).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    with open(p, "wb") as f:
        f.write(b"PF\n5 3\n-1.0\n")
        f.write(img[::-1].astype("<f4").tobytes())
    loaded = textures.load_pfm(p)
    np.testing.assert_allclose(loaded, img, rtol=1e-6)


def _textured_quad_scene(tmp_path):
    """A single textured quad facing +z with UVs spanning [0,1]^2."""
    tex = np.zeros((2, 2, 3), np.uint8)
    tex[0, 0] = (255, 0, 0)    # will be at v in [0,.5) after flip... checked
    tex[1, 1] = (0, 255, 0)
    p = str(tmp_path / "quad.ppm")
    _write_ppm(p, tex)
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    shape = Shape(
        name="quad",
        v_idx=np.array([[0, 1, 2], [0, 2, 3]], np.int64),
        n_idx=np.full((2, 3), -1, np.int64),
        t_idx=np.array([[0, 1, 2], [0, 2, 3]], np.int64),
        mat_ids=np.zeros(2, np.int64),
    )
    mat = Material(name="m", diffuse=np.array([0.5, 0.5, 0.5], np.float32),
                   illum=7, diffuse_texname=p)
    obj = ObjData(
        vertices=verts,
        normals=np.zeros((0, 3), np.float32),
        texcoords=uvs,
        shapes=[shape],
        materials=[mat],
    )
    return build_scene(obj)


def test_albedo_at_lookup(tmp_path):
    scene, meta = _textured_quad_scene(tmp_path)
    assert int(scene.tex_atlas.shape[0]) == 1
    # Hit the first triangle near vertex 0 (uv ~ (0,0)): texel at
    # st=(0,0) -> x=0, y=0 of the flipped image = original bottom row.
    tri = jnp.zeros((1,), jnp.int32)
    # Find which stored triangle corresponds to uv0=(0,0).
    got = None
    for t in range(2):
        kd = textures.albedo_at(
            scene, jnp.full((1,), t, jnp.int32),
            jnp.full((1,), 0.01), jnp.full((1,), 0.01))
        got = np.asarray(kd)[0] if got is None else got
    assert got is not None
    # Corner texels are pure red/green/black after gamma; lookup returns a
    # valid gamma-expanded texel, not the constant 0.5 albedo.
    kd00 = np.asarray(textures.albedo_at(
        scene, jnp.zeros((1,), jnp.int32), jnp.full((1,), 0.0),
        jnp.full((1,), 0.0)))[0]
    assert not np.allclose(kd00, 0.5)


def test_untextured_scene_has_no_override():
    from bpt_tpu.scene.procedural import cornell_box_scene

    scene, meta, cam = cornell_box_scene(16, 16)
    assert scene.tex_atlas.shape[0] == 0
    assert textures.albedo_at(scene, jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1,)), jnp.zeros((1,))) is None


def test_textured_render_runs(tmp_path):
    """End-to-end: a textured scene renders without error and the texture
    affects the image."""
    import dataclasses

    from bpt_tpu.core.camera import Camera
    from bpt_tpu.integrators.misc import MiscConfig, render_image_misc

    scene, meta = _textured_quad_scene(tmp_path)
    cam = Camera.make(o=[0.5, 0.5, 2.0], at=[0.5, 0.5, 0.0],
                      up=[0, 1, 0], fov=40, width=16, height=16)
    cfg = MiscConfig(16, 16, spp=1, integrator="simple")
    img, _ = render_image_misc(scene, meta, cam, cfg)
    assert np.isfinite(np.asarray(img)).all()


def test_texture_interface_parity(tmp_path):
    """Texture<T> eval/average/min/max parity (reference core.h:405-640),
    including the BitmapTexture1f flat-indexing and size/3 min/max quirks."""
    c3 = textures.ConstantTexture3f([0.2, 0.4, 0.6])
    np.testing.assert_allclose(c3.eval(), [0.2, 0.4, 0.6])
    np.testing.assert_allclose(c3.average(), c3.min())
    c1 = textures.ConstantTexture1f(0.7)
    assert c1.eval() == c1.average() == c1.min() == c1.max() == 0.7

    rng = np.random.RandomState(2)
    img = rng.rand(4, 5, 3).astype(np.float32)
    b3 = textures.BitmapTexture3f(img)
    np.testing.assert_allclose(b3.average(), img.reshape(-1, 3).mean(0),
                               rtol=1e-6)
    np.testing.assert_allclose(b3.min(), img.reshape(-1, 3).min(0))
    np.testing.assert_allclose(b3.max(), img.reshape(-1, 3).max(0))
    # eval: +1 wrap, nearest texel
    np.testing.assert_allclose(b3.eval([0.5 / 5, 0.5 / 4]), img[0, 0])
    np.testing.assert_allclose(b3.eval([1.0 + 0.5 / 5, 0.5 / 4]),
                               img[0, 0])  # wrap
    np.testing.assert_allclose(b3.eval([-0.9, 0.6]), img[2, 0])

    b1 = textures.BitmapTexture1f(img)
    flat = img.reshape(-1)
    # quirk: flat index w*y+x into the interleaved array
    assert b1.eval([2.5 / 5, 1.5 / 4]) == flat[5 * 1 + 2]
    assert b1.average() == pytest.approx(flat.mean(), rel=1e-6)
    assert b1.min() == flat[: flat.size // 3].min()
    assert b1.max() == flat[: flat.size // 3].max()
