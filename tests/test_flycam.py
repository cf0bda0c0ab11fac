"""Free-fly camera analog (reference CameraRT + WASD event map).

Validates the exact reference motion model (camera.h:36-74: scale 0.5,
rate clamp 5, damping .5/.8) and the interactive progressive loop's
reset-on-motion semantics (renderpass.cpp:419-449's SDL loop analog).
"""
import dataclasses

import numpy as np
import pytest

from bpt_tpu.core.flycam import FlyCamera, parse_commands


def _cam():
    return FlyCamera.from_lookat(o=(0.0, 0.0, 0.0), at=(0.0, 0.0, -1.0),
                                 up=(0.0, 1.0, 0.0), fov=45.0)


def test_move_scale_and_damping():
    c = _cam()
    c.move("w")                       # delta = dir * 0.5 (camera.h:115)
    assert c.update()
    np.testing.assert_allclose(c.position, [0, 0, -0.5], atol=1e-12)
    # delta damps by 0.8 per frame (camera.h:68)
    assert c.update()
    np.testing.assert_allclose(c.position, [0, 0, -0.9], atol=1e-12)


def test_strafe_directions():
    c = _cam()
    c.move("d")                       # +cross(dir, up) = +x... dir=-z:
    c.update()                        # cross(-z, y) = +x? cross((0,0,-1),(0,1,0)) = (1,0,0)... verify numerically
    assert c.position[0] != 0.0 and abs(c.position[1]) < 1e-12
    c2 = _cam()
    c2.move("a")
    c2.update()
    np.testing.assert_allclose(c2.position, -c.position, atol=1e-12)


def test_pitch_clamp_and_rotation():
    c = _cam()
    c.pitch(90.0)                     # clamped to 5 deg/call (camera.h:38)
    assert c._pitch == 5.0
    d0 = c.direction.copy()
    c.update()
    # unit direction, rotated by 5 degrees
    assert abs(np.linalg.norm(c.direction) - 1.0) < 1e-9
    ang = np.degrees(np.arccos(np.clip(np.dot(d0, c.direction), -1, 1)))
    np.testing.assert_allclose(ang, 5.0, atol=1e-6)
    # angular damping: residual 2.5 deg applied next frame (camera.h:66)
    c.update()
    ang2 = np.degrees(np.arccos(np.clip(np.dot(d0, c.direction), -1, 1)))
    np.testing.assert_allclose(ang2, 7.5, atol=1e-6)


def test_combined_rotation_order_matches_reference():
    """glm composes pitch_quat * heading_quat (camera.h:57): heading
    applies FIRST, then pitch about the pre-rotation cross(dir, up)
    axis.  The rotations don't commute, so the order is observable."""
    from bpt_tpu.core.flycam import _rotate

    c = _cam()
    d0 = c.direction.copy()
    up = c.up.copy()
    c.pitch(5.0)
    c.heading(4.0)
    c.update()
    expect = _rotate(np.cross(d0, up), np.radians(5.0),
                     _rotate(up, np.radians(4.0), d0))
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(c.direction, expect, atol=1e-12)
    # and the wrong order (pitch first) would NOT match
    wrong = _rotate(up, np.radians(4.0),
                    _rotate(np.cross(d0, up), np.radians(5.0), d0))
    wrong = wrong / np.linalg.norm(wrong)
    assert not np.allclose(c.direction, wrong, atol=1e-9)


def test_heading_preserves_up_component():
    c = _cam()
    c.heading(4.0)
    c.update()
    assert abs(c.direction[1]) < 1e-12  # rotation about up keeps level


def test_parse_commands():
    evs = list(parse_commands("ww.P+5;.a H-2.5;."))
    assert evs == [("w", 0.0), ("w", 0.0), (".", 0.0), ("P", 5.0),
                   (".", 0.0), ("a", 0.0), ("H", -2.5), (".", 0.0)]
    with pytest.raises(ValueError):
        list(parse_commands("x"))


def test_interactive_loop_resets_on_motion():
    from bpt_tpu.realtime import run_interactive
    from bpt_tpu.scene.procedural import cornell_box_scene
    from bpt_tpu.scene.toml_config import RenderConfig

    w = h = 8
    scene, meta, cam = cornell_box_scene(w, h)
    cfg_t = RenderConfig(
        toml_file="<test>", obj_file="<proc>", camera=cam, width=w,
        height=h, spp=4, integrator="normal", realtime=True)

    writes = []
    img, poses = run_interactive(
        scene, meta, cfg_t, "/tmp/fly_test.exr", commands="..w..",
        write_exr=lambda path, im: writes.append(np.asarray(im).copy()))
    # Two frames accumulate at pose 0; the 'w' keypress then GLIDES
    # (position delta damps 0.8/frame, camera.h:68), so each following
    # frame is a new pose with accumulation reset — exactly the
    # reference's smooth-camera behavior.
    assert [n for n, _ in poses] == [2, 1, 1]
    assert len(writes) == 4
    assert np.isfinite(img).all()
    # the camera genuinely moved between the poses
    p0, p1 = poses[0][1], poses[1][1]
    assert not np.allclose(np.asarray(p0.o), np.asarray(p1.o))
