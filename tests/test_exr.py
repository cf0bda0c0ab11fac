"""EXR round trip + reading the reference renderer's artifacts."""
import os

import numpy as np
import pytest

from bpt_tpu.io.exr import read_exr, write_exr

REF_EXR = (
    "/root/reference/data/a5/bonus_bdpt/tinyrender/cbox_bdpt.exr"
)


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("half", [True, False])
def test_roundtrip(tmp_path, compression, half):
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 4, (37, 53, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=half, compression=compression)
    back = read_exr(p)
    if half:
        np.testing.assert_allclose(back, img.astype(np.float16), rtol=1e-3,
                                   atol=1e-3)
    else:
        np.testing.assert_array_equal(back, img)


@pytest.mark.skipif(not os.path.exists(REF_EXR),
                    reason="reference artifacts not mounted")
def test_read_reference_exr():
    img = read_exr(REF_EXR)
    assert img.shape == (600, 800, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.1  # a real render, not black
