"""Native (C++) BVH builder must produce a bit-identical FlatBVH to the
numpy reference builder."""
import numpy as np
import pytest

from bpt_tpu.accel.build import build_bvh
from bpt_tpu.native.native import available, build_bvh_native

pytestmark = pytest.mark.skipif(
    not available(), reason="libbpt_native.so not built "
    "(make -C bpt_tpu/native)")


@pytest.mark.parametrize("t", [1, 4, 5, 64, 1000])
def test_native_matches_numpy(t):
    rng = np.random.RandomState(t)
    v0 = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
    a = build_bvh(v0, v1, v2, use_native=False)
    b = build_bvh_native(v0, v1, v2)
    np.testing.assert_array_equal(a.miss, b.miss)
    np.testing.assert_array_equal(a.start, b.start)
    np.testing.assert_array_equal(a.count, b.count)
    np.testing.assert_array_equal(a.prim_order, b.prim_order)
    np.testing.assert_allclose(a.bmin, b.bmin, rtol=1e-6)
    np.testing.assert_allclose(a.bmax, b.bmax, rtol=1e-6)
