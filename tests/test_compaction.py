"""Live-lane compaction (ops/compaction.py): semantics + kernel
round-trips through the interpret-mode Pallas tracers.

Covers VERDICT r2 item 1b: compaction must be a pure re-ordering — the
compacted trace's gathered-back results must equal tracing the original
batch, dead lanes must land in trailing all-dead tiles (which the
kernels' early exit then skips), and live-lane order must be preserved
(ray coherence depends on it)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.ops.compaction import compact_rays, uncompact


def _random_rays(n, seed=0, live_frac=0.3):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    live = rs.rand(n) < live_frac
    min_t = np.full(n, 1e-4, np.float32)
    max_t = np.where(live, 100.0, -1.0).astype(np.float32)
    return (jnp.asarray(o), jnp.asarray(d), jnp.asarray(min_t),
            jnp.asarray(max_t), live)


def test_compact_is_stable_partition():
    o, d, mn, mx, live = _random_rays(777, seed=3)
    oc, dc, mnc, mxc, plan = compact_rays(o, d, mn, mx)
    n = int(live.sum())
    # live lanes packed to the front, original (stable) order
    np.testing.assert_array_equal(np.asarray(oc)[:n], np.asarray(o)[live])
    np.testing.assert_array_equal(np.asarray(dc)[:n], np.asarray(d)[live])
    np.testing.assert_array_equal(np.asarray(mxc)[:n],
                                  np.asarray(mx)[live])
    # trailing slots degenerate
    assert np.all(np.asarray(mxc)[n:] < np.asarray(mnc)[n:])
    # plan round-trips per-lane payloads
    payload = jnp.arange(o.shape[0], dtype=jnp.float32)
    back = uncompact(payload, plan, -1.0)
    exp = np.full(o.shape[0], -1.0, np.float32)
    exp[live] = np.arange(n)
    np.testing.assert_array_equal(np.asarray(back), exp)


def test_compact_all_dead_and_all_live():
    o, d, mn, mx, _ = _random_rays(64, seed=4, live_frac=1.0)
    oc, _dc, mnc, mxc, plan = compact_rays(o, d, mn, mx)
    np.testing.assert_array_equal(np.asarray(oc), np.asarray(o))
    assert bool(jnp.all(plan.valid))

    mx0 = jnp.full((64,), -1.0)
    _oc, _dc, mnc, mxc, plan = compact_rays(o, d, mn, mx0)
    assert not bool(jnp.any(plan.valid))
    assert np.all(np.asarray(mxc) < np.asarray(mnc))
    occ = uncompact(jnp.ones((64,), bool), plan, False)
    assert not bool(jnp.any(occ))


@pytest.fixture(scope="module")
def cbox_scene():
    from bpt_tpu.scene.procedural import cornell_box_scene

    s, _meta, _cam = cornell_box_scene(
        32, 32, right_object="glass_sphere", sphere_subdiv=2)
    return s


@pytest.mark.parametrize("kind", ["any", "closest"])
def test_compacted_trace_matches_reference(cbox_scene, kind):
    """Compacted interpret-mode Pallas trace == skip-link tracer on the
    original batch (dead lanes: miss/unoccluded)."""
    from bpt_tpu.accel import traverse
    from bpt_tpu.ops import pallas_sweep, pallas_trace

    scene = cbox_scene
    n = 512
    rs = np.random.RandomState(11)
    o = rs.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    o[:, 2] += 0.2
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    live = rs.rand(n) < 0.35
    mn = np.full(n, 1e-4, np.float32)
    mx = np.where(live, np.inf, -1.0).astype(np.float32)
    o, d, mn, mx = map(jnp.asarray, (o, d, mn, mx))

    oc, dc, mnc, mxc, plan = compact_rays(o, d, mn, mx)
    if kind == "any":
        occ_c = pallas_sweep.trace_any_sweep(scene.treelets_any or
                                             scene.treelets,
                                             oc, dc, mnc, mxc,
                                             interpret=True)
        got = uncompact(occ_c, plan, False)
        ref = traverse.trace_any(scene.geom, o, d, mn, mx)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # dead lanes must be reported unoccluded
        assert not np.any(np.asarray(got)[~live])
    else:
        h_c = pallas_trace.trace_closest_compact(scene.treelets, oc, dc,
                                                 mnc, mxc, interpret=True)
        tri = uncompact(h_c.tri, plan, -1)
        t = uncompact(h_c.t, plan, jnp.inf)
        ref = traverse.trace_closest(scene.geom, o, d, mn, mx)
        live_j = jnp.asarray(live)
        np.testing.assert_array_equal(
            np.asarray(tri)[live], np.asarray(ref.tri)[live])
        np.testing.assert_allclose(
            np.asarray(t)[live & np.asarray(ref.valid)],
            np.asarray(ref.t)[live & np.asarray(ref.valid)], rtol=1e-5)
        assert np.all(np.asarray(tri)[~live] == -1)
