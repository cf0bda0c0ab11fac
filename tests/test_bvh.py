"""BVH traversal vs. brute force: exact agreement on closest hit and
occlusion (SURVEY.md section 4 item b analog for the accel layer)."""
import jax.numpy as jnp
import numpy as np

from bpt_tpu.accel.build import build_bvh
from bpt_tpu.accel.traverse import TraceGeom, trace_any, trace_closest
from bpt_tpu.core.math import EPSILON, T_MIN_HIT


def _random_soup(rng, n_tris=300, spread=2.0):
    v0 = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    return v0, v1, v2


def _geom_from(v0, v1, v2):
    bvh = build_bvh(v0, v1, v2)
    perm = bvh.prim_order
    v0r, v1r, v2r = v0[perm], v1[perm], v2[perm]
    pad = np.zeros((4, 3), np.float32)
    return TraceGeom(
        v0=jnp.asarray(np.concatenate([v0r, pad])),
        e1=jnp.asarray(np.concatenate([v1r - v0r, pad])),
        e2=jnp.asarray(np.concatenate([v2r - v0r, pad])),
        node_bmin=jnp.asarray(bvh.bmin),
        node_bmax=jnp.asarray(bvh.bmax),
        node_miss=jnp.asarray(bvh.miss),
        node_start=jnp.asarray(bvh.start),
        node_count=jnp.asarray(bvh.count),
    ), (v0r, v1r, v2r)


def _brute_force(v0, e1, e2, o, d, min_t, max_t):
    """Reference Moeller-Trumbore over all triangles
    (reference: core.h:379-400 + accel.h:43 t cutoff)."""
    pvec = np.cross(d[None], e2)
    det = (e1 * pvec).sum(-1)
    ok = np.abs(det) >= EPSILON
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o[None] - v0
    u = (tvec * pvec).sum(-1) * inv
    qvec = np.cross(tvec, e1)
    v = (d[None] * qvec).sum(-1) * inv
    t = (e2 * qvec).sum(-1) * inv
    ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    ok &= (t > T_MIN_HIT) & (t >= min_t) & (t <= max_t)
    if not ok.any():
        return None
    ts = np.where(ok, t, np.inf)
    i = int(np.argmin(ts))
    return i, float(ts[i])


def test_closest_matches_brute_force():
    rng = np.random.RandomState(11)
    v0, v1, v2 = _random_soup(rng)
    geom, (v0r, v1r, v2r) = _geom_from(v0, v1, v2)
    e1r, e2r = v1r - v0r, v2r - v0r

    n_rays = 256
    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    hit = trace_closest(geom, jnp.asarray(o), jnp.asarray(d), 1e-8, 1e30)
    tri = np.asarray(hit.tri)
    t = np.asarray(hit.t)
    valid = np.asarray(hit.valid)
    for i in range(n_rays):
        bf = _brute_force(v0r, e1r, e2r, o[i], d[i], 1e-8, 1e30)
        if bf is None:
            assert not valid[i]
        else:
            assert valid[i]
            assert tri[i] == bf[0] or np.isclose(t[i], bf[1], rtol=1e-5)
            assert np.isclose(t[i], bf[1], rtol=1e-5)


def test_ray_window_respected():
    """min_t/max_t clamping (reference: bvh.h:261-277 author
    modification)."""
    rng = np.random.RandomState(13)
    v0, v1, v2 = _random_soup(rng, n_tris=100)
    geom, (v0r, v1r, v2r) = _geom_from(v0, v1, v2)
    e1r, e2r = v1r - v0r, v2r - v0r
    n_rays = 128
    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    min_t, max_t = 1.0, 3.0
    hit = trace_closest(geom, jnp.asarray(o), jnp.asarray(d), min_t, max_t)
    t = np.asarray(hit.t)
    valid = np.asarray(hit.valid)
    assert ((t[valid] >= min_t) & (t[valid] <= max_t)).all()
    for i in range(n_rays):
        bf = _brute_force(v0r, e1r, e2r, o[i], d[i], min_t, max_t)
        assert (bf is not None) == bool(valid[i])
        if bf is not None:
            assert np.isclose(t[i], bf[1], rtol=1e-5)


def test_any_hit_matches_brute_force():
    rng = np.random.RandomState(17)
    v0, v1, v2 = _random_soup(rng, n_tris=200)
    geom, (v0r, v1r, v2r) = _geom_from(v0, v1, v2)
    e1r, e2r = v1r - v0r, v2r - v0r
    n_rays = 256
    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    min_t, max_t = 0.5, 4.0
    occ = np.asarray(trace_any(geom, jnp.asarray(o), jnp.asarray(d),
                               min_t, max_t))
    for i in range(n_rays):
        bf = _brute_force(v0r, e1r, e2r, o[i], d[i], min_t, max_t)
        assert (bf is not None) == bool(occ[i])


def test_bvh_structure_valid():
    rng = np.random.RandomState(19)
    v0, v1, v2 = _random_soup(rng, n_tris=500)
    bvh = build_bvh(v0, v1, v2)
    n = bvh.n_nodes
    # Miss links strictly increase and stay in range.
    assert (bvh.miss > np.arange(n)).all()
    assert (bvh.miss <= n).all()
    # Leaves cover every primitive exactly once.
    leaf = bvh.count > 0
    covered = np.concatenate(
        [np.arange(s, s + c) for s, c in zip(bvh.start[leaf],
                                             bvh.count[leaf])]
    )
    assert sorted(covered) == list(range(500))
    assert (bvh.count <= 4).all()
    # prim_order is a permutation.
    assert sorted(bvh.prim_order) == list(range(500))


def test_sah_build_matches_brute_force():
    """The SAH build produces identical hit results (structure-independent
    semantics) with a valid flat encoding."""
    import jax.numpy as jnp

    from bpt_tpu.accel.build import build_bvh
    from bpt_tpu.accel.traverse import TraceGeom, trace_closest

    rng = np.random.RandomState(23)
    v0, v1, v2 = _random_soup(rng, n_tris=400)
    for method in ("midpoint", "sah"):
        bvh = build_bvh(v0, v1, v2, use_native=False, method=method)
        n = bvh.n_nodes
        assert (bvh.miss > np.arange(n)).all() and (bvh.miss <= n).all()
        leaf = bvh.count > 0
        covered = np.concatenate(
            [np.arange(s, s + c) for s, c in zip(bvh.start[leaf],
                                                 bvh.count[leaf])])
        assert sorted(covered) == list(range(400))
    b_mid = build_bvh(v0, v1, v2, use_native=False, method="midpoint")
    b_sah = build_bvh(v0, v1, v2, use_native=False, method="sah")
    o = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    def geom(b):
        v0r = v0[b.prim_order]
        e1 = v1[b.prim_order] - v0r
        e2 = v2[b.prim_order] - v0r
        return TraceGeom(
            v0=jnp.asarray(np.concatenate([v0r, np.zeros((4, 3), np.float32)])),
            e1=jnp.asarray(np.concatenate([e1, np.zeros((4, 3), np.float32)])),
            e2=jnp.asarray(np.concatenate([e2, np.zeros((4, 3), np.float32)])),
            node_bmin=jnp.asarray(b.bmin), node_bmax=jnp.asarray(b.bmax),
            node_miss=jnp.asarray(b.miss), node_start=jnp.asarray(b.start),
            node_count=jnp.asarray(b.count),
        )

    h1 = trace_closest(geom(b_mid), jnp.asarray(o), jnp.asarray(d), 1e-8, 1e30)
    h2 = trace_closest(geom(b_sah), jnp.asarray(o), jnp.asarray(d), 1e-8, 1e30)
    np.testing.assert_array_equal(np.asarray(h1.valid), np.asarray(h2.valid))
    v = np.asarray(h1.valid)
    np.testing.assert_allclose(np.asarray(h1.t)[v], np.asarray(h2.t)[v],
                               rtol=1e-5)
