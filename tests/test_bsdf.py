"""BSDF tests: white-furnace energy, sample<->pdf consistency, delta
behavior (SURVEY.md section 4 item a)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.bsdf import bsdf
from bpt_tpu.core import warp

N = 200_000


def _table():
    """One material of each kind (ids: 0 diffuse, 1 mirror, 2 glass,
    3 phong, 4 mixture)."""
    return bsdf.MaterialTable(
        kind=jnp.array([bsdf.DIFFUSE, bsdf.MIRROR, bsdf.GLASS, bsdf.PHONG,
                        bsdf.MIXTURE], jnp.int32),
        # Phong (row 3) is specular-only here: the reference Phong samples
        # only its specular lobe (phong.h:90-105), so an eval/pdf MC check
        # with a diffuse term would have unbounded variance.
        diffuse=jnp.array(
            [[0.7, 0.5, 0.3], [0, 0, 0], [0, 0, 0], [0.0, 0.0, 0.0],
             [0.5, 0.3, 0.2]], jnp.float32),
        specular=jnp.array(
            [[0, 0, 0], [0, 0, 0], [0, 0, 0], [0.3, 0.3, 0.3],
             [0.4, 0.4, 0.4]], jnp.float32),
        emission=jnp.zeros((5, 3), jnp.float32),
        shininess=jnp.array([1, 1, 1, 30, 10], jnp.float32),
        ior=jnp.array([1, 1, 1.5, 1, 1], jnp.float32),
        transmittance=jnp.array(
            [[0, 0, 0], [0, 0, 0], [1, 1, 1], [0, 0, 0], [0, 0, 0]],
            jnp.float32),
    )


def _wo(n, z=0.6):
    wo = jnp.tile(jnp.array([[np.sqrt(1 - z * z), 0.0, z]], jnp.float32),
                  (n, 1))
    return wo


@pytest.mark.parametrize("mid", [0, 3, 4])
def test_eval_pdf_consistency(mid):
    """MC estimate of int f cos dw two ways: (a) uniform-hemisphere
    eval/pdf, (b) importance sampling val/pdf. Both must agree."""
    mat = _table()
    key = jax.random.key(3)
    wo = _wo(N)
    mids = jnp.full((N,), mid, jnp.int32)

    u = jax.random.uniform(key, (N, 2))
    wi = warp.square_to_uniform_hemisphere(u)
    f = bsdf.eval_bsdf(mat, mids, wo, wi)
    est_a = jnp.mean(f / warp.square_to_uniform_hemisphere_pdf(), axis=0)

    s = bsdf.sample_bsdf(mat, mids, wo, jax.random.uniform(
        jax.random.key(4), (N, 2)))
    w = jnp.where(s.pdf[:, None] > 0, s.value / jnp.maximum(
        s.pdf[:, None], 1e-12), 0.0)
    est_b = jnp.mean(w, axis=0)
    np.testing.assert_allclose(np.asarray(est_a), np.asarray(est_b),
                               rtol=5e-2, atol=5e-3)


def test_diffuse_white_furnace():
    """int f cos dw == albedo exactly for Lambert."""
    mat = _table()
    wo = _wo(N)
    mids = jnp.zeros((N,), jnp.int32)
    s = bsdf.sample_bsdf(mat, mids, wo,
                         jax.random.uniform(jax.random.key(5), (N, 2)))
    est = jnp.mean(s.value / jnp.maximum(s.pdf[:, None], 1e-12), axis=0)
    np.testing.assert_allclose(np.asarray(est), [0.7, 0.5, 0.3], rtol=2e-2)


def test_sampled_pdf_matches_pdf_fn():
    """pdf returned by sample() equals pdf(wo, wi) recomputed."""
    mat = _table()
    wo = _wo(4096, z=0.8)
    for mid in (0, 3, 4):
        mids = jnp.full((4096,), mid, jnp.int32)
        s = bsdf.sample_bsdf(mat, mids, wo,
                             jax.random.uniform(jax.random.key(6), (4096, 2)))
        p = bsdf.pdf_bsdf(mat, mids, wo, s.wi)
        np.testing.assert_allclose(np.asarray(s.pdf), np.asarray(p),
                                   rtol=1e-4, atol=1e-6)


def test_mirror_delta():
    mat = _table()
    wo = _wo(8, z=0.5)
    mids = jnp.ones((8,), jnp.int32)
    s = bsdf.sample_bsdf(mat, mids, wo, jnp.full((8, 2), 0.3))
    np.testing.assert_allclose(
        np.asarray(s.wi), np.asarray(
            jnp.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], axis=-1)), atol=1e-6)
    assert np.allclose(np.asarray(s.value), 1.0)
    assert np.allclose(np.asarray(s.pdf), 1.0)
    assert np.asarray(s.delta).all()
    # eval/pdf of a delta BSDF are identically zero
    # (reference: perfectmirror.h:33-46).
    assert np.allclose(np.asarray(bsdf.eval_bsdf(mat, mids, wo, s.wi)), 0.0)
    assert np.allclose(np.asarray(bsdf.pdf_bsdf(mat, mids, wo, s.wi)), 0.0)


def test_glass_snell_and_tir():
    mat = _table()
    mids = jnp.full((1,), 2, jnp.int32)
    # Normal-ish incidence from outside: u.x >= fresnel -> refraction.
    wo = jnp.array([[0.3, 0.0, np.sqrt(1 - 0.09)]], jnp.float32)
    s = bsdf.sample_bsdf(mat, mids, wo, jnp.array([[0.999, 0.5]]))
    wi = np.asarray(s.wi)[0]
    # Snell: sin_t = sin_i / ior.
    sin_i = 0.3
    sin_t = sin_i / 1.5
    assert np.isclose(np.hypot(wi[0], wi[1]), sin_t, atol=1e-5)
    assert wi[2] < 0  # transmitted into the surface
    # From inside beyond the critical angle: always reflect (TIR).
    sin_c = 1.0 / 1.5
    sin_i = min(0.95, sin_c + 0.2)
    wo_in = jnp.array([[sin_i, 0.0, -np.sqrt(1 - sin_i ** 2)]], jnp.float32)
    s2 = bsdf.sample_bsdf(mat, mids, wo_in, jnp.array([[0.9999, 0.5]]))
    wi2 = np.asarray(s2.wi)[0]
    np.testing.assert_allclose(
        wi2, [-sin_i, 0.0, -np.sqrt(1 - sin_i ** 2)], atol=1e-5)
    assert np.allclose(np.asarray(s2.value)[0], 1.0)  # reflection weight 1


def test_glass_fresnel_split_energy():
    """Average sample weight == fresnel*1 + (1-fresnel)*Tf (pdf folded)."""
    mat = _table()
    n = 100_000
    mids = jnp.full((n,), 2, jnp.int32)
    z = 0.9
    wo = _wo(n, z=z)
    s = bsdf.sample_bsdf(mat, mids, wo,
                         jax.random.uniform(jax.random.key(8), (n, 2)))
    est = float(jnp.mean(s.value[:, 0]))
    assert np.isclose(est, 1.0, atol=2e-2)  # Tf == 1 here


def test_phong_below_horizon_zero():
    """Phong lobe samples below the surface evaluate to 0 but keep a
    positive pdf (reference behavior: eval gates on cosTheta,
    phong.h:61-76)."""
    mat = _table()
    n = 50_000
    mids = jnp.full((n,), 3, jnp.int32)
    wo = _wo(n, z=0.05)  # grazing: much of the lobe dips below horizon
    s = bsdf.sample_bsdf(mat, mids, wo,
                         jax.random.uniform(jax.random.key(9), (n, 2)))
    below = np.asarray(s.wi[:, 2]) < 0
    assert below.any()
    vals = np.asarray(s.value)
    assert np.allclose(vals[below], 0.0)
    assert (np.asarray(s.pdf)[below] > 0).all()


def test_eval_pdfs_lane_matches_separate_calls():
    """The fused connect-shading path (eval_pdfs_lane) must equal the
    separate eval_lane / pdf_lane(fwd) / pdf_lane(rev) calls for every
    material kind and random direction pairs (including below-horizon)."""
    mat = _table()
    n = 4096
    key = jax.random.key(11)
    k1, k2 = jax.random.split(key)

    def unit(k):
        v = jax.random.normal(k, (n, 3))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    wo = unit(k1)
    wi = unit(k2)
    mids = jnp.arange(n, dtype=jnp.int32) % 5
    lane = bsdf.gather_lane(mat, mids)
    f, p_fwd, p_rev = bsdf.eval_pdfs_lane(lane, wo, wi)
    np.testing.assert_allclose(np.asarray(f),
                               np.asarray(bsdf.eval_lane(lane, wo, wi)),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p_fwd),
                               np.asarray(bsdf.pdf_lane(lane, wo, wi)),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p_rev),
                               np.asarray(bsdf.pdf_lane(lane, wi, wo)),
                               rtol=1e-5, atol=1e-7)
