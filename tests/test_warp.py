"""Warp tests: pdf normalization + sample/pdf consistency via Monte Carlo
(SURVEY.md section 4 "do better" item a)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.core import warp
from bpt_tpu.core.math import PI

N = 200_000
KEY = jax.random.key(7)


def _u2(key):
    return jax.random.uniform(key, (N, 2))


def test_uniform_hemisphere_consistency():
    """E[z / pdf] over hemisphere samples == integral of z over the
    hemisphere == pi."""
    d = warp.square_to_uniform_hemisphere(_u2(KEY))
    est = jnp.mean(d[:, 2] / warp.square_to_uniform_hemisphere_pdf())
    assert np.isclose(float(est), PI, rtol=1e-2)
    # All samples in upper hemisphere and unit length.
    assert float(d[:, 2].min()) >= 0.0
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)


def test_cosine_hemisphere_consistency():
    d = warp.square_to_cosine_hemisphere(_u2(KEY))
    pdf = warp.square_to_cosine_hemisphere_pdf(d)
    est = jnp.mean(d[:, 2] / pdf)
    assert np.isclose(float(est), PI, rtol=1e-2)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-4)


def test_cosine_hemisphere_pdf_integrates_to_one():
    """MC-integrate the pdf over the full sphere using uniform-sphere
    samples."""
    d = warp.square_to_uniform_sphere(_u2(KEY))
    pdf = warp.square_to_cosine_hemisphere_pdf(d)
    est = jnp.mean(pdf / warp.square_to_uniform_sphere_pdf())
    assert np.isclose(float(est), 1.0, rtol=2e-2)


@pytest.mark.parametrize("exponent", [1.0, 10.0, 100.0])
def test_phong_lobe_pdf_integral_matches_reference_quirk(exponent):
    """The reference's phong-lobe pdf integrates to (n+2)/(n+1), not 1
    (math.h:210-227 off-by-one between sampler and pdf) -- replicated for
    estimator parity."""
    d = warp.square_to_uniform_sphere(_u2(KEY))
    pdf = warp.square_to_phong_lobe_pdf(d, exponent)
    est = jnp.mean(pdf / warp.square_to_uniform_sphere_pdf())
    expected = (exponent + 2.0) / (exponent + 1.0)
    assert np.isclose(float(est), expected, rtol=5e-2)


@pytest.mark.parametrize("exponent", [2.0, 30.0])
def test_phong_lobe_sample_matches_pdf(exponent):
    """Mean cos(theta) from samples == analytic mean under the pdf."""
    d = warp.square_to_phong_lobe(_u2(KEY), exponent)
    # E[z] = int z (n+2)/(2pi) z^n dw = (n+2)/(n+3).
    expected = (exponent + 2.0) / (exponent + 3.0)
    assert np.isclose(float(jnp.mean(d[:, 2])), expected, rtol=1e-2)


def test_uniform_triangle_mean_is_centroid():
    uv = warp.square_to_uniform_triangle(_u2(KEY))
    # Barycentric mean of a uniform distribution is (1/3, 1/3).
    m = np.asarray(jnp.mean(uv, axis=0))
    assert np.allclose(m, [1.0 / 3.0, 1.0 / 3.0], atol=5e-3)
    uv_np = np.asarray(uv)
    assert (uv_np >= 0).all() and (uv_np.sum(1) <= 1.0 + 1e-6).all()


def test_uniform_sphere_mean_zero():
    d = np.asarray(warp.square_to_uniform_sphere(_u2(KEY)))
    assert np.allclose(d.mean(0), 0.0, atol=5e-3)
