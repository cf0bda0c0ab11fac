"""Chi-square goodness-of-fit for every warp (SURVEY.md section 4 item a;
VERDICT r1 item 7).

Each warp's samples are binned on a (cos-theta, phi) grid (or the
relevant 1D/2D domain) and the Pearson chi-square statistic against the
ANALYTIC cell probabilities is gated at the 0.999 quantile of the
chi-square distribution (Wilson-Hilferty approximation — no scipy).
Unlike the moment tests in test_warp.py, a shape error that preserves
low moments (e.g. a swapped trig term) fails here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bpt_tpu.core import warp

N = 400_000
KEY = jax.random.key(11)
NZ, NPHI = 16, 16


def _u2(key=KEY, n=N):
    return jax.random.uniform(key, (n, 2))


def _chi2_crit(dof, z=3.09):
    """0.999 chi-square quantile via Wilson-Hilferty."""
    return dof * (1.0 - 2.0 / (9.0 * dof) + z * np.sqrt(2.0 / (9.0 * dof))) ** 3


def _chi2_grid(d, z_edges, z_cdf):
    """Pearson chi-square of samples `d` (B, 3 unit vectors) on the
    z-bins x phi-bins grid; z_cdf gives P(z <= edge) analytically and
    phi is uniform for every tested warp."""
    d = np.asarray(d)
    z = np.clip(d[:, 2], z_edges[0], z_edges[-1])
    phi = np.arctan2(d[:, 1], d[:, 0])
    zi = np.clip(np.searchsorted(z_edges, z, side="right") - 1, 0, NZ - 1)
    pi = np.clip(((phi + np.pi) / (2 * np.pi) * NPHI).astype(int), 0,
                 NPHI - 1)
    obs = np.zeros((NZ, NPHI))
    np.add.at(obs, (zi, pi), 1.0)
    pz = np.diff(z_cdf(np.asarray(z_edges, np.float64)))
    exp = np.outer(pz, np.full(NPHI, 1.0 / NPHI)) * len(d)
    assert exp.min() > 8, "rebin: expected counts too small"
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    dof = NZ * NPHI - 1
    return chi2, _chi2_crit(dof)


def test_uniform_sphere_chi_square():
    d = warp.square_to_uniform_sphere(_u2())
    edges = np.linspace(-1.0, 1.0, NZ + 1)
    chi2, crit = _chi2_grid(d, edges, lambda e: (e + 1.0) / 2.0)
    assert chi2 < crit, (chi2, crit)


def test_uniform_hemisphere_chi_square():
    d = warp.square_to_uniform_hemisphere(_u2())
    edges = np.linspace(0.0, 1.0, NZ + 1)
    chi2, crit = _chi2_grid(d, edges, lambda e: e)
    assert chi2 < crit, (chi2, crit)


def test_cosine_hemisphere_chi_square():
    d = warp.square_to_cosine_hemisphere(_u2())
    edges = np.linspace(0.0, 1.0, NZ + 1)
    chi2, crit = _chi2_grid(d, edges, lambda e: e ** 2)
    assert chi2 < crit, (chi2, crit)


@pytest.mark.parametrize("n", [1.0, 30.0])
def test_phong_lobe_chi_square(n):
    d = warp.square_to_phong_lobe(_u2(), n)
    # True sampler density (the reference quirk samples cosTheta =
    # u^(1/(n+2)), math.h:210-219): (n+2)/(2 pi) cos^(n+1), so
    # P(z<=e) = e^(n+2).  Equal-probability edges keep expected counts
    # uniform at high n.
    qs = np.linspace(0.0, 1.0, NZ + 1)
    edges = qs ** (1.0 / (n + 2.0))
    chi2, crit = _chi2_grid(d, edges, lambda e: e ** (n + 2.0))
    assert chi2 < crit, (chi2, crit)


def test_uniform_cone_chi_square():
    c = 0.8
    d = warp.square_to_uniform_cone(_u2(), c)
    edges = np.linspace(c, 1.0, NZ + 1)
    chi2, crit = _chi2_grid(d, edges, lambda e: (e - c) / (1.0 - c))
    assert chi2 < crit, (chi2, crit)


def test_concentric_disk_chi_square():
    p = np.asarray(warp.square_to_uniform_disk_concentric(_u2()))
    r = np.sqrt((p ** 2).sum(1))
    phi = np.arctan2(p[:, 1], p[:, 0])
    ri = np.clip((r ** 2 * NZ).astype(int), 0, NZ - 1)  # r^2 uniform
    pi = np.clip(((phi + np.pi) / (2 * np.pi) * NPHI).astype(int), 0,
                 NPHI - 1)
    obs = np.zeros((NZ, NPHI))
    np.add.at(obs, (ri, pi), 1.0)
    exp = np.full((NZ, NPHI), len(p) / (NZ * NPHI))
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    dof = NZ * NPHI - 1
    assert chi2 < _chi2_crit(dof), chi2


def test_uniform_triangle_chi_square():
    """Barycentric marginals of the uniform-triangle warp: u and v each
    have density 2(1-x) on [0,1]."""
    uv = np.asarray(warp.square_to_uniform_triangle(_u2()))
    k = 32
    edges = np.linspace(0.0, 1.0, k + 1)
    cdf = 1.0 - (1.0 - edges) ** 2
    pz = np.diff(cdf)
    for x in (uv[:, 0], uv[:, 1]):
        xi = np.clip(np.searchsorted(edges, x, side="right") - 1, 0, k - 1)
        obs = np.bincount(xi, minlength=k).astype(np.float64)
        exp = pz * len(x)
        chi2 = float(((obs - exp) ** 2 / exp).sum())
        assert chi2 < _chi2_crit(k - 1), chi2
    # joint validity: inside the simplex
    assert (uv.sum(1) <= 1.0 + 1e-6).all() and (uv >= -1e-6).all()


def test_chi_square_catches_shape_error():
    """Sanity: a wrong distribution (uniform z where cosine-weighted is
    claimed) must fail the same gate."""
    d = np.asarray(warp.square_to_uniform_hemisphere(_u2()))
    edges = np.linspace(0.0, 1.0, NZ + 1)
    chi2, crit = _chi2_grid(d, edges, lambda e: e ** 2)  # wrong cdf
    assert chi2 > crit
