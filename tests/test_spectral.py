"""Analytic property tests for the spectral transform core.

With no runnable Fortran oracle in this image, correctness is anchored on
mathematical identities of spherical harmonics: quadrature exactness,
round-trip idempotence, Laplacian eigenvalues, vor/div <-> u,v consistency.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry, SpectralTransform

GEOM = Geometry()
A = 6.371e6


@pytest.fixture(scope="module")
def sht():
    return SpectralTransform(GEOM, radius=A, dtype=jnp.float64)


def random_spec(sht, seed=0, nfields=()):
    """Random spectral coefficient array supported on the transform mask."""
    rng = np.random.default_rng(seed)
    shape = (*nfields, GEOM.mx, GEOM.nx)
    v = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    ll = np.add.outer(np.arange(GEOM.mx), np.arange(GEOM.nx))
    v = np.where(ll <= GEOM.trunc, v, 0.0)
    # m=0 coefficients must be real for a real field
    v[..., 0, :] = v[..., 0, :].real
    # specy never fills the last n row
    v[..., :, -1] = 0.0
    return jnp.asarray(v)


def test_gaussian_weights_sum():
    g = GEOM
    assert np.isclose(2.0 * g.wt.sum(), 2.0, atol=1e-14)
    # Gaussian quadrature integrates P_2(x) = (3x^2-1)/2 to zero exactly
    p2 = 0.5 * (3 * g.sia**2 - 1.0)
    assert abs(2.0 * (g.wt * p2).sum()) < 1e-13


def test_roundtrip_spec_grid_spec(sht):
    v = random_spec(sht, seed=1)
    g = sht.spec_to_grid(v)
    v2 = sht.grid_to_spec(g)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-12)


def test_roundtrip_batched(sht):
    v = random_spec(sht, seed=2, nfields=(3, 8))
    g = sht.spec_to_grid(v)
    assert g.shape == (3, 8, GEOM.nlat, GEOM.nlon)
    v2 = sht.grid_to_spec(g)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-12)


def test_constant_field(sht):
    g = jnp.ones((GEOM.nlat, GEOM.nlon), dtype=jnp.float64)
    v = sht.grid_to_spec(g)
    # Y_0^0 normalization: mean field -> coefficient sqrt(1/2)*2 = sqrt(2)
    # (reference stores ccon = sqrt(2) for a unit global mean, ini_invars.f90:28)
    assert np.isclose(np.asarray(v)[0, 0].real, np.sqrt(2.0), atol=1e-13)
    g2 = sht.spec_to_grid(v)
    np.testing.assert_allclose(np.asarray(g2), 1.0, atol=1e-13)


def test_laplacian_eigenvalue(sht):
    """For a single (m,n) harmonic: lap = -l(l+1)/a^2 * identity on grid."""
    for (m, n) in [(0, 2), (5, 3), (12, 0), (3, 7)]:
        v = np.zeros((GEOM.mx, GEOM.nx), dtype=np.complex128)
        v[m, n] = 1.0 + (0.5j if m > 0 else 0.0)
        v = jnp.asarray(v)
        ell = m + n
        g = sht.spec_to_grid(v)
        g_lap = sht.spec_to_grid(sht.lap(v))
        np.testing.assert_allclose(
            np.asarray(g_lap), -ell * (ell + 1) / A**2 * np.asarray(g),
            atol=1e-18, rtol=1e-10)


def test_invlap_inverts_lap(sht):
    v = random_spec(sht, seed=3)
    v = v.at[0, 0].set(0.0)  # global mean not invertible
    np.testing.assert_allclose(np.asarray(sht.invlap(sht.lap(v))),
                               np.asarray(v), atol=1e-12)


def test_uv_vor_div_consistency(sht):
    """vdspec(uv_grid(vor, div)) must recover vor, div (truncated).

    The l=0 mode is excluded: a nonzero global-mean vorticity/divergence is
    unphysical on the sphere (area integral must vanish) and is outside the
    range of the wind operators, so it cannot round-trip.
    """
    vor = random_spec(sht, seed=4) * 1e-5
    div = random_spec(sht, seed=5) * 1e-5
    vor = sht.trunct(vor).at[0, 0].set(0.0)
    div = sht.trunct(div).at[0, 0].set(0.0)
    u, v = sht.uv_grid(vor, div)
    vor2, div2 = sht.vdspec(u, v, kcos=2)
    np.testing.assert_allclose(np.asarray(sht.trunct(vor2)), np.asarray(vor),
                               atol=1e-16)
    np.testing.assert_allclose(np.asarray(sht.trunct(div2)), np.asarray(div),
                               atol=1e-16)


def test_gradient_of_harmonic_zonal(sht):
    """d/dlon of exp(i m lon) harmonic = i m * field; check via grad()."""
    m, n = 4, 2
    v = np.zeros((GEOM.mx, GEOM.nx), dtype=np.complex128)
    v[m, n] = 1.0 + 0.3j
    v = jnp.asarray(v)
    dx, _ = sht.grad(v)
    # zonal derivative in spectral space is i*m/a exactly
    np.testing.assert_allclose(np.asarray(dx)[m, n], 1j * m / A * np.asarray(v)[m, n],
                               rtol=1e-12)


def test_grad_analytic(sht):
    """Gradient of analytic low-order fields.

    grad() + spec_to_grid(kcos=2) yields (1/(a cos)) d/dlon and (1/a) d/dlat
    (the combination used on log-ps in grtend).
    """
    mu = GEOM.sin_lat[:, None]
    cos = GEOM.cos_lat[:, None]
    lon = GEOM.lon_radians[None, :]

    # f = mu^2 (zonally symmetric, l<=2): df/dlat/a = 2 mu cos / a
    f = jnp.asarray(np.broadcast_to(mu**2, (GEOM.nlat, GEOM.nlon)))
    dxs, dys = sht.grad(sht.grid_to_spec(f))
    gx = np.asarray(sht.spec_to_grid(dxs, kcos=2))
    gy = np.asarray(sht.spec_to_grid(dys, kcos=2))
    np.testing.assert_allclose(gx, 0.0, atol=1e-18)
    np.testing.assert_allclose(gy, 2.0 * mu * cos / A * np.ones_like(gy),
                               atol=1e-19)

    # f = cos(lat) * cos(lon)  (one l=1 harmonic):
    #   (1/(a cos)) df/dlon = -sin(lon)/a ; (1/a) df/dlat = -mu cos(lon)/a
    f2 = jnp.asarray(cos * np.cos(lon))
    dxs2, dys2 = sht.grad(sht.grid_to_spec(f2))
    gx2 = np.asarray(sht.spec_to_grid(dxs2, kcos=2))
    gy2 = np.asarray(sht.spec_to_grid(dys2, kcos=2))
    np.testing.assert_allclose(gx2, -np.sin(lon) / A * np.ones_like(gx2),
                               atol=1e-19)
    np.testing.assert_allclose(gy2, -mu * np.cos(lon) / A, atol=1e-19)
