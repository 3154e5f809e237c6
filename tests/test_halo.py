"""ppermute halo exchange on the virtual 8-device mesh (VERDICT r1 #5).

Oracle: each device's haloed latitude band must equal the directly
sliced rows of the global field, with pole halos zeroed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.parallel.halo import (halo_exchange_lat, haloed_band,
                                         lat_sharding)
from speedy_ml_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("overlap", [1, 2])
def test_halo_exchange_matches_slices(overlap):
    D = 8
    nlat, nlon = 48, 96
    band = nlat // D
    mesh = make_mesh(D)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((nlat, nlon)))
    f = jax.device_put(f, lat_sharding(mesh, 2))

    out = halo_exchange_lat(f, overlap, mesh)
    out = np.asarray(out)
    g = np.asarray(f)
    for d in range(D):
        hb = haloed_band(out, d, band, overlap)
        lo = d * band
        # core rows
        np.testing.assert_allclose(hb[overlap:overlap + band],
                                   g[lo:lo + band])
        # south halo
        if d == 0:
            assert np.all(hb[:overlap] == 0.0)
        else:
            np.testing.assert_allclose(hb[:overlap],
                                       g[lo - overlap:lo])
        # north halo
        if d == D - 1:
            assert np.all(hb[-overlap:] == 0.0)
        else:
            np.testing.assert_allclose(hb[-overlap:],
                                       g[lo + band:lo + band + overlap])


def test_halo_exchange_leading_dims():
    """Works for (V, K, lat, lon) stacked fields."""
    D = 4
    mesh = make_mesh(D)
    nlat, nlon = 16, 32
    band = nlat // D
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((4, 2, nlat, nlon)))
    f = jax.device_put(f, lat_sharding(mesh, 4))
    out = np.asarray(halo_exchange_lat(f, 1, mesh))
    g = np.asarray(f)
    hb = haloed_band(out, 1, band, 1)
    np.testing.assert_allclose(hb[..., 1:1 + band, :],
                               g[..., band:2 * band, :])
    np.testing.assert_allclose(hb[..., 0, :], g[..., band - 1, :])
    np.testing.assert_allclose(hb[..., -1, :], g[..., 2 * band, :])
