"""Slab-ocean reservoir tests with fabricated smooth training data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry, PhysicalConstants
from speedy_ml_tpu.esn.domain import RegionLayout
from speedy_ml_tpu.esn.ocean import ocean_index_map, rolling_mean
from speedy_ml_tpu.esn.reservoir import ESNHyper
from speedy_ml_tpu.gcm import GCM
from speedy_ml_tpu.hybrid.training import train_hybrid
from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data

GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)


def test_rolling_mean():
    x = jnp.asarray(np.arange(10.0)[:, None, None])
    rm = np.asarray(rolling_mean(x, 4))[:, 0, 0]
    assert rm[0] == 0.0
    assert rm[3] == 1.5          # mean(0,1,2,3)
    assert rm[9] == 7.5          # mean(6,7,8,9)


def test_ocean_index_map_sizes():
    layout = RegionLayout(GEOM, n_regions=128, overlap=1)
    cls = [c for c in layout.classes if c.count == 96][0]
    idx = ocean_index_map(cls, GEOM.nlev)
    xi, yi = cls.input_shape
    # bottom atmo (4 vars) + logp + precip + sst + tisr = 8 patches
    assert len(idx) == 8 * xi * yi
    assert idx.max() < 4 * 8 * xi * yi + 4 * xi * yi


def fabricate_truth(T, dtype=np.float64):
    """Smooth spatio-temporal fields: enough structure to fit, cheap."""
    rng = np.random.default_rng(0)
    lat = GEOM.lat_radians[:, None]
    lon = GEOM.lon_radians[None, :]
    t = np.arange(T)[:, None, None]
    base = np.cos(lat) * np.cos(2 * lon + 0.1 * t) + 0.3 * np.sin(0.05 * t)
    truth = {}
    atmo = np.zeros((T, 4, GEOM.nlev, GEOM.nlat, GEOM.nlon))
    for v in range(4):
        for k in range(GEOM.nlev):
            scale = [250.0, 10.0, 5.0, 5.0][v]
            off = [250.0, 0.0, 0.0, 5.0][v]
            atmo[:, v, k] = off + 0.05 * scale * base * (1 + 0.1 * k) \
                + 0.01 * scale * rng.standard_normal((T, GEOM.nlat, GEOM.nlon))
    truth["atmo"] = jnp.asarray(atmo, dtype=dtype)
    truth["logp"] = jnp.asarray(0.01 * base, dtype=dtype)
    truth["precip"] = jnp.asarray(np.maximum(0.0, 1e-3 * base), dtype=dtype)
    truth["sst"] = jnp.asarray(288.0 + 5.0 * base, dtype=dtype)
    truth["tisr"] = jnp.asarray(300.0 + 100.0 * base, dtype=dtype)
    return truth


@pytest.mark.slow
def test_ocean_coupled_ml_cycle():
    """Train atmo+ocean reservoirs on fabricated data; the coupled ml_only
    loop must update the SST grid on the slab stride and stay finite."""
    from speedy_ml_tpu.core.spectral import SpectralTransform
    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    bd = synthetic_boundary_data(GEOM, sht)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float64, bd=bd)
    layout = RegionLayout(GEOM, n_regions=128, overlap=1)

    T = 120   # 30 days of 6-hourly -> 4 slab samples
    truth = fabricate_truth(T)
    hyper = ESNHyper(m=600, noise_mag=0.0)
    ocean_hyper = ESNHyper(m=300, sigma=0.6, beta_res=1e-4, noise_mag=0.0,
                           using_prior=False)
    hyb = train_hybrid(gcm, layout, truth, None, hyper, jax.random.PRNGKey(1),
                       ocean=True, ocean_hyper=ocean_hyper,
                       n_discard=4, n_batches=4, dtype=jnp.float64)
    assert hyb.ml_only and hyb.ocean_packs is not None
    for op in hyb.ocean_packs:
        assert bool(jnp.isfinite(op.res.wout).all())

    sync = {k: truth[k][-6:] for k in truth}
    hstate = hyb.start_prediction(sync, None, truth["sst"][-1])
    assert len(hstate.ocean) == len(hyb.packs)

    sst0 = np.asarray(hstate.sst_grid)
    for i in range(30):
        hstate, diag = hyb.cycle(hstate, jnp.asarray(0),
                                 jnp.asarray(0.5, jnp.float64),
                                 jnp.asarray(0.1, jnp.float64))
    assert bool(jnp.isfinite(hstate.sst_grid).all())
    sst1 = np.asarray(hstate.sst_grid)
    # SST must have been updated by the ocean reservoirs at step 28
    assert not np.allclose(sst0, sst1)
    # and stay in a physical range
    assert sst1.min() >= 272.0 and sst1.max() < 320.0
