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


def test_streamed_ocean_series_matches_inmemory():
    """ocean_series_production (streamed, chunk-carried rolling mean)
    must equal the in-memory train_ocean_class series construction."""
    from speedy_ml_tpu.esn.ocean import (ocean_target_slice, rolling_mean,
                                         sst_core_from_input)
    from speedy_ml_tpu.hybrid.chunked import (ArraySource,
                                              ocean_series_production,
                                              streaming_standardizer)
    from speedy_ml_tpu.hybrid.training import pack_class_series

    layout = RegionLayout(GEOM, n_regions=128, overlap=1)
    cls = [c for c in layout.classes if c.count == 96][0]
    T, W = 40, 7
    truth = fabricate_truth(T)
    src = ArraySource({k: np.asarray(v) for k, v in truth.items()})
    std = streaming_standardizer(layout, cls, src, GEOM.nlev,
                                 dtype=jnp.float64)

    o_s, t_s, base = ocean_series_production(
        layout, cls, std, src, GEOM.nlev, slab_stride=W, time_chunk=9,
        dtype=jnp.float64)

    series = pack_class_series(layout, cls, truth).astype(jnp.float64)
    z = std.standardize_input(series)
    from speedy_ml_tpu.esn.ocean import ocean_index_map
    idx = jnp.asarray(ocean_index_map(cls, GEOM.nlev))
    o_ref = rolling_mean(z[:, :, idx], W)[W - 1::W]
    sl = ocean_target_slice(cls, GEOM.nlev)
    blk = z[W - 1::W][:, :, sl[0]:sl[1]]
    t_ref = sst_core_from_input(
        cls, blk.reshape(-1, blk.shape[2])).reshape(blk.shape[0],
                                                    blk.shape[1], -1)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_ref),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_ref),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(base),
                               np.asarray(truth["sst"]).mean(axis=0),
                               rtol=1e-12)


def test_hybrid_slab_readout_uses_persisted_outvec():
    """predict_slab parity: the hybrid slab readout consumes its OWN
    previous output as the local model and persists the new one
    (mod_slab_ocean_reservoir.f90:1201-1249)."""
    import dataclasses as dc
    from speedy_ml_tpu.esn.reservoir import esn_step, readout
    from speedy_ml_tpu.hybrid.chunked import (ArraySource,
                                              train_hybrid_production)
    from speedy_ml_tpu.core.spectral import SpectralTransform

    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    bd = synthetic_boundary_data(GEOM, sht)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float64, bd=bd)
    layout = RegionLayout(GEOM, n_regions=128, overlap=1)
    T, W = 60, 5
    truth = fabricate_truth(T)
    src = ArraySource({k: np.asarray(v) for k, v in truth.items()})
    hyper = ESNHyper(m=600, noise_mag=0.0)
    ohyper = ESNHyper(m=300, sigma=0.6, beta_res=1e-4, noise_mag=0.0,
                      using_prior=False)
    hyb = train_hybrid_production(
        gcm, layout, src, hyper, jax.random.PRNGKey(2), hybrid=False,
        ocean=True, ocean_hyper=ohyper, hybrid_ocean=True, slab_stride=W,
        n_discard=2, dtype=jnp.float64)
    hyb.SLAB_STRIDE = W
    for op in hyb.ocean_packs:
        assert op.hybrid_readout
        # wout carries the S_o local-model block
        O = op.res.n_outputs
        assert op.res.wout.shape[2] == O + op.res.n

    sync = {k: v[: 3 * W] for k, v in truth.items()}
    hstate = hyb.start_prediction(sync, None, truth["sst"][3 * W - 1])
    assert hstate.ocean[0].lm is not None
    lm_seed = np.asarray(hstate.ocean[0].lm)

    args = (jnp.asarray(0), jnp.asarray(0.5, jnp.float64),
            jnp.asarray(0.05, jnp.float64))
    # W cycles: the slab steps exactly once, on the last cycle
    st = hstate
    for _ in range(W):
        st, _ = hyb.cycle(st, *args)
    ocs0, ocs1 = hstate.ocean[0], st.ocean[0]
    # manual replay of the single slab step from the recorded buffer
    op = hyb.ocean_packs[0]
    fb_mean = np.asarray(ocs1.buffer).mean(axis=0)  # buffer AFTER? recompute
    # recompute expected: run the W cycles' buffers forward on host
    # (cheapest correct check: lm changed, equals readout with lm block)
    assert not np.allclose(np.asarray(ocs1.lm), lm_seed)
    x_new = np.asarray(ocs1.x)
    # the persisted lm must equal the standardized outvec of this step:
    # reconstruct from x_new and the seed lm
    out = readout(op.res, jnp.asarray(x_new), jnp.asarray(lm_seed))
    np.testing.assert_allclose(np.asarray(ocs1.lm), np.asarray(out),
                               rtol=1e-10, atol=1e-12)
