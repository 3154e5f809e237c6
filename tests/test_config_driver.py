"""Config round-trip + prediction driver smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.config import RunConfig
from speedy_ml_tpu.core import Geometry, PhysicalConstants
from speedy_ml_tpu.data.calendar import ModelDate
from speedy_ml_tpu.gcm import GCM
from speedy_ml_tpu.hybrid.build import build_untrained_hybrid
from speedy_ml_tpu.hybrid.driver import run_prediction
from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data


def test_config_roundtrip(tmp_path):
    cfg = RunConfig(trunc=10, nlon=32, nlat=16, n_regions=128, ml_only=True)
    cfg.save(tmp_path / "cfg.json")
    cfg2 = RunConfig.load(tmp_path / "cfg.json")
    assert cfg2.trunc == 10 and cfg2.n_regions == 128
    assert cfg2.atmo.m == cfg.atmo.m
    assert cfg2.ocean.sigma == 0.6
    g = cfg2.geometry()
    assert (g.nlon, g.nlat) == (32, 16)


def test_calendar():
    d = ModelDate(1999, 12, 31, 18)
    d2 = d.advance_hours(6)
    assert (d2.year, d2.month, d2.day, d2.hour) == (2000, 1, 1, 0)
    # leap day (2000 is a leap year in the mod 4 rule)
    d3 = ModelDate(2000, 2, 28, 18).advance_hours(6)
    assert (d3.month, d3.day) == (2, 29)
    from speedy_ml_tpu.data.calendar import hour_delta
    assert hour_delta(ModelDate(2000, 1, 1), ModelDate(2001, 1, 1)) == 8784


@pytest.mark.slow
def test_run_prediction_driver(tmp_path):
    GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)
    from speedy_ml_tpu.core.spectral import SpectralTransform
    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float64,
              bd=synthetic_boundary_data(GEOM, sht))
    hyb = build_untrained_hybrid(gcm, n_regions=128, m=300, radius_iters=5,
                                 ml_only=True)
    hstate = hyb.init_state(jnp.asarray(gcm.bd.sst12[0]))
    out = tmp_path / "pred"
    hstate, dates = run_prediction(hyb, hstate, ModelDate(1990, 6, 1), 5,
                                   output_path=str(out))
    assert len(dates) == 5
    z = np.load(out.with_suffix(".npz"))
    assert z["atmo"].shape[0] == 5
    assert z["atmo"].shape[1:] == (4, 8, 16, 32)
    assert np.isfinite(z["atmo"]).all()


@pytest.mark.slow
def test_run_prediction_batched_matches_percycle(tmp_path):
    """cycles_per_dispatch>1 (the lax.scan product loop) must produce the
    same stream and time means as the per-cycle path."""
    GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)
    from speedy_ml_tpu.core.spectral import SpectralTransform
    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float64,
              bd=synthetic_boundary_data(GEOM, sht))
    hyb = build_untrained_hybrid(gcm, n_regions=128, m=300, radius_iters=5,
                                 ml_only=True)
    hs0 = hyb.init_state(jnp.asarray(gcm.bd.sst12[0]))
    start = ModelDate(1990, 6, 1, cal365=True)

    out1 = tmp_path / "seq"
    _, dates1 = run_prediction(hyb, hs0, start, 7, output_path=str(out1),
                               time_mean_path=str(tmp_path / "tm1.npz"))

    hs0 = hyb.init_state(jnp.asarray(gcm.bd.sst12[0]))
    out2 = tmp_path / "bat"
    _, dates2 = run_prediction(hyb, hs0, start, 7, output_path=str(out2),
                               time_mean_path=str(tmp_path / "tm2.npz"),
                               cycles_per_dispatch=3)   # 3+3+1 dispatches
    assert [str(d) for d in dates1] == [str(d) for d in dates2]
    z1 = np.load(out1.with_suffix(".npz"))
    z2 = np.load(out2.with_suffix(".npz"))
    assert sorted(z1.files) == sorted(z2.files)
    for k in z1.files:
        np.testing.assert_allclose(z2[k], z1[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)
    t1 = np.load(tmp_path / "tm1.npz")
    t2 = np.load(tmp_path / "tm2.npz")
    for k in t1.files:
        np.testing.assert_allclose(t2[k], t1[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)
