"""sigma->p monthly time-mean products (ppo_tminc/ppo_tmout parity)."""

import numpy as np

from speedy_ml_tpu.core import Geometry
from speedy_ml_tpu.data.calendar import ModelDate
from speedy_ml_tpu.timemean import (TimeMeanAccumulator,
                                    mean_sea_level_pressure,
                                    monthly_means_from_stream,
                                    output_pressure_levels)

GEOM = Geometry()   # T30L8


def test_output_levels_match_reference_selection():
    """prlev on the L8 full sigmas -> [30,100,200,300,500,700,850,925]
    (ini_iniatm.f90:111-128 with ini_indyns.f90 hsg)."""
    got = output_pressure_levels(GEOM.full_sigma)
    np.testing.assert_allclose(got, [30, 100, 200, 300, 500, 700, 850, 925])


def test_msl_reduction():
    """Zero orography -> pmsl == ps; positive orography raises pmsl."""
    ps = np.full((4, 8), 950.0)
    t = np.full((4, 8), 288.0)
    np.testing.assert_allclose(
        mean_sea_level_pressure(ps, t, np.zeros((4, 8))), ps)
    phis = np.full((4, 8), 9.81 * 1500.0)   # 1500 m
    pmsl = mean_sea_level_pressure(ps, t, phis)
    assert (pmsl > ps).all() and (pmsl < 1.3 * ps).all()


def synth_stream(T, nlat, nlon, nz):
    """T samples whose fields ramp linearly in time (mean checkable)."""
    r = np.arange(T, dtype=np.float64)
    atmo = np.zeros((T, 4, nz, nlat, nlon))
    atmo[:, 0] = 250.0 + r[:, None, None, None]       # T
    atmo[:, 1] = 1.0 * r[:, None, None, None]         # u
    atmo[:, 3] = 5.0                                  # q
    logp = np.zeros((T, nlat, nlon))                  # ps = p0
    precip = np.full((T, nlat, nlon), 2.0)
    sst = np.full((T, nlat, nlon), 290.0)
    return dict(atmo=atmo, logp=logp, precip=precip, sst=sst)


def test_monthly_grouping_and_means():
    g = GEOM
    # 6-h cadence starting Jan 29: 3 days of Jan then 2 days of Feb
    T = 4 * 5
    pred = synth_stream(T, g.nlat, g.nlon, g.nlev)
    months = monthly_means_from_stream(pred, ModelDate(1990, 1, 29), g)
    assert [(m["year"], m["month"], m["n_samples"]) for m in months] == \
        [(1990, 1, 12), (1990, 2, 8)]
    # uniform-in-space ramp: mean over the month's sample indices; at
    # ps=p0 every output level is inside the sigma column except the
    # extrapolated edges, which are constant -> same value everywhere
    jan = months[0]
    np.testing.assert_allclose(jan["t_p"], 250.0 + np.mean(np.arange(12)),
                               rtol=1e-12)
    np.testing.assert_allclose(jan["u_p"], np.mean(np.arange(12)),
                               rtol=1e-12)
    np.testing.assert_allclose(jan["ps"], 1000.0)
    np.testing.assert_allclose(jan["precip"], 2.0)
    feb = months[1]
    np.testing.assert_allclose(feb["t_p"], 250.0 + np.mean(np.arange(12, 20)),
                               rtol=1e-12)


def test_accumulator_save_roundtrip(tmp_path):
    g = GEOM
    acc = TimeMeanAccumulator(g)
    pred = synth_stream(8, g.nlat, g.nlon, g.nlev)
    d = ModelDate(1991, 3, 31)
    for i in range(8):
        acc.add(d, pred["atmo"][i], pred["logp"][i], pred["precip"][i],
                pred["sst"][i])
        d = d.advance_hours(6)
    acc.save(tmp_path / "tm.npz")
    z = np.load(tmp_path / "tm.npz")
    assert list(z["month"]) == [3, 4]
    assert z["t_p"].shape == (2, g.nlev, g.nlat, g.nlon)
    np.testing.assert_allclose(z["p_levels_hpa"],
                               output_pressure_levels(g.full_sigma))
