"""Figure layer renders every reference plot type headlessly (Agg).

Each figure is saved to a tmp png and must be a real, non-trivial image
(> 5 KB): this catches empty axes / all-NaN data / colormap errors
without pixel-level golden files."""

import numpy as np
import pytest

from speedy_ml_tpu import plots

NLAT, NLON, NLEV, T = 24, 48, 8, 96
rng = np.random.default_rng(0)
lat = np.linspace(-87, 87, NLAT)
lon = np.linspace(0, 360, NLON, endpoint=False)
sigma = np.linspace(0.05, 0.95, NLEV)


def _check(path):
    assert path.exists() and path.stat().st_size > 5000, path


def test_bias_maps(tmp_path):
    tm = 280 + 20 * np.cos(np.deg2rad(lat))[:, None] + 0 * lon
    p = tmp_path / "bias.png"
    plots.bias_maps(tm, tm + rng.normal(0, 0.5, tm.shape),
                    tm + rng.normal(0, 2.0, tm.shape), lat, lon,
                    path=str(p))
    _check(p)


def test_nino34_and_wavelet(tmp_path):
    spy = 12
    t = np.arange(T)
    enso = np.sin(2 * np.pi * t / (4 * spy))        # 4-year cycle
    sst = (300 + enso[:, None, None]
           * np.exp(-(lat[None, :, None] / 10.0) ** 2)
           + rng.normal(0, 0.05, (T, NLAT, 1))) * np.ones((1, 1, NLON))
    p1, p2 = tmp_path / "nino.png", tmp_path / "wave.png"
    plots.nino34_figure(sst, lat, lon, spy, path=str(p1))
    plots.wavelet_figure(enso, 365.0 / spy, path=str(p2))
    _check(p1)
    _check(p2)


def test_sst_anomaly_and_trend(tmp_path):
    clim = 300 - 30 * (lat[:, None] / 90.0) ** 2 + 0 * lon
    p1, p2 = tmp_path / "sst.png", tmp_path / "trend.png"
    plots.sst_anomaly_map(clim + rng.normal(0, 1, clim.shape), clim,
                          lat, lon, title="1997-12-01", path=str(p1))
    plots.trend_figure(288 + 0.01 * np.arange(400)
                       + rng.normal(0, 0.2, 400), 6 / 24, smooth=16,
                       path=str(p2))
    _check(p1)
    _check(p2)


def test_sections_and_wout(tmp_path):
    u = (20 * np.sin(2 * np.deg2rad(lat))[None, None, :, None]
         * np.linspace(1.5, 0.5, NLEV)[None, :, None, None]
         + rng.normal(0, 1, (T, NLEV, NLAT, NLON)))
    p1, p2, p3 = (tmp_path / "zm.png", tmp_path / "qbo.png",
                  tmp_path / "wout.png")
    plots.zonal_mean_section(u.mean(axis=0), lat, sigma, path=str(p1))
    plots.qbo_figure(u, lat, sigma, 30.0, path=str(p2))
    plots.wout_figure(rng.normal(0, 1, (4, 64, 200)), region=2,
                      path=str(p3))
    _check(p1)
    _check(p2)
    _check(p3)


def test_extremes_and_skill(tmp_path):
    precip = rng.gamma(0.5, 2.0, (T, NLAT, NLON))
    p1, p2 = tmp_path / "ext.png", tmp_path / "skill.png"
    plots.precip_extreme_map(precip, lat, lon, path=str(p1))
    leads = np.arange(1, 15) * 0.25
    plots.skill_figure(leads, 0.5 * np.sqrt(leads), 0.8 * np.sqrt(leads),
                       path=str(p2))
    _check(p1)
    _check(p2)
