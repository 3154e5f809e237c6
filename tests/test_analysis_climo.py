"""sigma->pressure climatology suite, combined precip figure and NetCDF
export shim (VERDICT r3 #7; hybrid_climo.py / combined_precip_paper_fig
/ mod_io.f90 write_netcdf layouts)."""

import numpy as np
import pytest

from speedy_ml_tpu.analysis import (SPEEDY_SIGMA, annual_precip_totals,
                                    climo_bias_suite, doy_climatology,
                                    season_indices, sigma_to_pressure)

NY, NX, K = 8, 16, 8


def test_sigma_to_pressure_matches_reference_loop():
    """Vectorized interp == the reference's per-column np.interp
    (lin_interp, hybrid_climo.py:33-59)."""
    rng = np.random.default_rng(0)
    T = 3
    var = rng.normal(280, 10, (T, K, NY, NX))
    logp = rng.normal(0.0, 0.02, (T, NY, NX))
    target = np.array([25.0, 95.0, 200.0, 350.0, 500.0, 680.0, 850.0,
                       950.0])
    got = sigma_to_pressure(var, logp, SPEEDY_SIGMA, target)

    ps = np.exp(logp) * 1000.0
    want = np.zeros_like(got)
    for t in range(T):
        for i in range(NY):
            for j in range(NX):
                pcol = SPEEDY_SIGMA * ps[t, i, j]
                want[t, :, i, j] = np.interp(target, pcol, var[t, :, i, j])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_doy_climatology_and_seasons():
    spy = 1460                   # 6-hourly, 365-day year
    T = spy * 3
    # signal: pure function of position-in-year + per-year noise
    base = np.sin(np.arange(spy) / spy * 2 * np.pi)
    series = np.concatenate([base + 0.1 * y for y in range(3)])
    climo = doy_climatology(series, spy)
    np.testing.assert_allclose(climo, base + 0.1, atol=1e-12)

    s = season_indices(4)
    assert len(s["annual"]) == spy
    assert len(s["djf"]) == (31 + 31 + 28) * 4
    assert len(s["jja"]) == (30 + 31 + 31) * 4
    # disjoint cover
    all_idx = np.concatenate([s["djf"], s["mam"], s["jja"], s["son"]])
    assert sorted(all_idx) == list(range(spy))


def _fake_run(seed, years=2):
    rng = np.random.default_rng(seed)
    spy = 1460
    T = spy * years
    atmo = rng.normal(0, 1, (T, 4, K, NY, NX)).astype(np.float32)
    atmo[:, 0] += 270.0
    logp = rng.normal(0, 0.01, (T, NY, NX)).astype(np.float32)
    return dict(atmo=atmo, logp=logp)


def test_climo_bias_suite_shapes_and_selfzero():
    lat = np.linspace(-85, 85, NY)
    run = _fake_run(1)
    suite = climo_bias_suite(run, run, 1460, lat)
    # identical runs: zero bias everywhere, zero RMS
    for sname, sd in suite["seasons"].items():
        assert sd["t_bias_zonal"].shape == (8, NY)
        assert sd["ps_bias_map"].shape == (NY, NX)
        np.testing.assert_allclose(sd["t_bias_zonal"], 0.0, atol=1e-5)
        np.testing.assert_allclose(sd["ps_bias_map"], 0.0, atol=1e-4)
    assert suite["rms"]["t"] == pytest.approx(0.0, abs=1e-5)

    other = _fake_run(2)
    suite2 = climo_bias_suite(other, run, 1460, lat)
    assert suite2["rms"]["t"] > 0.0


def test_annual_precip_totals():
    spy = 4
    p = np.ones((9, NY, NX)) * 2.0           # mm/s
    tot = annual_precip_totals(p, spy, 21600.0)
    assert tot.shape == (2, NY, NX)          # 2 whole years
    np.testing.assert_allclose(tot, 2.0 * spy * 21600.0)


def test_climo_and_precip_figures(tmp_path):
    from speedy_ml_tpu import plots
    lat = np.linspace(-85, 85, NY)
    lon = np.arange(NX) * 360.0 / NX
    run, base, truth = _fake_run(1), _fake_run(2), _fake_run(3)
    s1 = climo_bias_suite(run, truth, 1460, lat)
    s2 = climo_bias_suite(base, truth, 1460, lat)
    out = tmp_path / "climo.png"
    plots.climo_bias_figure(s1, s2, lat, path=str(out))
    assert out.exists() and out.stat().st_size > 10_000

    rng = np.random.default_rng(0)
    pr = [np.abs(rng.normal(1e-4, 5e-5, (2920, NY, NX))) for _ in range(3)]
    out2 = tmp_path / "precip.png"
    plots.combined_precip_figure(pr[0], pr[1], pr[2], lat, lon, 1460,
                                 21600.0, path=str(out2))
    assert out2.exists() and out2.stat().st_size > 10_000


def test_netcdf_export_roundtrip(tmp_path):
    """The exported file carries the reference's variable names/units
    (mod_io.f90:138-480) and reads back bit-identical via scipy."""
    from scipy.io import netcdf_file
    from speedy_ml_tpu.data.netcdf_export import export_prediction_netcdf

    rng = np.random.default_rng(0)
    T = 5
    pred = dict(
        atmo=rng.normal(0, 1, (T, 4, K, NY, NX)).astype(np.float32),
        logp=rng.normal(0, 0.01, (T, NY, NX)).astype(np.float32),
        precip=np.abs(rng.normal(1e-4, 1e-5, (T, NY, NX))).astype(np.float32),
        sst=rng.normal(290, 3, (T, NY, NX)).astype(np.float32))
    path = str(tmp_path / "pred.nc")
    export_prediction_netcdf(pred, path,
                             lat=np.linspace(-85, 85, NY),
                             lon=np.arange(NX) * 360.0 / NX,
                             sigma=SPEEDY_SIGMA)
    f = netcdf_file(path, "r", mmap=False)
    assert f.variables["Temperature"].units == b"Kelvin"
    assert f.variables["Specific-Humidity"].units == b"g/kg"
    assert f.variables["logp"].units == b"log(surfacepressure)"
    assert f.variables["p6hr"].units == b"mm of rain"
    np.testing.assert_array_equal(f.variables["Temperature"][:],
                                  pred["atmo"][:, 0])
    np.testing.assert_array_equal(f.variables["U-wind"][:],
                                  pred["atmo"][:, 1])
    np.testing.assert_allclose(f.variables["p6hr"][:],
                               pred["precip"] * 21600.0, rtol=1e-6)
    np.testing.assert_array_equal(f.variables["SST"][:], pred["sst"])
    assert f.dimensions["Sigma_Level"] == K
    f.close()


def test_streaming_doy_climatology_matches_inmemory(tmp_path):
    """Part-streamed climatology == the in-memory one on the same data
    (and parts load in time order)."""
    from speedy_ml_tpu.analysis import (climo_bias_from_climatology,
                                        streaming_doy_climatology)

    rng = np.random.default_rng(0)
    spy = 8                      # tiny "year" for the test
    T = spy * 3 + 5              # ragged tail exercises partial years
    atmo = rng.normal(0, 1, (T, 4, K, NY, NX)).astype(np.float32)
    logp = rng.normal(0, 0.01, (T, NY, NX)).astype(np.float32)

    stem = tmp_path / "pred.npz"
    for ci, i0 in enumerate(range(0, T, 7)):   # uneven chunking
        np.savez(tmp_path / f"pred.part{ci}.npz",
                 atmo=atmo[i0:i0 + 7], logp=logp[i0:i0 + 7])
    clim = streaming_doy_climatology(str(stem), spy)

    full = sigma_to_pressure(atmo[:, 0], logp)
    # position-in-year mean incl. the ragged tail
    want = np.zeros((spy,) + full.shape[1:])
    cnt = np.zeros(spy)
    for t in range(T):
        want[t % spy] += full[t]
        cnt[t % spy] += 1
    want /= cnt[:, None, None, None]
    np.testing.assert_allclose(clim["t"], want, rtol=1e-5, atol=1e-6)
    assert clim["n_years"] == pytest.approx(T / spy)

    # self-bias is zero through the from-climatology suite
    suite = climo_bias_from_climatology(
        {k: clim[k] for k in ("t", "u", "q", "ps")},
        {k: clim[k] for k in ("t", "u", "q", "ps")})
    np.testing.assert_allclose(
        suite["seasons"]["annual"]["t_bias_zonal"], 0.0, atol=1e-12)


def test_writer_unconsolidated_parts(tmp_path):
    """run_prediction(consolidate=False) leaves part files that
    iter_prediction_parts reads back in order."""
    from speedy_ml_tpu.analysis import (iter_prediction_parts,
                                        load_prediction_series)
    from speedy_ml_tpu.hybrid.driver import PredictionWriter

    w = PredictionWriter(str(tmp_path / "run.npz"), flush_every=3)
    T = 8
    for t in range(T):
        diag = dict(atmo=np.full((4, K, NY, NX), t, np.float32),
                    logp=np.full((NY, NX), t, np.float32),
                    precip=np.zeros((NY, NX), np.float32))
        w.append(diag, np.zeros((NY, NX), np.float32))
    w.flush(wait=True)           # drain async compression before reading
    series = load_prediction_series(str(tmp_path / "run.npz"), "logp")
    assert series.shape == (T, NY, NX)
    np.testing.assert_allclose(series[:, 0, 0], np.arange(T))
    parts = list(iter_prediction_parts(str(tmp_path / "run.npz")))
    assert [p["logp"].shape[0] for p in parts] == [3, 3, 2]
