"""Analysis parity (VERDICT r1 #10): ENSO index/spectrum, precip
extremes, total-mass conservation — with analytic oracles."""

import numpy as np

from speedy_ml_tpu.analysis import (mass_drift, nino34_index,
                                    power_spectrum, precip_extremes,
                                    region_mean, total_atmosphere_mass,
                                    total_precip_timeseries)

LAT = np.linspace(-87, 87, 48)
LON = np.arange(0, 360, 3.75)


def test_region_mean_constant():
    f = np.full((5, 48, 96), 7.0)
    m = region_mean(f, LAT, LON, (-5, 5), (190, 240))
    np.testing.assert_allclose(m, 7.0)
    # dateline-crossing box
    m2 = region_mean(f, LAT, LON, (-5, 5), (350, 10))
    np.testing.assert_allclose(m2, 7.0)


def test_nino34_detects_oscillation():
    """A synthetic 4-year ENSO-like oscillation confined to the Nino-3.4
    box must dominate the spectrum at its period."""
    spy = 73                      # 5-day samples -> 73/year
    years = 20
    T = spy * years
    t = np.arange(T) / spy        # years
    sst = np.full((T, 48, 96), 300.0)
    box_lat = (LAT >= -5) & (LAT <= 5)
    box_lon = (LON >= 190) & (LON <= 240)
    sig = 2.0 * np.sin(2 * np.pi * t / 4.0)        # 4-year cycle
    seasonal = 1.0 * np.sin(2 * np.pi * t)         # annual cycle
    iy = np.where(box_lat)[0][:, None]
    ix = np.where(box_lon)[0][None, :]
    sst[:, iy, ix] += (sig + seasonal)[:, None, None]

    idx = nino34_index(sst, LAT, LON, samples_per_year=spy)
    # seasonal cycle removed by the repeating climatology
    period, power = power_spectrum(idx, dt_days=5.0)
    peak = period[1:][np.argmax(power[1:])]
    assert abs(peak - 4 * 365) / (4 * 365) < 0.15
    # annual peak suppressed
    annual = power[np.argmin(np.abs(period - 365.0))]
    enso = power[np.argmin(np.abs(period - 4 * 365.0))]
    assert enso > 10 * annual


def test_precip_extremes_quantiles():
    rng = np.random.default_rng(0)
    p = rng.exponential(1.0, (2000, 8, 16))
    ex = precip_extremes(p, quantiles=(0.99,))
    # exponential: q99 = -ln(0.01) ~ 4.605
    np.testing.assert_allclose(ex["q0.99_global"], 4.605, rtol=0.05)
    assert ex["q0.99"].shape == (8, 16)
    assert 0.99 < ex["wet_fraction"] <= 1.0
    ts = total_precip_timeseries(p, np.linspace(-60, 60, 8))
    np.testing.assert_allclose(ts.mean(), 1.0, rtol=0.05)


def test_total_mass():
    logp = np.zeros((10, 48, 96))
    m = total_atmosphere_mass(logp, LAT)
    # ps = 1e5 Pa everywhere: M = ps * 4 pi R^2 / g ~ 5.2e18 kg
    np.testing.assert_allclose(m, 5.2e18, rtol=0.02)
    assert mass_drift(logp, LAT) == 0.0
    logp2 = logp.copy()
    logp2[-1] += 0.01
    assert abs(mass_drift(logp2, LAT) - (np.exp(0.01) - 1)) < 1e-6


def test_wavelet_power_peaks_at_signal_period():
    """A pure sinusoid's global wavelet power must peak at its period
    (Morlet CWT parity with the reference's pycwt pipeline)."""
    from speedy_ml_tpu.analysis import wavelet_power_spectrum
    dt = 1.0 / 12.0                       # monthly samples in years
    t = np.arange(0, 64, dt)
    period_true = 4.0                     # a 4-year ENSO-like cycle
    x = np.sin(2 * np.pi * t / period_true) + 0.1
    out = wavelet_power_spectrum(x, dt)
    peak = out["periods"][np.argmax(out["global_power"])]
    assert abs(peak - period_true) / period_true < 0.15
    # the 2-8 year scale-averaged power dominates a 1-year control peak
    x1 = np.sin(2 * np.pi * t / 1.0)
    out1 = wavelet_power_spectrum(x1, dt)
    assert out["scale_avg_2_8"].mean() > 3 * out1["scale_avg_2_8"].mean()


def test_ssw_reversal_fraction():
    from speedy_ml_tpu.analysis import ssw_reversal_fraction
    lat = np.linspace(-87, 87, 48)
    T, K = 20, 8
    u = np.full((T, K, 48, 96), 10.0)
    months = np.asarray([1] * 10 + [7] * 10)
    j = np.argmin(np.abs(lat - 60.0))
    u[:5, 0, j, :] = -3.0                 # 5 reversed winter samples
    u[12, 0, j, :] = -3.0                 # summer reversal: ignored
    f = ssw_reversal_fraction(u, lat, months)
    assert abs(f - 0.5) < 1e-12


def test_qbo_section_shape_and_band():
    from speedy_ml_tpu.analysis import qbo_section
    lat = np.linspace(-87, 87, 48)
    u = np.zeros((6, 8, 48, 96))
    u[:, :, np.abs(lat) <= 5.0, :] = 7.0
    q = qbo_section(u, lat)
    assert q.shape == (6, 8)
    np.testing.assert_allclose(q, 7.0)
