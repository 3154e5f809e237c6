"""Post-hoc analysis parity with the reference's scripts/ suite.

Operates on PredictionWriter output (.npz with atmo/logp/precip/sst
series).  Covers the reference's verification workflow beyond
diagnostics.py's RMS/bias/ACC:

- ENSO: Nino-3.4 SST anomaly index + power spectrum
  (scripts/enso_hybrid.py);
- precipitation extremes: per-gridpoint high quantiles and global
  wet-day statistics (scripts/extreme_values.py, total_precip.py);
- total atmospheric mass conservation: area-weighted surface pressure
  timeseries (scripts/total_atmosphere_weight.py).

Pure numpy — analysis runs on host over files, like the reference.
"""

from __future__ import annotations

import numpy as np


def load_prediction(path: str) -> dict:
    """Load a PredictionWriter .npz into a dict of numpy arrays."""
    z = np.load(path)
    return {k: z[k] for k in z.files}


# ----------------------------------------------------------------------
# ENSO (scripts/enso_hybrid.py)
# ----------------------------------------------------------------------

def region_mean(field: np.ndarray, lat: np.ndarray, lon: np.ndarray,
                lat_range: tuple, lon_range: tuple) -> np.ndarray:
    """Area-weighted mean of (..., lat, lon) over a lat/lon box.

    lon_range in [0, 360); supports ranges crossing the dateline."""
    lat_m = (lat >= lat_range[0]) & (lat <= lat_range[1])
    lo, hi = lon_range
    lon_m = ((lon >= lo) & (lon <= hi) if lo <= hi
             else (lon >= lo) | (lon <= hi))
    w = np.cos(np.deg2rad(lat))[lat_m]
    sub = field[..., lat_m, :][..., lon_m]
    return (sub * w[:, None]).sum(axis=(-2, -1)) / (w.sum() * lon_m.sum())


def nino34_index(sst: np.ndarray, lat: np.ndarray, lon: np.ndarray,
                 samples_per_year: int) -> np.ndarray:
    """Nino-3.4 SST anomaly: box mean (5S-5N, 170W-120W) minus the
    repeating seasonal climatology (enso_hybrid.py's index)."""
    series = region_mean(sst, lat, lon, (-5.0, 5.0), (190.0, 240.0))
    T = len(series)
    ny = T // samples_per_year
    if ny >= 1:
        trimmed = series[:ny * samples_per_year].reshape(
            ny, samples_per_year)
        climo = np.tile(trimmed.mean(axis=0), ny + 1)[:T]
    else:
        climo = series.mean()
    return series - climo


def power_spectrum(series: np.ndarray, dt_days: float
                   ) -> tuple[np.ndarray, np.ndarray]:
    """One-sided periodogram; returns (period_days, power).

    The reference's ENSO analysis reads peak power in the 2-7 year
    band."""
    x = np.asarray(series, dtype=np.float64)
    x = x - x.mean()
    n = len(x)
    f = np.fft.rfftfreq(n, d=dt_days)
    p = np.abs(np.fft.rfft(x)) ** 2 / n
    with np.errstate(divide="ignore"):
        period = np.where(f > 0, 1.0 / np.maximum(f, 1e-30), np.inf)
    return period, p


# ----------------------------------------------------------------------
# precipitation (scripts/total_precip.py, extreme_values.py)
# ----------------------------------------------------------------------

def precip_extremes(precip: np.ndarray, quantiles=(0.95, 0.99, 0.999)
                    ) -> dict:
    """Per-gridpoint high quantiles + global wet statistics.

    precip: (T, lat, lon) rates.  Returns dict with 'q<NN>' maps, the
    all-point quantiles, and the wet fraction (rate > 1 mm/day equiv is
    left to the caller's units; here > 0)."""
    out = {}
    for q in quantiles:
        out[f"q{q}"] = np.quantile(precip, q, axis=0)
        out[f"q{q}_global"] = float(np.quantile(precip, q))
    out["mean_map"] = precip.mean(axis=0)
    out["wet_fraction"] = float((precip > 0).mean())
    out["max"] = float(precip.max())
    return out


def total_precip_timeseries(precip: np.ndarray, lat: np.ndarray
                            ) -> np.ndarray:
    """Area-weighted global-mean precip per sample (total_precip.py)."""
    w = np.cos(np.deg2rad(lat))
    return (precip * w[:, None]).sum(axis=(-2, -1)) / (
        w.sum() * precip.shape[-1])


# ----------------------------------------------------------------------
# mass conservation (scripts/total_atmosphere_weight.py)
# ----------------------------------------------------------------------

def total_atmosphere_mass(logp: np.ndarray, lat: np.ndarray,
                          p0: float = 1.0e5, grav: float = 9.81,
                          rearth: float = 6.371e6) -> np.ndarray:
    """Total atmospheric mass [kg] per sample from log-surface-pressure.

    M = (1/g) * integral ps dA over the sphere (the reference's
    total_atmosphere_weight.py check: drift indicates a conservation
    bug)."""
    w = np.cos(np.deg2rad(lat))
    ps = p0 * np.exp(logp)
    ps_bar = (ps * w[:, None]).sum(axis=(-2, -1)) / (w.sum()
                                                     * logp.shape[-1])
    area = 4.0 * np.pi * rearth ** 2
    return ps_bar * area / grav


def mass_drift(logp: np.ndarray, lat: np.ndarray) -> float:
    """Relative total-mass drift over the series (should be ~0)."""
    m = total_atmosphere_mass(logp, lat)
    return float((m[-1] - m[0]) / m[0])


# ----------------------------------------------------------------------
# wavelet ENSO spectrum (scripts/enso_hybrid.py get_wavelet_fft_power,
# :1319-1400 — pycwt's Torrence & Compo 1998 Morlet CWT, re-implemented
# in plain numpy since this image carries no pycwt)
# ----------------------------------------------------------------------

def morlet_cwt(series: np.ndarray, dt: float, dj: float = 1.0 / 12,
               s0: float | None = None, n_octaves: float = 7.0,
               omega0: float = 6.0):
    """Continuous wavelet transform with a Morlet(omega0) mother.

    FFT-based (Torrence & Compo 1998 eq. 4): W_n(s) = ifft(fft(x) *
    conj(Psi_hat(s * w))).  Returns (wave (J+1, N) complex, scales,
    periods).  Defaults mirror the reference call: s0 = 6*dt, twelve
    sub-octaves per octave, seven octaves."""
    x = np.asarray(series, dtype=np.float64)
    N = x.size
    s0 = 6.0 * dt if s0 is None else s0
    J = int(round(n_octaves / dj))
    scales = s0 * 2.0 ** (dj * np.arange(J + 1))
    # angular frequencies of the DFT
    w = 2.0 * np.pi * np.fft.fftfreq(N, d=dt)
    xh = np.fft.fft(x)
    # normalized Morlet in frequency space (TC98 table 1):
    # Psi_hat(s w) = pi^-1/4 H(w) exp(-(s w - omega0)^2 / 2)
    norm = (np.pi ** -0.25) * np.sqrt(2.0 * np.pi * scales / dt)
    arg = scales[:, None] * w[None, :] - omega0
    psi = norm[:, None] * np.exp(-0.5 * arg ** 2) * (w[None, :] > 0)
    wave = np.fft.ifft(xh[None, :] * np.conj(psi), axis=1)
    # Fourier-equivalent period for Morlet (TC98 eq. 6.8)
    fourier_factor = 4.0 * np.pi / (omega0 + np.sqrt(2.0 + omega0 ** 2))
    periods = scales * fourier_factor
    return wave, scales, periods


def wavelet_power_spectrum(series: np.ndarray, dt: float, **kw) -> dict:
    """Global wavelet power + 2-8 period-unit scale-averaged power of a
    detrended, std-normalized series (the quantities the reference plots
    for the Nino-3.4 index; enso_hybrid.py:1329-1392)."""
    x = np.asarray(series, dtype=np.float64)
    N = x.size
    t = np.arange(N) * dt
    p = np.polyfit(t, x, 1)
    xd = x - np.polyval(p, t)
    std = xd.std()
    if std == 0:
        std = 1.0
    wave, scales, periods = morlet_cwt(xd / std, dt, **kw)
    power = np.abs(wave) ** 2
    glbl = power.mean(axis=1)
    sel = (periods >= 2.0) & (periods < 8.0)
    # scale-averaged power (TC98 eq. 24, up to the Cdelta constant)
    dj = np.log2(scales[1] / scales[0])
    scale_avg = (power[sel] / scales[sel, None]).sum(axis=0) * dj * dt
    return dict(periods=periods, global_power=glbl,
                scale_avg_2_8=scale_avg, power=power, std=float(std))


# ----------------------------------------------------------------------
# stratosphere climatology (scripts/stratosphere_climo.py): zonal-mean
# stratospheric wind, SSW-style reversal counts, QBO section
# ----------------------------------------------------------------------

def zonal_mean(field: np.ndarray) -> np.ndarray:
    """(..., lat, lon) -> (..., lat) zonal mean."""
    return np.asarray(field).mean(axis=-1)


def ssw_reversal_fraction(u: np.ndarray, lat: np.ndarray,
                          months: np.ndarray, level: int = 0,
                          lat0: float = 60.0,
                          winter=(11, 12, 1, 2, 3)) -> float:
    """Fraction of extended-winter (NDJFM) samples with REVERSED
    (easterly) zonal-mean stratospheric wind at ~lat0 N — the
    sudden-stratospheric-warming proxy the reference counts
    (stratosphere_climo.py:117-145: ds_zmean NDJFM where U < 0).

    u: (T, K, lat, lon) zonal wind on sigma levels (level 0 = top);
    months: (T,) calendar month per sample."""
    j = int(np.argmin(np.abs(np.asarray(lat) - lat0)))
    uz = zonal_mean(u[:, level])[:, j]
    sel = np.isin(np.asarray(months), winter)
    if not sel.any():
        return 0.0
    return float((uz[sel] < 0.0).mean())


def qbo_section(u: np.ndarray, lat: np.ndarray,
                lat_band: float = 5.0) -> np.ndarray:
    """Equatorial zonal-mean zonal wind (T, K): the time-height section
    whose downward-propagating reversals are the QBO
    (stratosphere_climo.py qbo_plot:385-421)."""
    la = np.asarray(lat)
    m = np.abs(la) <= lat_band
    if not m.any():        # coarse grids: fall back to the two rows
        m = np.abs(la) <= np.sort(np.abs(la))[1]  # straddling the equator
    w = np.cos(np.deg2rad(la[m]))
    uz = zonal_mean(u)[..., m]                      # (T, K, lat_band)
    return (uz * w).sum(axis=-1) / w.sum()
