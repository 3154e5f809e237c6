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
