"""Diagnostics, SPPT, restart, and component-contribution tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry, PhysicalConstants
from speedy_ml_tpu.core.spectral import SpectralTransform
from speedy_ml_tpu.diagnostics import (anomaly_correlation, sigma_to_pressure,
                                       state_in_physical_range, weighted_bias,
                                       weighted_rms)

GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)


def test_weighted_rms_bias():
    a = np.full((2, GEOM.nlat, GEOM.nlon), 3.0)
    b = np.zeros((2, GEOM.nlat, GEOM.nlon))
    assert abs(weighted_rms(a, b, GEOM) - 3.0) < 1e-12
    assert abs(weighted_bias(a, b, GEOM) - 3.0) < 1e-12


def test_sigma_to_pressure_log_linear():
    """A field linear in log-p interpolates exactly (linear-in-log-p rule)."""
    fs = np.asarray(GEOM.full_sigma)
    zlike = 7.5 * np.log(1000.0 / (fs * 1000.0))
    field = np.broadcast_to(zlike[:, None, None],
                            (8, GEOM.nlat, GEOM.nlon)).copy()
    ps = np.ones((GEOM.nlat, GEOM.nlon))
    out = sigma_to_pressure(field, ps, fs, np.array([500.0]))
    np.testing.assert_allclose(out[0], 7.5 * np.log(2.0), rtol=1e-10)


def test_physical_range_gate():
    ok = state_in_physical_range(jnp.full((4, 4), 280.0), jnp.zeros((4, 4)),
                                 jnp.zeros((4, 4)), jnp.full((4, 4), 5.0))
    assert bool(ok)
    bad = state_in_physical_range(jnp.full((4, 4), 400.0), jnp.zeros((4, 4)),
                                  jnp.zeros((4, 4)), jnp.full((4, 4), 5.0))
    assert not bool(bad)


def test_anomaly_correlation_perfect():
    rng = np.random.default_rng(0)
    clim = rng.standard_normal((GEOM.nlat, GEOM.nlon))
    a = clim + rng.standard_normal((GEOM.nlat, GEOM.nlon))
    assert abs(anomaly_correlation(a, a, clim, GEOM) - 1.0) < 1e-12


def test_sppt_pattern():
    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    from speedy_ml_tpu.physics.sppt import SPPT, STDDEV
    sp = SPPT(sht, GEOM.nlev)
    key = jax.random.PRNGKey(0)
    state = sp.init_state(key)
    # stationary std in grid space ~ STDDEV
    samples = []
    for i in range(60):
        key = jax.random.fold_in(key, i)
        state = sp.step(state, key)
        samples.append(np.asarray(sp.grid_pattern(state)))
    s = np.stack(samples)
    assert s.min() >= -1.0 and s.max() <= 1.0
    assert 0.1 < s.std() < 0.6   # order of the configured stddev


def test_gcm_restart_roundtrip(tmp_path):
    from speedy_ml_tpu.data.calendar import ModelDate
    from speedy_ml_tpu.data.checkpoint import (load_gcm_restart,
                                               save_gcm_restart)
    from speedy_ml_tpu.gcm import GCM
    from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data
    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float64,
              bd=synthetic_boundary_data(GEOM, sht))
    state, forcing = gcm.init_state(ModelDate(1990, 1, 1))
    state = gcm.stepone(state, forcing)
    save_gcm_restart(state, tmp_path / "restart.npz")
    template, _ = gcm.init_state(ModelDate(1990, 1, 1))
    restored = load_gcm_restart(tmp_path / "restart.npz", template)
    np.testing.assert_array_equal(np.asarray(state.spectral.t),
                                  np.asarray(restored.spectral.t))
    # restart must continue identically
    a = gcm.run_window(state, forcing, 4)
    b = gcm.run_window(restored, forcing, 4)
    np.testing.assert_array_equal(np.asarray(a.spectral.vor),
                                  np.asarray(b.spectral.vor))
