"""Configurable sea coupling (VERDICT r3 #6): icsea modes, regional
sea-model domains incl. the elnino blend mask, and observed-SST-anomaly
forcing, against the anomaly-model math of cpl_sea.f90:150-201 and
cpl_sea_model.f90:208-301."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry
from speedy_ml_tpu.core.spectral import SpectralTransform
from speedy_ml_tpu.physics import constants as pc
from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data
from speedy_ml_tpu.physics.land_sea import (CplFlags, build_slab_coeffs,
                                            couple_daily, forin5,
                                            init_surface_state,
                                            interp_climatology,
                                            sea_domain_mask,
                                            sstan_for_window)

GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)


def _setup(dtype=jnp.float64, land=False):
    # aquaplanet by default: land=True is ALL land (fmask_s = 0)
    sht = SpectralTransform(GEOM, dtype=dtype)
    bd = synthetic_boundary_data(GEOM, sht, land=land)
    lat_deg = np.rad2deg(GEOM.lat_radians)
    return bd, lat_deg


def _fluxes(bd, scale=30.0):
    rng = np.random.default_rng(0)
    shp = np.asarray(bd.sst12[0]).shape
    return {k: jnp.asarray(rng.normal(0, scale, shp))
            for k in ("hflux_l", "hflux_s", "hflux_i")}


IMON, FMON = jnp.asarray(5), jnp.asarray(0.4)


def test_elnino_mask_matches_fortran_formula():
    """cpl_sea_model.f90:278-297: wlat taper, 155-165E ramp, western
    boundary rlonw = 300 - 2*max(lat, 0)."""
    lat = np.array([-30.0, -20.0, -10.0, 0.0, 10.0, 20.0, 30.0])
    nlon = 96
    m = sea_domain_mask("elnino", lat, nlon)
    dlon = 360.0 / nlon
    # outside |lat| < 25: zero
    assert (m[0] == 0).all() and (m[-1] == 0).all()
    # equator, 180E (core): weight 1
    assert m[3, 48] == pytest.approx(1.0)                 # lon 48*3.75=180
    # equator, ramp zone (155-165E): 0.1*(lon-155)
    i = 42                                                # lon 157.5
    assert m[3, i] == pytest.approx(0.1 * (i * dlon - 155.0))
    # lat 20 (row 5): wlat = (0.1*(25-20))^2 = 0.25; rlonw = 300-40 = 260
    assert m[5, 48] == pytest.approx(0.25)
    assert m[5, int(np.ceil(260 / dlon))] == 0.0     # beyond rlonw at 20N
    assert m[2, int(290 / dlon)] == pytest.approx(1.0)  # 10S: rlonw=300


def test_regional_domain_restricts_relaxation():
    """cdsea vanishes outside the configured domain (natlan)."""
    bd, lat_deg = _setup()
    glob = build_slab_coeffs(bd, lat_deg, jnp.float64)
    reg = build_slab_coeffs(bd, lat_deg, jnp.float64,
                            sea_domains=("natlan",))
    cd_g = np.asarray(glob.cdsea)
    cd_r = np.asarray(reg.cdsea)
    trop = np.abs(lat_deg) < 15.0             # tropics: outside natlan
    assert cd_r[trop].max() == 0.0
    assert cd_g[trop].max() > 0.0
    north = (lat_deg > 25.0) & (lat_deg < 75.0)
    lon = np.arange(GEOM.nlon) * (360.0 / GEOM.nlon)
    atl = (lon < 40.0) | (lon > 265.0)
    sub = cd_r[np.ix_(north, atl)]
    assert sub.max() > 0.0                    # active inside the domain


def test_icsea2_full_ocean_model_sst():
    bd, lat_deg = _setup()
    coeffs = build_slab_coeffs(bd, lat_deg, jnp.float64)
    flags = CplFlags(icsea=2)
    sfc = init_surface_state(bd, IMON, FMON, flags=flags)
    assert float(jnp.abs(sfc.sst_om).max()) > 0.0   # init from climo
    out = couple_daily(sfc, coeffs, bd, _fluxes(bd), IMON, FMON,
                       flags=flags)
    # sea2atm icsea=2: sst_am = sst_om, then the ice blend
    expect = out.sst_om + out.sice_am * (out.tice_am - out.sst_om)
    np.testing.assert_allclose(np.asarray(out.sst_am), np.asarray(expect),
                               rtol=1e-12)


def test_icsea3_model_anomaly_plus_climatology():
    bd, lat_deg = _setup()
    coeffs = build_slab_coeffs(bd, lat_deg, jnp.float64)
    flags = CplFlags(icsea=3)
    sfc = init_surface_state(bd, IMON, FMON, flags=flags)
    # distinct ocean-model climatology: +0.5 K everywhere
    om12 = jnp.asarray(np.asarray(bd.sst12) + 0.5)
    out = couple_daily(sfc, coeffs, bd, _fluxes(bd), IMON, FMON,
                       flags=flags, sstom12=om12)
    cl = interp_climatology(bd, IMON, FMON)
    sstcl_om = forin5(om12, IMON, FMON) + (cl["sstcl"] - cl["sstcl0"])
    anom = out.sst_om - sstcl_om
    expect = cl["sstcl"] + anom
    expect = expect + out.sice_am * (out.tice_am - expect)
    np.testing.assert_allclose(np.asarray(out.sst_am), np.asarray(expect),
                               rtol=1e-12)


def test_icsea4_elnino_blend():
    bd, lat_deg = _setup()
    coeffs = build_slab_coeffs(bd, lat_deg, jnp.float64)
    flags = CplFlags(icsea=4)
    wsst = jnp.asarray(sea_domain_mask("elnino", lat_deg, GEOM.nlon))
    sstan = jnp.asarray(np.full((GEOM.nlat, GEOM.nlon), 2.0))
    sfc = init_surface_state(bd, IMON, FMON, flags=flags)
    out = couple_daily(sfc, coeffs, bd, _fluxes(bd), IMON, FMON,
                       flags=flags, sstan_ob=sstan, wsst_ob=wsst)
    cl = interp_climatology(bd, IMON, FMON)
    sstcl_om = forin5(bd.sst12, IMON, FMON) + (cl["sstcl"] - cl["sstcl0"])
    anom = out.sst_om - sstcl_om
    anom = anom + wsst * (sstan - anom)
    expect = cl["sstcl"] + anom
    expect = expect + out.sice_am * (out.tice_am - expect)
    np.testing.assert_allclose(np.asarray(out.sst_am), np.asarray(expect),
                               rtol=1e-12)


def test_isstan_observed_anomaly():
    bd, lat_deg = _setup()
    coeffs = build_slab_coeffs(bd, lat_deg, jnp.float64)
    base = CplFlags()                           # icsea=0, isstan=0
    obs = CplFlags(isstan=1)
    sstan = jnp.asarray(np.full((GEOM.nlat, GEOM.nlon), 1.5))
    sfc = init_surface_state(bd, IMON, FMON, flags=base)
    fx = _fluxes(bd)
    out0 = couple_daily(sfc, coeffs, bd, fx, IMON, FMON, flags=base,
                        sstan_ob=sstan)          # ignored when isstan=0
    out1 = couple_daily(sfc, coeffs, bd, fx, IMON, FMON, flags=obs,
                        sstan_ob=sstan)
    d = np.asarray(out1.sst_am - out0.sst_am)
    ice_free = np.asarray(out1.sice_am) == 0.0
    np.testing.assert_allclose(d[ice_free], 1.5, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out0.sst_am),
        np.asarray(couple_daily(sfc, coeffs, bd, fx, IMON, FMON,
                                flags=base).sst_am))


def test_icland0_climatological_land():
    bd, lat_deg = _setup(land=True)
    coeffs = build_slab_coeffs(bd, lat_deg, jnp.float64)
    flags = CplFlags(icland=0)
    sfc = init_surface_state(bd, IMON, FMON, flags=flags)
    out = couple_daily(sfc, coeffs, bd, _fluxes(bd, scale=200.0),
                       IMON, FMON, flags=flags)
    cl = interp_climatology(bd, IMON, FMON)
    np.testing.assert_allclose(np.asarray(out.stl_am),
                               np.asarray(cl["stlcl"]), rtol=1e-12)


def test_icice0_climatological_ice():
    bd, lat_deg = _setup()
    coeffs = build_slab_coeffs(bd, lat_deg, jnp.float64)
    flags = CplFlags(icice=0)
    sfc = init_surface_state(bd, IMON, FMON, flags=flags)
    out = couple_daily(sfc, coeffs, bd, _fluxes(bd, scale=200.0),
                       IMON, FMON, flags=flags)
    cl = interp_climatology(bd, IMON, FMON)
    np.testing.assert_allclose(np.asarray(out.tice_am),
                               np.asarray(cl["ticecl"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.sice_am),
                               np.asarray(cl["sicecl"]), rtol=1e-12)


def test_sstan_window_interpolation():
    """forint over the (prev, this, next) anomaly window: at fmon=0.5
    the middle month's value is returned exactly."""
    win = jnp.asarray(np.stack([np.full((4, 8), -1.0),
                                np.full((4, 8), 2.0),
                                np.full((4, 8), 5.0)]))
    mid = sstan_for_window(win, jnp.asarray(0.5))
    np.testing.assert_allclose(np.asarray(mid), 2.0)
    early = sstan_for_window(win, jnp.asarray(0.25))
    np.testing.assert_allclose(np.asarray(early), 2.0 + 0.25 * (-1.0 - 2.0))


def test_gcm_end_to_end_with_flags():
    """A GCM built with icsea=2 + isstan anomalies runs a coupled day
    and produces finite, mode-consistent SSTs."""
    import jax
    from speedy_ml_tpu.data.calendar import ModelDate
    from speedy_ml_tpu.gcm import GCM

    bd, lat_deg = _setup(jnp.float32)
    sstan = np.zeros((24, GEOM.nlat, GEOM.nlon), dtype=np.float32)
    sstan[:] = 1.0
    gcm = GCM(GEOM, dtype=jnp.float32, bd=bd, nsteps_day=36,
              cpl_flags=CplFlags(icsea=2, isstan=1),
              sstan_monthly=sstan, sstan_year0=1990)
    date = ModelDate(1990, 6, 1)
    state, forcing = gcm.init_state(date)
    state = gcm.stepone(state, forcing)
    state, date = gcm.run_days(state, date, 1)
    sst = np.asarray(state.sfc.sst_am)
    assert np.isfinite(sst).all()
    # icsea=2: the atmospheric SST is the prognostic slab SST (+ice blend)
    om = np.asarray(state.sfc.sst_om)
    ice = np.asarray(state.sfc.sice_am)
    tice = np.asarray(state.sfc.tice_am)
    np.testing.assert_allclose(sst, om + ice * (tice - om), atol=1e-4)
