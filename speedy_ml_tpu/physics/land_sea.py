"""Slab land and sea(+ice) anomaly models and the daily coupler exchange.

Reference: mod_cpl_land_model.f90, cpl_sea_model.f90, cpl_land.f90,
cpl_sea.f90, cpl_bcinterp.f90.  The reference exchanges data through
global arrays once per day; here the coupled surface state is an explicit
pytree advanced by pure functions, so it shards and jits cleanly.

Coupling flags (mod_cpl_flags.f90) are configurable via `CplFlags`;
defaults match the reference's production setting: icland=1, icsea=0,
icice=1, isstan=0, global sea-model domain.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speedy_ml_tpu.physics import constants as pc
from speedy_ml_tpu.physics.boundaries import BoundaryData


@dataclasses.dataclass(frozen=True)
class CplFlags:
    """Coupling options (mod_cpl_flags.f90 + the cls_insea.h domain
    flags).  All static: branches resolve at trace time.

    icsea: <=1 observed SST (climatology, + obs anomaly when isstan>0);
           2 full ocean-model SST; 3 climatology + ocean-model anomaly;
           >=4 as 3 but blended toward the observed anomaly inside the
           elnino domain (sea2atm, cpl_sea.f90:150-201).
    icland / icice: prognostic slab land / sea-ice (0 = climatology).
    isstan: >0 = apply observed SST anomalies (sstan_ob).
    sea_domains: regional domains where SST/ice anomalies relax to the
    slab model ("globe", "northe", "natlan", "npacif", "tropic",
    "indian"); outside them cdsea/cdice = 0 (cpl_sea_model.f90:84-118).
    """
    icland: int = 1
    icsea: int = 0
    icice: int = 1
    isstan: int = 0
    sea_domains: tuple = ("globe",)


def sea_domain_mask(name: str, lat_deg: np.ndarray, nlon: int) -> np.ndarray:
    """Regional ocean-domain mask (sea_domain, cpl_sea_model.f90:208-301).

    Longitudes are 0..360 east, lon[i] = i*360/nlon, as in the
    reference's rlon = (i-1)*dlon."""
    nlat = lat_deg.shape[0]
    m = np.zeros((nlat, nlon))
    rlon = np.arange(nlon) * (360.0 / nlon)
    lat = np.asarray(lat_deg)[:, None]
    lon = rlon[None, :]
    if name == "globe":
        m[:] = 1.0
    elif name == "northe":
        m[:] = np.where(lat > 20.0, 1.0, 0.0)
    elif name == "natlan":
        m[:] = np.where((lat > 20.0) & (lat < 80.0)
                        & ((lon < 45.0) | (lon > 260.0)), 1.0, 0.0)
    elif name == "npacif":
        m[:] = np.where((lat > 20.0) & (lat < 65.0)
                        & (lon > 120.0) & (lon < 260.0), 1.0, 0.0)
    elif name == "tropic":
        m[:] = np.where((lat > -30.0) & (lat < 30.0), 1.0, 0.0)
    elif name == "indian":
        m[:] = np.where((lat > -30.0) & (lat < 30.0)
                        & (lon > 30.0) & (lon < 120.0), 1.0, 0.0)
    elif name == "elnino":
        arlat = np.abs(lat)
        wlat = np.where(arlat > 15.0, (0.1 * (25.0 - arlat)) ** 2, 1.0)
        rlonw = 300.0 - 2.0 * np.maximum(lat, 0.0)
        core = (lon > 165.0) & (lon < rlonw)
        ramp = (lon > 155.0) & (lon <= 165.0)
        m[:] = np.where(arlat < 25.0,
                        np.where(core, wlat,
                                 np.where(ramp, wlat * 0.1 * (lon - 155.0),
                                          0.0)),
                        0.0)
    else:
        raise ValueError(f"unknown sea domain {name!r}")
    return m


def forint(for12: jnp.ndarray, imon: jnp.ndarray, fmon: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of monthly climatology (cpl_bcinterp.f90:1-23).

    for12: (12, ...); imon: 0-based month index; fmon in (0, 1)."""
    for12 = jnp.asarray(for12)
    imon2 = jnp.where(fmon <= 0.5, (imon - 1) % 12, (imon + 1) % 12)
    wmon = jnp.where(fmon <= 0.5, 0.5 - fmon, fmon - 0.5)
    return for12[imon] + wmon * (for12[imon2] - for12[imon])


def forin5(for12: jnp.ndarray, imon: jnp.ndarray, fmon: jnp.ndarray) -> jnp.ndarray:
    """Mean-conserving nonlinear interpolation (cpl_bcinterp.f90:25-60)."""
    for12 = jnp.asarray(for12)
    im2, im1 = (imon - 2) % 12, (imon - 1) % 12
    ip1, ip2 = (imon + 1) % 12, (imon + 2) % 12
    c0 = 1.0 / 12.0
    t0 = c0 * fmon
    t1 = c0 * (1.0 - fmon)
    t2 = 0.25 * fmon * (1.0 - fmon)
    wm2 = -t1 + t2
    wm1 = -c0 + 8 * t1 - 6 * t2
    w0 = 7 * c0 + 10 * t2
    wp1 = -c0 + 8 * t0 - 6 * t2
    wp2 = -t0 + t2
    return (wm2 * for12[im2] + wm1 * for12[im1] + w0 * for12[imon]
            + wp1 * for12[ip1] + wp2 * for12[ip2])


class SlabCoeffs(NamedTuple):
    """Constant heat capacities / damping (land_model_init, sea_model_init)."""
    rhcapl: jnp.ndarray
    cdland: jnp.ndarray
    rhcaps: jnp.ndarray
    rhcapi: jnp.ndarray
    cdsea: jnp.ndarray
    cdice: jnp.ndarray


def build_slab_coeffs(bd: BoundaryData, lat_deg: np.ndarray, dtype,
                      sea_domains: tuple = ("globe",)) -> SlabCoeffs:
    nlat = lat_deg.shape[0]
    fmask_l = np.asarray(bd.fmask_l)
    alb0 = np.asarray(bd.alb0)
    fmask_s = np.asarray(bd.fmask_s)

    # land (mod_cpl_land_model.f90:20-83)
    depth_soil, depth_lice, tdland, flandmin = 1.0, 5.0, 40.0, 1.0 / 3.0
    hcapl = depth_soil * 2.50e6
    hcapli = depth_lice * 1.93e6
    dmask_l = np.where(fmask_l < flandmin, 0.0, 1.0)
    rhcapl = np.where(alb0 < 0.4, 86400.0 / hcapl, 86400.0 / hcapli)
    rhcapl = np.broadcast_to(rhcapl, fmask_l.shape)
    cdland = dmask_l * tdland / (1.0 + dmask_l * tdland)

    # sea (cpl_sea_model.f90:1-115)
    depth_ml, dept0_ml = 60.0, 40.0
    depth_ice, dept0_ice = 2.5, 1.5
    tdsst, tdice, fseamin = 90.0, 30.0, 1.0 / 3.0
    coslat = np.cos(np.deg2rad(lat_deg))
    hcaps = 4.18e6 * (depth_ml + (dept0_ml - depth_ml) * coslat**3)
    hcapi = 1.93e6 * (depth_ice + (dept0_ice - depth_ice) * coslat**2)

    # domain mask: union of the selected regional domains
    # (cpl_sea_model.f90:84-96); "globe" short-circuits to all-ones
    if "globe" in sea_domains:
        dmask = np.ones_like(fmask_s)
    else:
        dmask = np.zeros_like(fmask_s)
        for name in sea_domains:
            dmask = np.maximum(dmask, sea_domain_mask(
                name, np.asarray(lat_deg), fmask_s.shape[1]))
    sm = dmask.copy()
    sm[1:-1] = 0.25 * (dmask[:-2] + 2 * dmask[1:-1] + dmask[2:])
    dmask = np.where(fmask_s < fseamin, 0.0, sm)

    rhcaps = np.broadcast_to(86400.0 / hcaps[:, None], fmask_s.shape)
    rhcapi = np.broadcast_to(86400.0 / hcapi[:, None], fmask_s.shape)
    cdsea = dmask * tdsst / (1.0 + dmask * tdsst)
    cdice = dmask * tdice / (1.0 + dmask * tdice)

    f = lambda x: np.asarray(x, dtype=dtype)
    return SlabCoeffs(rhcapl=f(rhcapl), cdland=f(cdland), rhcaps=f(rhcaps),
                      rhcapi=f(rhcapi), cdsea=f(cdsea), cdice=f(cdice))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceState:
    """Prognostic coupled-surface state + current atmospheric-side fields."""
    stl_lm: jnp.ndarray     # land model surface temperature
    sst_om: jnp.ndarray     # ocean model SST (0 when icsea=0)
    tice_om: jnp.ndarray    # sea-ice temperature
    sice_om: jnp.ndarray    # sea-ice fraction
    # atmospheric-side fields (what suflux/fordate consume)
    stl_am: jnp.ndarray
    snowd_am: jnp.ndarray
    soilw_am: jnp.ndarray
    sst_am: jnp.ndarray
    sice_am: jnp.ndarray
    tice_am: jnp.ndarray


def interp_climatology(bd: BoundaryData, imon, fmon):
    """Date-interpolated climatological surface fields + sea-ice adjustment.

    Returns dict with stlcl, snowdcl, soilwcl, sstcl, sicecl, ticecl
    (atm2sea/atm2land, cpl_sea.f90:92-114)."""
    stlcl = forin5(bd.stl12, imon, fmon)
    snowdcl = forint(bd.snowd12, imon, fmon)
    soilwcl = forint(bd.soilw12, imon, fmon)
    sstcl = forin5(bd.sst12, imon, fmon)
    sicecl = forint(bd.sice12, imon, fmon)

    warm = sstcl > pc.SSTFR
    sicecl_w = jnp.minimum(0.5, sicecl)
    ticecl_w = jnp.full_like(sstcl, pc.SSTFR)
    sstcl_w = jnp.where(sicecl_w > 0.0,
                        pc.SSTFR + (sstcl - pc.SSTFR) / (1.0 - sicecl_w), sstcl)
    sicecl_c = jnp.maximum(0.5, sicecl)
    ticecl_c = pc.SSTFR + (sstcl - pc.SSTFR) / sicecl_c
    sstcl_c = jnp.full_like(sstcl, pc.SSTFR)

    sicecl = jnp.where(warm, sicecl_w, sicecl_c)
    ticecl = jnp.where(warm, ticecl_w, ticecl_c)
    sstcl0 = sstcl                         # pre-ice-adjustment (sstcl0)
    sstcl = jnp.where(warm, sstcl_w, sstcl_c)
    return dict(stlcl=stlcl, snowdcl=snowdcl, soilwcl=soilwcl,
                sstcl=sstcl, sicecl=sicecl, ticecl=ticecl, sstcl0=sstcl0)


def init_surface_state(bd: BoundaryData, imon, fmon,
                       sst_hybrid: jnp.ndarray | None = None,
                       sst_bias: float = 0.0,
                       flags: CplFlags = CplFlags()) -> SurfaceState:
    """ini_land + ini_sea (+ hybrid SST injection, cpl_sea.f90:38-46).

    icsea<=0 starts the ocean-model SST at 0 (cpl_sea.f90:26-31);
    icsea>0 starts it at the climatology."""
    cl = interp_climatology(bd, imon, fmon)
    sst_am = cl["sstcl"]
    sice_am = cl["sicecl"]
    tice_am = cl["ticecl"]
    if sst_hybrid is not None:
        diff = sst_am - sst_hybrid
        sst_am = jnp.where(diff < 6.0, sst_hybrid, sst_am)
        sst_am = sst_am + sst_bias
    sst_am = sst_am + sice_am * (tice_am - sst_am)
    sst_om = cl["sstcl"] if flags.icsea > 0 else jnp.zeros_like(sst_am)
    return SurfaceState(
        stl_lm=cl["stlcl"], sst_om=sst_om,
        tice_om=cl["ticecl"], sice_om=cl["sicecl"],
        stl_am=cl["stlcl"], snowd_am=cl["snowdcl"], soilw_am=cl["soilwcl"],
        sst_am=sst_am, sice_am=sice_am, tice_am=tice_am)


def couple_daily(state: SurfaceState, coeffs: SlabCoeffs, bd: BoundaryData,
                 fluxes: dict, imon, fmon,
                 flags: CplFlags = CplFlags(),
                 sstan_ob: Optional[jnp.ndarray] = None,
                 wsst_ob: Optional[jnp.ndarray] = None,
                 sstom12: Optional[jnp.ndarray] = None) -> SurfaceState:
    """agcm_to_coupler + coupler_to_agcm for one day.

    fluxes: dict with daily-mean hflux_l, hflux_s, hflux_i (from the flux
    accumulator).  Flag branches are static (trace-time):

    - icland: prognostic slab land temperature vs climatology;
    - icsea / isstan: sea2atm SST modes (cpl_sea.f90:150-201);
    - icice: prognostic vs climatological sea ice;
    - sstan_ob: observed SST anomaly at this date (isstan>0 / icsea>=4);
    - wsst_ob: elnino-domain blend weights (icsea>=4);
    - sstom12: ocean-model monthly SST climatology (sstom12; icsea>=3) —
      defaults to the observed sst12, making the model anomaly relative
      to the observed climatology."""
    cl = interp_climatology(bd, imon, fmon)

    # land model (mod_cpl_land_model.f90:85-126)
    if flags.icland > 0:
        tanom = state.stl_lm - cl["stlcl"]
        tanom = coeffs.cdland * (tanom + coeffs.rhcapl * fluxes["hflux_l"])
        stl_lm = tanom + cl["stlcl"]
        stl_am = stl_lm
    else:
        stl_lm = cl["stlcl"]
        stl_am = cl["stlcl"]

    # sea/ice model (cpl_sea_model.f90:117-206); hfseacl = 0 (no
    # flux-correction climatology file in this environment).
    # sice0 entering the model is TODAY's climatological ice fraction
    # (atm2sea passes sicecl_ob, cpl_sea.f90:124).
    sice0 = cl["sicecl"]
    if flags.icsea > 0 or flags.icice > 0:
        hflux = fluxes["hflux_s"] - sice0 * (
            fluxes["hflux_i"] + 1.0 * (pc.SSTFR - state.tice_om))
        tanom_s = state.sst_om - cl["sstcl"]
        tanom_s = coeffs.cdsea * (tanom_s + coeffs.rhcaps * hflux)
        sst_om = tanom_s + cl["sstcl"]

        hflux_i = fluxes["hflux_i"] + 1.0 * (pc.SSTFR - state.tice_om)
        tanom_i = state.tice_om - cl["ticecl"]
        anom0 = 20.0
        cdis = coeffs.cdice * (anom0 / (anom0 + jnp.abs(tanom_i)))
        tanom_i = cdis * (tanom_i + coeffs.rhcapi * hflux_i)
        tice_om = tanom_i + cl["ticecl"]
    else:
        sst_om, tice_om = state.sst_om, state.tice_om

    # sea2atm (cpl_sea.f90:150-201)
    if flags.icsea <= 1:
        sstan_am = (sstan_ob if (flags.isstan > 0 and sstan_ob is not None)
                    else 0.0)
        sst_am = cl["sstcl"] + sstan_am
    elif flags.icsea == 2:
        sst_am = sst_om
    else:   # icsea >= 3: climatology + ocean-model anomaly
        om12 = bd.sst12 if sstom12 is None else sstom12
        # ocean-model climatology gets the same sea-ice adjustment delta
        # as the observed one (atm2sea, cpl_sea.f90:115)
        sstcl_om = forin5(om12, imon, fmon) + (cl["sstcl"] - cl["sstcl0"])
        sstan_am = sst_om - sstcl_om
        if flags.icsea >= 4 and wsst_ob is not None and sstan_ob is not None:
            sstan_am = sstan_am + wsst_ob * (sstan_ob - sstan_am)
        sst_am = cl["sstcl"] + sstan_am

    if flags.icice > 0:
        sice_am = sice0          # sea_model: sice1 = sice0 (persistence)
        tice_am = tice_om
    else:
        sice_am = cl["sicecl"]
        tice_am = cl["ticecl"]
    sst_am = sst_am + sice_am * (tice_am - sst_am)

    return SurfaceState(
        stl_lm=stl_lm, sst_om=sst_om, tice_om=tice_om, sice_om=cl["sicecl"],
        stl_am=stl_am, snowd_am=cl["snowdcl"], soilw_am=cl["soilwcl"],
        sst_am=sst_am, sice_am=sice_am, tice_am=tice_am)


def sstan_for_window(sstan3: jnp.ndarray, fmon) -> jnp.ndarray:
    """Interpolate a 3-month (prev, this, next) observed-anomaly window
    to the date (atm2sea: forint(ngp, 2, tmonth, sstan3, ...),
    cpl_sea.f90:85-88)."""
    return forint(sstan3, jnp.asarray(1), fmon)
