"""Physics driver: the full parametrization suite for one time step.

Reference: phy_phypar.f90.  Pure-functional: takes the spectral state, the
coupled-surface state, the daily forcing, and a radiation carry (shortwave
runs every nstrad steps; its transmissivities/fluxes persist in the carry
between radiation steps), returns grid tendencies + the new carry + flux
diagnostics for the coupler and the hybrid ML layer.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from speedy_ml_tpu.core.constants import REFRH1
from speedy_ml_tpu.physics import constants as pc
from speedy_ml_tpu.physics import radiation as rad
from speedy_ml_tpu.physics.boundaries import BoundaryData
from speedy_ml_tpu.physics.condensation import lscond
from speedy_ml_tpu.physics.convection import convmf
from speedy_ml_tpu.physics.humidity import qsat_from_t
from speedy_ml_tpu.physics.land_sea import SurfaceState
from speedy_ml_tpu.physics.surface import suflux
from speedy_ml_tpu.physics.vdiff import vdifsc


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RadiationCarry:
    """State persisting between shortwave radiation steps."""
    tau2: jnp.ndarray      # (K, 4, lat, lon) LW transmissivities
    stratc: jnp.ndarray    # (2, lat, lon)
    tt_rsw: jnp.ndarray    # (K, lat, lon) SW heating (tendency units)
    ssrd: jnp.ndarray      # (lat, lon) sfc downward SW
    ssr: jnp.ndarray       # net sfc SW
    tsr: jnp.ndarray       # net TOA SW
    randfv: jnp.ndarray    # (2, lat, K) RDF vertical modulation (mod_randfor)

    @staticmethod
    def zeros(K, nlat, nlon, dtype):
        z = lambda *s: jnp.zeros(s, dtype=dtype)
        return RadiationCarry(tau2=z(K, 4, nlat, nlon), stratc=z(2, nlat, nlon),
                              tt_rsw=z(K, nlat, nlon), ssrd=z(nlat, nlon),
                              ssr=z(nlat, nlon), tsr=z(nlat, nlon),
                              randfv=z(2, nlat, K))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DailyForcing:
    """Daily radiative/surface forcing (fordate, ini_fordate.f90)."""
    fsol: jnp.ndarray
    ozupp: jnp.ndarray
    ozone: jnp.ndarray
    zenit: jnp.ndarray
    stratz: jnp.ndarray
    alb_l: jnp.ndarray
    alb_s: jnp.ndarray
    albsfc: jnp.ndarray
    snowc: jnp.ndarray
    tcorh: jnp.ndarray     # spectral T diffusion correction
    qcorh: jnp.ndarray     # spectral q diffusion correction


class FluxDiag(NamedTuple):
    """Per-step fluxes needed by the coupler and hybrid output."""
    precnv: jnp.ndarray
    precls: jnp.ndarray
    hflux_l: jnp.ndarray
    hflux_s: jnp.ndarray
    hflux_i: jnp.ndarray
    olr: jnp.ndarray
    ts: jnp.ndarray


class PhysicsModel:
    """Static tables + the phypar-equivalent step function."""

    def __init__(self, geom, constants, dtype=jnp.float32, randfh=None):
        self.geom = geom
        self.const = constants
        self.dtype = jnp.dtype(dtype)
        # random diabatic forcing horizontal patterns (2, nlat, nlon) or
        # None = RDF disabled (the reference default: nstrdf=0)
        self.randfh = None if randfh is None else np.asarray(randfh,
                                                             dtype=self.dtype)
        # optional sharding constraint applied to grid fields at physics
        # entry (set via GCM.set_mesh): pins the column physics — the
        # embarrassingly lat/lon-parallel part of the GCM — to a
        # lat-sharded layout so XLA distributes it over the mesh instead
        # of replicating SPEEDY per device (SURVEY 2.3 GCM-parallelism gap)
        self.constrain = None

        hsg = np.asarray(geom.half_sigma, dtype=np.float64)
        sig = 0.5 * (hsg[1:] + hsg[:-1])
        dsig = hsg[1:] - hsg[:-1]
        sigl = np.log(sig)
        # half-level interpolation weights (inphys, ini_inphys.f90:39-45)
        wvi1 = np.zeros(geom.nlev)
        wvi2 = np.zeros(geom.nlev)
        for k in range(geom.nlev - 1):
            wvi1[k] = 1.0 / (sigl[k + 1] - sigl[k])
            wvi2[k] = (np.log(hsg[k + 1]) - sigl[k]) * wvi1[k]
        wvi2[geom.nlev - 1] = (np.log(0.99) - sigl[geom.nlev - 1]) * wvi1[geom.nlev - 2]

        self.sig = sig
        self.sigh = hsg
        self.dsig = dsig
        self.sigl = sigl
        # wvi2 is host-side; convmf gathers it by traced indices so it is
        # converted with jnp.asarray at the call site in compute()
        self.wvi2 = np.asarray(wvi2, dtype=self.dtype)
        self.wvi2_bot = float(wvi2[geom.nlev - 1])
        self.sigl_bot = float(sigl[geom.nlev - 1])
        # model-dtype tables: these multiply traced f32 fields and feed
        # .at[].add scatters — host f64 here would make the updates an
        # unsafe f64->f32 cast under jax_enable_x64
        self.grdsig = np.asarray(constants.grav / (dsig * constants.p0),
                                 dtype=self.dtype)
        self.grdscp = np.asarray(self.grdsig / constants.cp,
                                 dtype=self.dtype)
        self.slat = geom.sin_lat
        self.clat = geom.cos_lat
        self.fband = np.asarray(rad.build_fband(), dtype=self.dtype)

    # ------------------------------------------------------------------

    def daily_forcing(self, bd: BoundaryData, sfc: SurfaceState,
                      tyear, sht) -> DailyForcing:
        """fordate(1): solar forcing, surface albedo, diffusion corrections.

        tyear may be a Python float or a traced scalar (jit-safe)."""
        c = self.const
        sol = rad.sol_oz_traced(
            jnp.asarray(tyear, dtype=self.dtype),
            jnp.asarray(self.slat, dtype=self.dtype),
            jnp.asarray(self.clat, dtype=self.dtype), self.geom.nlon)

        snowc = jnp.minimum(1.0, sfc.snowd_am / pc.SD2SC)
        alb_l = bd.alb0 + snowc * (pc.ALBSN - bd.alb0)
        alb_s = pc.ALBSEA + sfc.sice_am * (pc.ALBICE - pc.ALBSEA)
        albsfc = alb_s + bd.fmask_l * (alb_l - alb_s)

        # T/q correction terms for horizontal diffusion (ini_fordate.f90:72-113)
        from speedy_ml_tpu.core.constants import GAMMA_LAPSE
        gamlat = GAMMA_LAPSE / (1000.0 * c.grav)
        corh = gamlat * bd.phis0
        tcorh = sht.grid_to_spec(corh)

        pexp = 1.0 / (c.rgas / c.akap * 0.0 + 287.0 * gamlat)  # 1/(rd*gamlat)
        tsfc = bd.fmask_l * sfc.stl_am + bd.fmask_s * sfc.sst_am
        tref_s = tsfc + corh
        psfc = (tsfc / tref_s) ** pexp
        qref = qsat_from_t(tref_s, jnp.ones_like(tref_s))
        qsfc = qsat_from_t(tsfc, psfc)
        qcorh = sht.grid_to_spec(REFRH1 * (qref - qsfc))

        return DailyForcing(fsol=sol.fsol, ozupp=sol.ozupp, ozone=sol.ozone,
                            zenit=sol.zenit, stratz=sol.stratz,
                            alb_l=alb_l, alb_s=alb_s, albsfc=albsfc,
                            snowc=snowc, tcorh=tcorh, qcorh=qcorh)

    # ------------------------------------------------------------------

    def compute(self, ug, vg, tg, qg, phig, pslg, *, bd: BoundaryData,
                sfc: SurfaceState, forcing: DailyForcing,
                carry: RadiationCarry, lradsw, sppt_pattern=None):
        """Physics tendencies from grid-point fields at the physics time level.

        All inputs (K, lat, lon) except pslg (lat, lon); lradsw is a traced
        bool (shortwave every nstrad steps).  sppt_pattern, if given, is the
        mu-tapered grid SPPT pattern (K, lat, lon) applied multiplicatively
        to the physics tendencies (phy_phypar.f90:218-228 — there the
        perturbation acts on tend - tend_dyn; these tendencies ARE the
        physics-only part, the dynamics part is added later in the dycore).
        Returns (utend, vtend, ttend, qtend, carry', FluxDiag)."""
        c = self.const
        K = self.geom.nlev
        sig, dsig, sigh = self.sig, self.dsig, self.sigh
        grdsig = self.grdsig
        grdscp = self.grdscp

        if self.constrain is not None:
            ug, vg, tg, qg, phig = map(self.constrain,
                                       (ug, vg, tg, qg, phig))
            pslg = self.constrain(pslg)

        psg = jnp.exp(pslg)
        rps = 1.0 / psg
        qg = jnp.maximum(qg, 0.0)
        se = c.cp * tg + phig

        p_norm = sig[:, None, None] * psg[None]
        qsat = qsat_from_t(tg, p_norm)
        rh = qg / qsat

        # --- precipitation ---
        itop, cbmf, precnv, dfse, dfqa = convmf(
            psg, se, qg, qsat, sig=sig, dsig=dsig, wvi2=jnp.asarray(self.wvi2),
            p0=c.p0, grav=c.grav, alhc=c.alhc)
        tt_cnv = dfse * rps[None] * grdscp[:, None, None]
        qt_cnv = dfqa * rps[None] * grdsig[:, None, None]
        icnv = (K - 1) - itop

        itop, precls, tt_lsc, qt_lsc = lscond(
            psg, qg, qsat, itop, sig=sig, dsig=dsig,
            p0=c.p0, grav=c.grav, cp=c.cp, alhc=c.alhc)

        ttend = tt_cnv + tt_lsc
        qtend = qt_cnv + qt_lsc

        # --- shortwave radiation (every nstrad steps) ---
        sol = rad.SolarForcing(fsol=forcing.fsol, ozupp=forcing.ozupp,
                               ozone=forcing.ozone, zenit=forcing.zenit,
                               stratz=forcing.stratz)

        def do_sw(_):
            gse = (se[K - 2] - se[K - 1]) / (phig[K - 2] - phig[K - 1])
            icltop, cloudc, clstr, qcloud = rad.cloud(
                qg, rh, precnv, precls, itop, gse, bd.fmask_l)
            ssrd, ssr, tsr, dfabs_sw, tau2, stratc = rad.radsw(
                psg, qg, icltop, cloudc, clstr, qcloud, sol, forcing.albsfc,
                sig=sig, dsig=dsig)
            tt_rsw = dfabs_sw * rps[None] * grdscp[:, None, None]
            # pin the carry dtype: solar-geometry tables can promote to
            # f64 under jax_enable_x64 even in an f32 model
            dt = carry.ssrd.dtype
            return RadiationCarry(tau2=tau2.astype(carry.tau2.dtype),
                                  stratc=stratc.astype(carry.stratc.dtype),
                                  tt_rsw=tt_rsw.astype(carry.tt_rsw.dtype),
                                  ssrd=ssrd.astype(dt), ssr=ssr.astype(dt),
                                  tsr=tsr.astype(dt), randfv=carry.randfv)

        carry = jax.lax.cond(lradsw, do_sw, lambda _: carry, operand=None)

        # --- longwave down ---
        slrd, dfabs_lw, flux_bands, st4a = rad.radlw_down(
            tg, carry.tau2, self.fband, wvi2=self.wvi2, dsig=dsig, sbc=c.sbc)

        # --- surface fluxes ---
        fx = suflux(psg, ug, vg, tg, qg, rh, phig,
                    phi0=bd.phis0, fmask=bd.fmask_l, tland=sfc.stl_am,
                    tsea=sfc.sst_am, swav=sfc.soilw_am, ssrd=carry.ssrd,
                    slrd=slrd, forog=bd.forog, alb_l=forcing.alb_l,
                    alb_s=forcing.alb_s, snowc=forcing.snowc,
                    clat_row=jnp.asarray(self.clat, dtype=self.dtype),
                    sigl_bot=self.sigl_bot, wvi2_bot=self.wvi2_bot,
                    rd=287.0, cp=c.cp, alhc=c.alhc, sbc=c.sbc)

        # --- longwave up ---
        slr, olr, dfabs_lw = rad.radlw_up(
            tg, fx.tsfc, slrd, fx.slru[2], dfabs_lw, flux_bands, st4a,
            carry.tau2, carry.stratc, self.fband, dsig=dsig, sbc=c.sbc)
        tt_rlw = dfabs_lw * rps[None] * grdscp[:, None, None]
        ttend = ttend + carry.tt_rsw + tt_rlw

        # --- PBL / vertical diffusion ---
        ut_pbl, vt_pbl, tt_pbl, qt_pbl = vdifsc(
            ug, vg, se, rh, qg, qsat, phig, icnv,
            sig=sig, sigh=sigh, dsig=dsig, cp=c.cp, alhc=c.alhc)

        bot = K - 1
        ut_pbl = ut_pbl.at[bot].add(fx.ustr[2] * rps * grdsig[bot])
        vt_pbl = vt_pbl.at[bot].add(fx.vstr[2] * rps * grdsig[bot])
        tt_pbl = tt_pbl.at[bot].add(fx.shf[2] * rps * grdscp[bot])
        qt_pbl = qt_pbl.at[bot].add(fx.evap[2] * rps * grdsig[bot])

        utend = ut_pbl
        vtend = vt_pbl
        ttend = ttend + tt_pbl
        qtend = qtend + qt_pbl

        # --- random diabatic forcing (phy_phypar.f90:202-215) ---
        if self.randfh is not None:
            from speedy_ml_tpu.physics.randfor import setrdf, xs_rdf

            def do_xs(_):
                return jnp.stack([xs_rdf(tt_lsc, tt_cnv, sig, 0),
                                  xs_rdf(carry.tt_rsw, tt_rlw, sig, 1)])

            randfv = jax.lax.cond(lradsw, do_xs, lambda _: carry.randfv,
                                  operand=None)
            carry = dataclasses.replace(carry, randfv=randfv)
            ttend = ttend + setrdf(jnp.asarray(self.randfh), randfv)

        # --- SPPT multiplicative noise on the physics tendencies ---
        if sppt_pattern is not None:
            fac = 1.0 + sppt_pattern
            utend = fac * utend
            vtend = fac * vtend
            ttend = fac * ttend
            qtend = fac * qtend

        # --- fluxes for the coupler (difice as in ppo_dmflux.f90:114-118) ---
        esbc = pc.EMISFC * c.sbc
        difice = ((pc.ALBSEA - pc.ALBICE) * carry.ssrd
                  + esbc * (pc.SSTFR**4 - sfc.tice_am**4)
                  + fx.shf[1] + fx.evap[1] * c.alhc)
        diag = FluxDiag(precnv=precnv, precls=precls,
                        hflux_l=fx.hfluxn[0],
                        hflux_s=fx.hfluxn[1],
                        hflux_i=fx.hfluxn[1] + difice * (1.0 - sfc.sice_am),
                        olr=olr, ts=fx.tsfc)
        return utend, vtend, ttend, qtend, carry, diag
