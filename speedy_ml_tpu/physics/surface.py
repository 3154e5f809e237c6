"""Surface fluxes of momentum, energy and moisture (reference: phy_suflux.f90).

Bulk formulas over land and sea with stability correction, land skin
temperature from an energy-balance Newton step, and land/sea blending by
the fractional mask.  Everything is elementwise over (lat, lon).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from speedy_ml_tpu.physics import constants as pc
from speedy_ml_tpu.physics.humidity import qsat_from_t


class SurfaceFluxes(NamedTuple):
    ustr: tuple      # (land, sea, weighted)
    vstr: tuple
    shf: tuple
    evap: tuple
    slru: tuple
    hfluxn: tuple    # (land, sea)
    tsfc: jnp.ndarray
    tskin: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray
    t0: jnp.ndarray
    q0: jnp.ndarray


def sflset(phi0_grid: np.ndarray, grav: float) -> np.ndarray:
    """Orographic land-drag factor (phy_suflux.f90:358-382)."""
    rhdrag = 1.0 / (grav * pc.HDRAG)
    return 1.0 + pc.FHDRAG * (1.0 - np.exp(-np.maximum(phi0_grid, 0.0) * rhdrag))


def suflux(psa, ua, va, ta, qa, rh, phi, *, phi0, fmask, tland, tsea, swav,
           ssrd, slrd, forog, alb_l, alb_s, snowc, clat_row, sigl_bot,
           wvi2_bot, rd, cp, alhc, sbc):
    """Surface fluxes; see SurfaceFluxes. Index [K-1] = lowest model level.

    clat_row: (lat,) cos(latitude); broadcast over lon internally.
    """
    K = ua.shape[0]
    nl1 = K - 2
    esbc = pc.EMISFC * sbc
    esbc4 = 4.0 * esbc
    clat2d = clat_row[:, None]

    # 1. extrapolation to the surface
    u0 = pc.FWIND0 * ua[K - 1]
    v0 = pc.FWIND0 * va[K - 1]

    gtemp0 = 1.0 - pc.FTEMP0
    rcp = 1.0 / cp
    rdphi0 = -1.0 / (rd * 288.0 * sigl_bot)
    dt1 = wvi2_bot * (ta[K - 1] - ta[nl1])
    t1_land = ta[K - 1] + dt1
    t1_sea = t1_land + phi0 * dt1 * rdphi0
    t2_sea = ta[K - 1] + rcp * phi[K - 1]
    t2_land = t2_sea - rcp * phi0

    unstable = ta[K - 1] > ta[nl1]
    t1_land = jnp.where(unstable, pc.FTEMP0 * t1_land + gtemp0 * t2_land, ta[K - 1])
    t1_sea = jnp.where(unstable, pc.FTEMP0 * t1_sea + gtemp0 * t2_sea, ta[K - 1])
    t0 = t1_sea + fmask * (t1_land - t1_sea)

    # density * wind speed with gustiness
    prd = 1.0e5 / rd
    vg2 = pc.VGUST**2
    denvvs0 = (prd * psa / t0) * jnp.sqrt(u0 * u0 + v0 * v0 + vg2)

    # 2. land fluxes with effective skin temperature
    tskin = tland + pc.CTDAY * jnp.sqrt(clat2d) * ssrd * (1.0 - alb_l) * psa

    rdth = pc.FSTAB / pc.DTHETA
    astab = 0.5
    dthl = jnp.where(tskin > t2_land,
                     jnp.minimum(pc.DTHETA, tskin - t2_land),
                     jnp.maximum(-pc.DTHETA, astab * (tskin - t2_land)))
    denvvs1 = denvvs0 * (1.0 + dthl * rdth)

    cdldv = pc.CDL * denvvs0 * forog
    ustr_l = -cdldv * ua[K - 1]
    vstr_l = -cdldv * va[K - 1]

    chlcp = pc.CHL * cp
    shf_l = chlcp * denvvs1 * (tskin - t1_land)

    q1_land = qa[K - 1]       # FHUM0 = 0 path
    qsat_skin = qsat_from_t(tskin, psa)
    evap_l = pc.CHL * denvvs1 * jnp.maximum(0.0, swav * qsat_skin - q1_land)

    # 3. land energy balance -> skin temperature Newton correction
    tsk3 = tskin**3
    dslr = esbc4 * tsk3
    slru_l = esbc * tsk3 * tskin
    hflux_l = ssrd * (1.0 - alb_l) + slrd - (slru_l + shf_l + alhc * evap_l)

    clamb = pc.CLAMBDA + snowc * (pc.CLAMBSN - pc.CLAMBDA)
    hflux_l = hflux_l - clamb * (tskin - tland)
    dqsat = jnp.where(evap_l > 0.0,
                      swav * (qsat_from_t(tskin + 1.0, psa) - qsat_skin), 0.0)
    dhfdt = clamb + dslr + pc.CHL * denvvs1 * (cp + alhc * dqsat)
    dtskin = hflux_l / dhfdt
    tskin = tskin + dtskin

    shf_l = shf_l + chlcp * denvvs1 * dtskin
    evap_l = evap_l + pc.CHL * denvvs1 * dqsat * dtskin
    slru_l = slru_l + dslr * dtskin
    hflux_l = clamb * (tskin - tland)

    # 4. sea fluxes
    dths = jnp.where(tsea > t2_sea,
                     jnp.minimum(pc.DTHETA, tsea - t2_sea),
                     jnp.maximum(-pc.DTHETA, astab * (tsea - t2_sea)))
    denvvs2 = denvvs0 * (1.0 + dths * rdth)
    q1_sea = qa[K - 1]

    cdsdv = pc.CDS * denvvs2
    ustr_s = -cdsdv * ua[K - 1]
    vstr_s = -cdsdv * va[K - 1]

    chscp = pc.CHS * cp
    shf_s = chscp * denvvs2 * (tsea - t1_sea)
    evap_s = pc.CHS * denvvs2 * (qsat_from_t(tsea, psa) - q1_sea)

    slru_s = esbc * tsea**4
    hflux_s = ssrd * (1.0 - alb_s) + slrd - (slru_s + shf_s + alhc * evap_s)

    # 5. land/sea weighted averages
    w = fmask
    ustr_w = ustr_s + w * (ustr_l - ustr_s)
    vstr_w = vstr_s + w * (vstr_l - vstr_s)
    shf_w = shf_s + w * (shf_l - shf_s)
    evap_w = evap_s + w * (evap_l - evap_s)
    slru_w = slru_s + w * (slru_l - slru_s)
    tsfc = tsea + w * (tland - tsea)
    tskin_w = tsea + w * (tskin - tsea)
    t0_w = t1_sea + w * (t1_land - t1_sea)
    q0_w = q1_sea + w * (q1_land - q1_sea)

    return SurfaceFluxes(
        ustr=(ustr_l, ustr_s, ustr_w), vstr=(vstr_l, vstr_s, vstr_w),
        shf=(shf_l, shf_s, shf_w), evap=(evap_l, evap_s, evap_w),
        slru=(slru_l, slru_s, slru_w), hfluxn=(hflux_l, hflux_s),
        tsfc=tsfc, tskin=tskin_w, u0=u0, v0=v0, t0=t0_w, q0=q0_w)
