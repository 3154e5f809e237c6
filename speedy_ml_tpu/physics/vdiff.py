"""Vertical diffusion and shallow convection (reference: phy_vdifsc.f90).

Three processes: PBL shallow convection (moist-static-energy flux between
the two lowest layers), moisture diffusion above the PBL where RH gradient
is steep, and damping of super-adiabatic lapse rates.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from speedy_ml_tpu.physics import constants as pc


def vdifsc(ua, va, se, rh, qa, qsat, phi, icnv, *, sig, sigh, dsig, cp, alhc):
    """Returns (utend, vtend, ttend, qtend), all (K, lat, lon).

    sigh: (K+1,) half-level sigma with sigh[0] = top.  icnv: (lat, lon)
    deep-convection depth indicator (nlev - itop of convmf, 1-based sense).
    """
    K = se.shape[0]
    nl1 = K - 2
    cshc = dsig[K - 1] / 3600.0
    # sigh is the (K+1,) half-sigma array; Fortran's sigh(k) = sigh[k] here
    cvdi = (sigh[K - 1] - sigh[1]) / ((K - 2) * 3600.0)

    fshcq = cshc / pc.TRSHC
    fshcse = cshc / (pc.TRSHC * cp)
    fvdiq = cvdi / pc.TRVDI
    fvdise = cvdi / (pc.TRVDS * cp)

    rsig = 1.0 / dsig
    # rsig1 at 0-based full level k = 1/(1 - half-sigma below layer k);
    # the k = K-1 entry is unused (loop below stops at K-2) - avoid the 1/0
    denom = 1.0 - sigh[1:]
    rsig1 = 1.0 / jnp.where(denom > 0, denom, 1.0) if hasattr(sigh, "at") \
        else 1.0 / np.where(denom > 0, denom, 1.0)

    utend = [jnp.zeros_like(se[0]) for _ in range(K)]
    vtend = [jnp.zeros_like(se[0]) for _ in range(K)]
    ttend = [jnp.zeros_like(se[0]) for _ in range(K)]
    qtend = [jnp.zeros_like(se[0]) for _ in range(K)]

    # 2. shallow convection between the two lowest layers
    drh0 = pc.RHGRAD * (sig[K - 1] - sig[nl1])
    fvdiq2 = fvdiq * sigh[K - 1]  # Fortran sigh(nl1): half level below layer nl1
    dmse = (se[K - 1] - se[nl1]) + alhc * (qa[K - 1] - qsat[nl1])
    drh = rh[K - 1] - rh[nl1]
    fcnv = jnp.where(icnv > 0, pc.REDSHC, 1.0)

    shallow = dmse >= 0.0
    fluxse = jnp.where(shallow, fcnv * fshcse * dmse, 0.0)
    ttend[nl1] = ttend[nl1] + fluxse * rsig[nl1]
    ttend[K - 1] = ttend[K - 1] - fluxse * rsig[K - 1]

    fluxq_sc = jnp.where(shallow & (drh >= 0.0),
                         fcnv * fshcq * qsat[K - 1] * drh, 0.0)
    fluxq_vd = jnp.where((~shallow) & (drh >= drh0),
                         fvdiq2 * qsat[nl1] * drh, 0.0)
    fluxq = fluxq_sc + fluxq_vd
    qtend[nl1] = qtend[nl1] + fluxq * rsig[nl1]
    qtend[K - 1] = qtend[K - 1] - fluxq * rsig[K - 1]

    # 3. moisture diffusion above the PBL (1-based k = 3..nlev-2)
    for k in range(2, K - 2):
        if sigh[k + 1] > 0.5:   # sigh(k) 1-based
            drh0k = pc.RHGRAD * (sig[k + 1] - sig[k])
            fvdiq2k = fvdiq * sigh[k + 1]
            drhk = rh[k + 1] - rh[k]
            fq = jnp.where(drhk >= drh0k, fvdiq2k * qsat[k] * drhk, 0.0)
            qtend[k] = qtend[k] + fq * rsig[k]
            qtend[k + 1] = qtend[k + 1] - fq * rsig[k + 1]

    # 4. damping of super-adiabatic lapse rate
    for k in range(K - 1):
        se0 = se[k + 1] + pc.SEGRAD * (phi[k] - phi[k + 1])
        unstable = se[k] < se0
        fluxse = jnp.where(unstable, fvdise * (se0 - se[k]), 0.0)
        ttend[k] = ttend[k] + fluxse * rsig[k]
        for k1 in range(k + 1, K):
            ttend[k1] = ttend[k1] - fluxse * rsig1[k]

    return (jnp.stack(utend), jnp.stack(vtend),
            jnp.stack(ttend), jnp.stack(qtend))
