"""Simplified mass-flux convection scheme (reference: phy_convmf.f90).

The reference's per-column searches and running-flux loops become masked
level-unrolled array ops: the level count is small and static (K=8), so
each Fortran `do k` is a short Python loop over fully vectorized
(lat, lon) planes — XLA fuses the whole scheme into one kernel.

Level index 0 = model top (as in the reference). "No convection" is
encoded as itop == nlev.
"""

from __future__ import annotations

import jax.numpy as jnp

from speedy_ml_tpu.physics import constants as pc


def convmf(psa, se, qa, qsat, *, sig, dsig, wvi2, p0, grav, alhc):
    """Convective fluxes of dry static energy and moisture.

    Args:
      psa:  (...,) normalized surface pressure p/p0
      se:   (K, ...) dry static energy  cp*T + phi
      qa:   (K, ...) specific humidity [g/kg]
      qsat: (K, ...) saturation specific humidity [g/kg]
      sig, dsig: (K,) full-level sigma, layer thickness
      wvi2: (K,) half-level interpolation weights (wvi(:,2) of inphys)

    Returns: (itop, cbmf, precnv, dfse, dfqa); dfse/dfqa are net energy /
    moisture fluxes per layer (to be converted to tendencies by the driver).
    """
    K = se.shape[0]
    nl1 = K - 1      # 0-based index of the lowest layer
    fqmax = 5.0
    fm0 = p0 * dsig[nl1] / (grav * pc.TRCNV * 3600.0)
    rdps = 2.0 / (1.0 - pc.PSMIN)

    # saturation moist static energy
    mss = se + alhc * qsat

    # entrainment profile, normalized to ENTMAX (phy_convmf.f90:80-88)
    entr_raw = jnp.maximum(0.0, sig - 0.5) ** 2
    entr_raw = entr_raw.at[0].set(0.0).at[nl1].set(0.0)
    entr = entr_raw * (pc.ENTMAX / jnp.sum(entr_raw[1:nl1]))

    # ---- 1. trigger conditions (phy_convmf.f90:93-140) ----
    mse0 = se[nl1] + alhc * qa[nl1]
    mse1 = jnp.minimum(mse0, se[nl1 - 1] + alhc * qa[nl1 - 1])
    mss0 = jnp.maximum(mse0, mss[nl1])

    big = jnp.asarray(K - 1, dtype=jnp.int32)
    ktop1 = jnp.full(psa.shape, K - 1, dtype=jnp.int32)
    ktop2 = jnp.full(psa.shape, K - 1, dtype=jnp.int32)
    msthr = jnp.zeros_like(mse0)
    # 1-based k = nlev-3 .. 3  ->  0-based K-4 .. 2, descending
    for k in range(K - 4, 1, -1):
        mss2 = mss[k] + wvi2[k] * (mss[k + 1] - mss[k])
        c1 = mss0 > mss2
        c2 = mse1 > mss2
        ktop1 = jnp.where(c1, k, ktop1)
        msthr = jnp.where(c2, mss2, msthr)
        ktop2 = jnp.where(c2, k, ktop2)

    qthr0 = pc.RHBL * qsat[nl1]
    qthr1 = pc.RHBL * qsat[nl1 - 1]
    lqthr = (qa[nl1] > qthr0) & (qa[nl1 - 1] > qthr1)

    base_ok = (psa > pc.PSMIN) & (ktop1 < K - 1)
    deep = base_ok & (ktop2 < K - 1)
    shallow = base_ok & (~(ktop2 < K - 1)) & lqthr
    conv = deep | shallow
    itop = jnp.where(conv, ktop1, K).astype(jnp.int32)
    qdif = jnp.where(deep,
                     jnp.maximum(qa[nl1] - qthr0, (mse0 - msthr) / alhc),
                     qa[nl1] - qthr0)

    # ---- 2. cloud-base layer (phy_convmf.f90:146-174) ----
    qmax = jnp.maximum(1.01 * qa[nl1], qsat[nl1])
    sb = se[nl1 - 1] + wvi2[nl1 - 1] * (se[nl1] - se[nl1 - 1])
    qb = jnp.minimum(qa[nl1 - 1] + wvi2[nl1 - 1] * (qa[nl1] - qa[nl1 - 1]),
                     qa[nl1])
    fpsa = psa * jnp.minimum(1.0, (psa - pc.PSMIN) * rdps)
    fmass = jnp.where(conv,
                      fm0 * fpsa * jnp.minimum(fqmax, qdif / (qmax - qb)),
                      0.0)
    cbmf = fmass

    fus = fmass * se[nl1]
    fuq = fmass * qmax
    fds = fmass * sb
    fdq = fmass * qb

    dfse = [jnp.zeros_like(mse0) for _ in range(K)]
    dfqa = [jnp.zeros_like(mse0) for _ in range(K)]
    dfse[nl1] = fds - fus
    dfqa[nl1] = fdq - fuq

    # ---- 3. intermediate layers with entrainment (phy_convmf.f90:177-209) ----
    for k in range(K - 2, 1, -1):
        active = (k > itop) & conv
        lower_se = fus - fds
        lower_qa = fuq - fdq

        enmass = entr[k] * psa * cbmf
        fmass_n = fmass + enmass
        fus_n = fus + enmass * se[k]
        fuq_n = fuq + enmass * qa[k]
        sb_k = se[k - 1] + wvi2[k - 1] * (se[k] - se[k - 1])
        qb_k = qa[k - 1] + wvi2[k - 1] * (qa[k] - qa[k - 1])
        fds_n = fmass_n * sb_k
        fdq_n = fmass_n * qb_k

        delq = pc.RHIL * qsat[k] - qa[k]
        fsq = jnp.where(active & (delq > 0.0), pc.SMF * cbmf * delq, 0.0)

        dfse[k] = jnp.where(active, lower_se + fds_n - fus_n, dfse[k])
        dfqa[k] = jnp.where(active, lower_qa + fdq_n - fuq_n + fsq, dfqa[k])
        dfqa[nl1] = dfqa[nl1] - fsq

        fmass = jnp.where(active, fmass_n, fmass)
        fus = jnp.where(active, fus_n, fus)
        fuq = jnp.where(active, fuq_n, fuq)
        fds = jnp.where(active, fds_n, fds)
        fdq = jnp.where(active, fdq_n, fdq)

    # ---- 4. top layer: condensation and detrainment (phy_convmf.f90:211-222) ----
    itop_c = jnp.clip(itop, 0, K - 2)
    qsat_top = jnp.take_along_axis(qsat, itop_c[None], axis=0)[0]
    qsat_top1 = jnp.take_along_axis(qsat, (itop_c + 1)[None], axis=0)[0]
    wvi_top = wvi2[itop_c]
    qsatb = qsat_top + wvi_top * (qsat_top1 - qsat_top)
    precnv = jnp.where(conv, jnp.maximum(fuq - fmass * qsatb, 0.0), 0.0)

    top_se = fus - fds + alhc * precnv
    top_qa = fuq - fdq - precnv
    for k in range(2, K - 1):
        at_top = (itop == k)
        dfse[k] = jnp.where(at_top, top_se, dfse[k])
        dfqa[k] = jnp.where(at_top, top_qa, dfqa[k])

    return itop, cbmf, precnv, jnp.stack(dfse), jnp.stack(dfqa)
