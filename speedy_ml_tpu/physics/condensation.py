"""Large-scale condensation (reference: phy_lscond.f90).

Relax q toward rhref*qsat with latent heating capped to avoid
grid-point-storm instability; precipitation is the column moisture sink.
"""

from __future__ import annotations

import jax.numpy as jnp

from speedy_ml_tpu.physics import constants as pc


def lscond(psa, qa, qsat, itop, *, sig, dsig, p0, grav, cp, alhc):
    """Returns (itop_updated, precls, dtlsc, dqlsc).

    psa: (...,); qa/qsat: (K, ...); itop: (...) int from convmf.
    Precipitation in g/(m^2 s); tendencies in K/s-equivalents
    (dtlsc already per-second; the driver does not rescale them).
    """
    K = qa.shape[0]
    qsmax = 10.0
    rtlsc = 1.0 / (pc.TRLSC * 3600.0)
    tfact = alhc / cp
    prg = p0 / grav

    psa2 = psa * psa
    dtlsc = [jnp.zeros_like(psa) for _ in range(K)]
    dqlsc = [jnp.zeros_like(psa) for _ in range(K)]
    itop_new = itop

    for k in range(1, K):
        sig2 = float(sig[k]) ** 2
        rhref = pc.RHLSC + pc.DRHLSC * (sig2 - 1.0)
        if k == K - 1:
            rhref = max(rhref, pc.RHBLSC)
        dqmax = qsmax * sig2 * rtlsc

        dqa = rhref * qsat[k] - qa[k]
        cond = dqa < 0.0
        dqlsc[k] = jnp.where(cond, dqa * rtlsc, 0.0)
        dtlsc[k] = jnp.where(cond,
                             tfact * jnp.minimum(-dqa * rtlsc, dqmax * psa2),
                             0.0)
        itop_new = jnp.where(cond, jnp.minimum(itop_new, k), itop_new)

    dqlsc = jnp.stack(dqlsc)
    dtlsc = jnp.stack(dtlsc)
    precls = -prg * jnp.sum(dsig[1:, None, None] * dqlsc[1:], axis=0) * psa
    return itop_new, precls, dtlsc, dqlsc
