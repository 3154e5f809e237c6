"""Humidity utilities (reference: phy_shtorh.f90).

All functions are elementwise over arbitrary leading shapes; pressures are
normalized (p/p0 with p0=10^5 Pa), humidities in g/kg.
"""

from __future__ import annotations

import jax.numpy as jnp


def qsat_from_t(ta: jnp.ndarray, p_norm: jnp.ndarray) -> jnp.ndarray:
    """Saturation specific humidity [g/kg] at temperature ta and pressure p_norm.

    Two-branch saturation vapor pressure over water/ice
    (phy_shtorh.f90:28-53). p_norm is the full normalized pressure at the
    point (sig*ps for a model level, or ps for the surface).
    """
    e0, c1, c2 = 6.108e-3, 17.269, 21.875
    t0, t1, t2 = 273.16, 35.86, 7.66
    es = jnp.where(ta >= t0,
                   e0 * jnp.exp(c1 * (ta - t0) / (ta - t1)),
                   e0 * jnp.exp(c2 * (ta - t0) / (ta - t2)))
    return 622.0 * es / (p_norm - 0.378 * es)


def spec_hum_to_rh(ta, ps, sig, qa):
    """(T, ps, sigma, q) -> (rh, qsat); sig<=0 means p_norm=ps directly."""
    p_norm = ps * sig if sig > 0 else ps
    qsat = qsat_from_t(ta, p_norm)
    return qa / qsat, qsat


def rh_to_spec_hum(ta, ps, sig, rh):
    """(T, ps, sigma, rh) -> (q, qsat)."""
    p_norm = ps * sig if sig > 0 else ps
    qsat = qsat_from_t(ta, p_norm)
    return rh * qsat, qsat
