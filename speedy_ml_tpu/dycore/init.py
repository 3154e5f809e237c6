"""Initial conditions and integration drivers.

Rest-start reference atmosphere follows ini_invars.f90:36-112; the
hybrid/grid starts live in speedy_ml_tpu.hybrid (they inject grid states
through the same pathway as the reference's iogrid(30)).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from speedy_ml_tpu.core.constants import GAMMA_LAPSE, HSCALE, HSHUM, REFRH1
from speedy_ml_tpu.dycore.model import DycoreModel, PhysicsFn
from speedy_ml_tpu.dycore.state import SpectralState


def rest_state(model: DycoreModel, orog_geopotential: Optional[jnp.ndarray] = None
               ) -> tuple[SpectralState, jnp.ndarray]:
    """Reference atmosphere at rest (ini_invars.f90:36-112).

    orog_geopotential: surface geopotential g*z on the grid (lat, lon),
    or None for a flat planet.  Returns (state, phis_spectral).
    """
    g, c, sht = model.geom, model.const, model.sht
    gam1 = GAMMA_LAPSE / (1000.0 * c.grav)

    if orog_geopotential is None:
        orog_geopotential = jnp.zeros((g.nlat, g.nlon), dtype=model.dtype)

    phis = sht.grid_to_spec(orog_geopotential)
    if g.nlon == 4 * g.nlat_half:
        phis = sht.trunct(phis)
    phis0 = sht.spec_to_grid(phis)

    # Python float (weakly typed): an np.float64 scalar here makes the
    # .at[].set/add scatters below an f64->f32 cast (FutureWarning, and
    # an error in future JAX releases)
    ccon = float(np.sqrt(2.0))
    tref_sfc, ttop = 288.0, 216.0
    gam2 = gam1 / tref_sfc
    rgam = c.rgas * gam1
    qexp = HSCALE / HSHUM

    state = SpectralState.zeros(g, cdtype=model.cdtype)

    # temperature: stratosphere isothermal, troposphere constant lapse rate
    surfs = -gam1 * phis
    surfs = surfs.at[0, 0].add(ccon * tref_sfc)
    t = state.t
    for k in (0, 1):
        t = t.at[:, k, 0, 0].set(ccon * ttop)
    for k in range(2, g.nlev):
        factk = float(np.asarray(g.full_sigma)[k] ** rgam)
        t = t.at[:, k].set(surfs[None] * factk)

    # log(ps) consistent with the temperature profile; p_ref = 1013 hPa
    rlog0 = np.log(1.013)
    surfg = rlog0 + (1.0 / rgam) * jnp.log(1.0 - gam2 * phis0)
    ps1 = sht.grid_to_spec(surfg)
    if g.nlon == 4 * g.nlat_half:
        ps1 = sht.trunct(ps1)
    ps = jnp.stack([ps1, ps1], axis=0)

    # tropospheric specific humidity (g/kg)
    esref = 17.0
    qref = REFRH1 * 0.622 * esref
    qsurf_grid = qref * jnp.exp(qexp * surfg)
    qsurf = sht.grid_to_spec(qsurf_grid)
    if g.nlon == 4 * g.nlat_half:
        qsurf = sht.trunct(qsurf)
    tr = state.tr
    for k in range(2, g.nlev):
        factk = float(np.asarray(g.full_sigma)[k] ** qexp)
        tr = tr.at[:, 0, k].set(qsurf[None] * factk)

    return SpectralState(vor=state.vor, div=state.div, t=t, ps=ps, tr=tr), phis


def run_steps(model: DycoreModel, state: SpectralState, phis: jnp.ndarray,
              nsteps: int, physics_fn: Optional[PhysicsFn] = None,
              physics_args: tuple = ()) -> SpectralState:
    """Integrate `nsteps` filtered leapfrog steps under one lax.scan/jit."""

    def body(s, _):
        return model.leapfrog_step(s, phis, physics_fn, physics_args)[0], None

    step_fn = jax.jit(lambda s: jax.lax.scan(body, s, None, length=nsteps)[0])
    return step_fn(state)
