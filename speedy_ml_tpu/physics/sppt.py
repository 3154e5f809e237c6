"""Stochastically Perturbed Parametrization Tendencies (SPPT).

Reference: mod_sppt.f90 (ECMWF Tech. Memo. #598): a spectral AR(1)
pattern with 6-h decorrelation time and 500-km correlation length,
sigma=0.33 in grid space, applied as multiplicative noise on the physics
tendencies (phy_phypar.f90:218-228).  Off by default (sppt_on=.false.,
mod_tsteps.f90:68), provided for parity and for ensemble work.

Functional: state = spectral pattern, advanced by explicit jax.random
keys (no hidden RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TIME_DECORR = 6.0        # hours
LEN_DECORR = 500000.0    # metres
STDDEV = 0.33
MU_DEFAULT = 1.0         # vertical taper (all ones in the reference)


class SPPT:
    def __init__(self, sht, nlev: int, nsteps_day: int = 96):
        self.sht = sht
        self.nlev = nlev
        geom = sht.geom
        self.phi = float(np.exp(-(24.0 / nsteps_day) / TIME_DECORR))

        a = sht.radius
        n = np.arange(1, geom.trunc + 1)
        f0 = np.sum((2 * n + 1) * np.exp(-0.5 * (LEN_DECORR / a) ** 2
                                         * n * (n + 1)))
        f0 = np.sqrt((STDDEV**2 * (1 - self.phi**2)) / (2 * f0))
        self.sigma = np.asarray(
            f0 * np.exp(-0.25 * LEN_DECORR**2 * np.asarray(sht.el2)),
            dtype=sht.dtype)
        self.mu = np.full(nlev, MU_DEFAULT, dtype=sht.dtype)

    def _noise(self, key):
        g = sht_shape = (self.nlev, self.sht.geom.mx, self.sht.geom.nx)
        kr, ki = jax.random.split(key)
        re = jnp.clip(jax.random.normal(kr, sht_shape), -10.0, 10.0)
        im = jnp.clip(jax.random.normal(ki, sht_shape), -10.0, 10.0)
        return (re + 1j * im).astype(self.sht.cdtype)

    def init_state(self, key) -> jnp.ndarray:
        """First AR(1) draw (stationary distribution)."""
        eta = self._noise(key)
        return (1 - self.phi**2) ** (-0.5) * self.sigma * eta

    def step(self, state: jnp.ndarray, key) -> jnp.ndarray:
        """Advance the AR(1) spectral pattern one model step."""
        return self.phi * state + self.sigma * self._noise(key)

    def grid_pattern(self, state: jnp.ndarray) -> jnp.ndarray:
        """Grid-space pattern (K, lat, lon), clipped to +-1."""
        g = self.sht.spec_to_grid(state)
        return jnp.clip(g, -1.0, 1.0)

    def perturb(self, state, tend_phys: tuple, tend_dyn: tuple) -> tuple:
        """Multiplicative perturbation of the physics part of tendencies:
        out = (1 + r*mu) * (phys - dyn) + dyn (phy_phypar.f90:222-227)."""
        r = self.grid_pattern(state) * self.mu[:, None, None]
        out = []
        for tp, td in zip(tend_phys, tend_dyn):
            out.append((1.0 + r) * (tp - td) + td)
        return tuple(out)
