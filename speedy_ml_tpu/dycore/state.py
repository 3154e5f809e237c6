"""Prognostic spectral state as an immutable pytree.

Replaces the reference's global mutable spectral arrays
(/root/reference/src/mod_dynvar.f90) with a functional state threaded
through the jitted step.  Leapfrog time levels are a leading axis of
size 2 (index 0 = old, 1 = new), matching vor(:,:,:,1:2).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralState:
    """Spectral prognostic variables (complex), two leapfrog time levels.

    Shapes (T = time level = 2, K = nlev, M = mx, N = nx, R = ntracers):
      vor: (T, K, M, N)   relative vorticity
      div: (T, K, M, N)   divergence
      t:   (T, K, M, N)   absolute temperature [K]
      ps:  (T, M, N)      log(p_s / p0)
      tr:  (T, R, K, M, N) tracers (tracer 0 = specific humidity, g/kg)
    """

    vor: jnp.ndarray
    div: jnp.ndarray
    t: jnp.ndarray
    ps: jnp.ndarray
    tr: jnp.ndarray

    @staticmethod
    def zeros(geom, cdtype=jnp.complex64) -> "SpectralState":
        K, M, N, R = geom.nlev, geom.mx, geom.nx, geom.ntracers
        z = lambda *s: jnp.zeros(s, dtype=cdtype)
        return SpectralState(vor=z(2, K, M, N), div=z(2, K, M, N),
                             t=z(2, K, M, N), ps=z(2, M, N),
                             tr=z(2, R, K, M, N))

    def at_level(self, j: int) -> tuple:
        """(vor, div, t, ps, tr) at leapfrog level j (0 or 1)."""
        return (self.vor[j], self.div[j], self.t[j], self.ps[j], self.tr[j])
