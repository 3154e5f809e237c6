"""Random diabatic forcing (RDF).

Reference: ini_inirdf.f90 (horizontal pattern) + the xs_rdf/setrdf pair in
phy_phypar.f90:202-313 and the storage module mod_randfor.f90.  Off by
default in the reference (nstrdf=0, mod_tsteps.f90:72); enable with
``PhysicsModel(..., randfh=init_randfh(...))`` and the ``lrandf`` step flag.

Design: the horizontal patterns ``randfh`` are built once at model init on
the host (numpy, explicit PRNG) exactly like inirdf — normally distributed
values on a 19-row reduced lat-lon grid, bilinearly interpolated to the
Gaussian grid, then spectrally truncated at T18.  The vertical/zonal
modulation ``randfv`` is a small (2, nlat, nlev) state updated from the
current diabatic heating on radiation steps (xs_rdf) and combined with
randfh into the 3-D forcing every step (setrdf).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# number of longitudes per row of the reduced random grid
# (ini_inirdf.f90:22-23)
NLONRG = np.array([1, 6, 12, 18, 24, 28, 32, 34, 36, 36,
                   36, 34, 32, 28, 24, 18, 12, 6, 1])


def init_randfh(seed: int, geom, sht, ampl: float = 0.5,
                ntrfor: int = 18, freq0: float = 0.0) -> np.ndarray:
    """Build the two horizontal random-forcing patterns (inirdf).

    Returns (2, nlat, nlon) float32.  ``ampl`` is the RMS amplitude of the
    perturbation (negative seed flips the sign, as `indrdf < 0` does in the
    reference); ``ntrfor`` the spectral truncation of the forcing.
    """
    nlat, nlon = geom.nlat, geom.nlon
    rng = np.random.Generator(np.random.Philox(key=[abs(int(seed)), 0x4DF]))
    if seed < 0:
        ampl = -ampl

    # colatitude coordinate of each Gaussian latitude on the 0..18 reduced
    # rows: colat = 9/asin(1) * asin(sin lat) + 9  (ini_inirdf.f90:46-49)
    rdeg = 9.0 / np.arcsin(1.0)
    colat = rdeg * np.arcsin(geom.sin_lat) + 9.0

    rnlon = NLONRG / float(nlon)
    randfh = np.zeros((2, nlat, nlon), dtype=np.float64)
    for nf in range(2):
        # reduced grid with a periodic guard column at index 0
        # (redgrd(0,jlat) = redgrd(nlonrg,jlat), ini_inirdf.f90:64)
        redgrd = np.zeros((19, NLONRG.max() + 2))
        for jlat in range(19):
            vals = rng.normal(0.0, abs(ampl), NLONRG[jlat]) * np.sign(ampl)
            if freq0 > 0.0:
                vals[rng.uniform(size=NLONRG[jlat]) < freq0] = 0.0
            redgrd[jlat, 1:NLONRG[jlat] + 1] = vals
            redgrd[jlat, 0] = vals[-1]
            # guard beyond the row end for the interpolation's jlon+1 access
            redgrd[jlat, NLONRG[jlat] + 1] = vals[0]

        # bilinear interpolation to the Gaussian grid (ini_inirdf.f90:66-85)
        field = np.zeros((nlat, nlon))
        for j in range(nlat):
            jlat1 = int(colat[j])
            jlat2 = min(jlat1 + 1, 18)
            i = np.arange(nlon)
            out = np.zeros((2, nlon))
            for s, jl in enumerate((jlat1, jlat2)):
                rlon = i * rnlon[jl]
                jlon = rlon.astype(int)
                frac = rlon - jlon
                row = redgrd[jl]
                out[s] = row[jlon] + frac * (row[jlon + 1] - row[jlon])
            field[j] = out[0] + (colat[j] - jlat1) * (out[1] - out[0])

        # spectral truncation at ntrfor (truncg equivalent)
        spec = np.asarray(sht.grid_to_spec(jnp.asarray(field, dtype=sht.dtype)))
        mask = (sht.ll <= ntrfor)
        randfh[nf] = np.asarray(sht.spec_to_grid(jnp.asarray(spec * mask)))
    return randfh.astype(np.float32)


def xs_rdf(tt1: jnp.ndarray, tt2: jnp.ndarray, sig: np.ndarray,
           ivm: int) -> jnp.ndarray:
    """Zonal-mean cross-section of diabatic forcing (phy_phypar.f90:231-295).

    tt1/tt2: (K, nlat, nlon) heating tendencies.  Returns (nlat, K).
    ivm selects the vertical weighting: mode 0 uniform, mode 1 sin(2*pi*sig).
    """
    nlon = tt1.shape[-1]
    rnsig = 1.0 / nlon
    w = jnp.asarray(np.ones_like(sig) if ivm == 0 else np.sin(2.0 * np.pi * sig),
                    dtype=tt1.dtype) * rnsig
    v = (tt1 + tt2).sum(axis=-1) * w[:, None]          # (K, nlat)
    v = v.T                                            # (nlat, K)
    # two passes of 1/2-1/4-1/4 latitude smoothing with mirrored ends
    # (rand1(0)=rand1(2), rand1(nlat+1)=rand1(nlat-1))
    for _ in range(2):
        up = jnp.concatenate([v[1:2], v[:-1]], axis=0)
        dn = jnp.concatenate([v[1:], v[-2:-1]], axis=0)
        v = 0.5 * v + 0.25 * (up + dn)
    return v


def setrdf(randfh: jnp.ndarray, randfv: jnp.ndarray) -> jnp.ndarray:
    """3-D random diabatic forcing pattern (phy_phypar.f90:289-313).

    randfh (2, nlat, nlon), randfv (2, nlat, K) -> (K, nlat, nlon).
    """
    return jnp.einsum("fjl,fjk->kjl", randfh, randfv)
