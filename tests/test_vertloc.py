"""Vertical localization (VERDICT r1 #8): multi-level region classes
with sigma halos (getoverlapindices_vert / get_z_res_extent,
res_domain.f90:143-256), oracle-tested like the horizontal tiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry
from speedy_ml_tpu.esn.domain import RegionLayout, vert_specs
from speedy_ml_tpu.esn.reservoir import ESNHyper
from speedy_ml_tpu.esn.standardize import core_component_map


def fortran_vert_oracle(nz, num_vert_levels, vert_level, vert_overlap):
    """Literal transcription of get_z_res_extent +
    getoverlapindices_vert (res_domain.f90:143-256), 1-based."""
    zchunk = nz // num_vert_levels
    zstart = (vert_level - 1) * zchunk + 1
    zend = vert_level * zchunk
    top = zstart == 1
    bottom = zend == nz
    if zstart - vert_overlap >= 1 and zend + vert_overlap <= nz:
        i0, i1 = zstart - vert_overlap, zend + vert_overlap
    elif zstart - vert_overlap < 1:
        i0, i1 = 1, zend + vert_overlap
    else:
        i0, i1 = zstart - vert_overlap, nz
    return zstart, zend, i0, i1, top, bottom


@pytest.mark.parametrize("num,overlap", [(2, 0), (2, 1), (4, 1), (4, 2),
                                         (8, 1)])
def test_vert_specs_match_fortran(num, overlap):
    nz = 8
    specs = vert_specs(nz, num, overlap)
    assert len(specs) == num
    for g, s in enumerate(specs):
        zs, ze, i0, i1, top, bottom = fortran_vert_oracle(
            nz, num, g + 1, overlap)
        assert s.z0 == zs - 1 and s.z1 == ze
        assert s.zi0 == i0 - 1 and s.zi1 == i1
        assert s.top == top and s.bottom == bottom
        assert s.nz_in == i1 - i0 + 1
        assert s.z_off == (zs - 1) - (i0 - 1)


def test_core_component_map_with_offset():
    # nz_in=4, nz_core=2, z_off=1: core (v, z) -> input comp v*4 + z + 1
    m = core_component_map(2, 2, 4, 4, 2, 1, logp=True, precip=True)
    # atmo block flattens (z, y, x, v): first element is (v=0, z=0)
    atmo = m[:4 * 2 * 2 * 2].reshape(2, 2, 2, 4)
    for v in range(4):
        for z in range(2):
            assert np.all(atmo[z, :, :, v] == v * 4 + z + 1)
    # blocks follow at nvar*nz_in
    assert np.all(m[32:36] == 16)     # logp
    assert np.all(m[36:40] == 17)     # precip


@pytest.mark.slow
def test_vertloc_hybrid_mechanics():
    """ml_only hybrid with 2 vertical groups (overlap 1): training and the
    coupled cycle run; every sigma band of the assembled state is written
    by its owning group."""
    from speedy_ml_tpu.core import PhysicalConstants
    from speedy_ml_tpu.core.spectral import SpectralTransform
    from speedy_ml_tpu.gcm import GCM
    from speedy_ml_tpu.hybrid.training import train_hybrid
    from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data

    geom = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)
    sht = SpectralTransform(geom, dtype=jnp.float64)
    bd = synthetic_boundary_data(geom, sht)
    gcm = GCM(geom, PhysicalConstants(), dtype=jnp.float64, bd=bd)
    layout = RegionLayout(geom, n_regions=32, overlap=1)

    T = 30
    rng = np.random.Generator(np.random.Philox(3))
    truth = dict(
        atmo=jnp.asarray(np.stack([
            rng.uniform(220, 290, (T, 8, 16, 32)),
            rng.uniform(-30, 30, (T, 8, 16, 32)),
            rng.uniform(-20, 20, (T, 8, 16, 32)),
            rng.uniform(0, 12, (T, 8, 16, 32))], axis=1)),
        logp=jnp.asarray(rng.uniform(-0.1, 0.1, (T, 16, 32))),
        precip=jnp.asarray(rng.uniform(0, 2e-4, (T, 16, 32))),
        sst=jnp.asarray(rng.uniform(271, 302, (T, 16, 32))),
        tisr=jnp.asarray(rng.uniform(0, 420, (T, 16, 32))))

    hyper = ESNHyper(m=800, deg=3, noise_mag=0.0)
    hyb = train_hybrid(gcm, layout, truth, None, hyper, jax.random.key(0),
                       num_vert_levels=2, vert_overlap=1,
                       dtype=jnp.float64)
    assert len(hyb.packs) == 2 * len(layout.classes)
    bottoms = [p for p in hyb.packs if p.bottom]
    tops = [p for p in hyb.packs if not p.bottom]
    assert len(bottoms) == len(tops) == len(layout.classes)
    # non-bottom groups: input = atmo(5 levels with halo) + tisr only
    xi, yi = tops[0].cls.input_shape
    assert tops[0].res.n_in == 4 * 5 * xi * yi + xi * yi
    # bottom outputs include logp+precip, tops don't
    xc, yc = bottoms[0].cls.core_shape
    assert bottoms[0].res.n_outputs == (4 * 4 + 2) * xc * yc
    assert tops[0].res.n_outputs == 4 * 4 * xc * yc

    sync = {k: v[:6] for k, v in truth.items()}
    hstate = hyb.start_prediction(sync, None, truth["sst"][0])
    hstate, diag = hyb.cycle(hstate, jnp.asarray(0), jnp.asarray(0.5),
                             jnp.asarray(0.25))
    atmo = np.asarray(diag["atmo"])
    assert np.isfinite(atmo).all()
    # both sigma bands written (nonzero temperature everywhere)
    assert np.abs(atmo[0, :4]).min() > 0
    assert np.abs(atmo[0, 4:]).min() > 0
