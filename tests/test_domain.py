"""Region tiling tests against a pure-python oracle of the reference
index math (res_domain.f90: domaindecomposition, getworkerlower_leftcorner,
getxyresextent, getoverlapindices)."""

import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry
from speedy_ml_tpu.esn.domain import RegionLayout, build_layout

GEOM = Geometry()
XGRID, YGRID = 96, 48


def oracle_decomposition(numregions):
    """domaindecomposition (res_domain.f90:258-280), 1-based oracle."""
    n = (XGRID * YGRID) // numregions
    for i in range(int(np.floor(np.sqrt(n))), 0, -1):
        if YGRID % i == 0:
            factory = i
            if n % factory == 0:
                factorx = n // factory
                if XGRID % factorx == 0:
                    return factorx, factory
    raise ValueError


def oracle_extent(numregions, region):
    """getxyresextent, 1-based indices (res_domain.f90:123-141)."""
    fx, fy = oracle_decomposition(numregions)
    col = region % (YGRID // fy)
    row = region // (YGRID // fy)
    return (row * fx + 1, (row + 1) * fx, col * fy + 1, (col + 1) * fy, fx, fy)


def oracle_overlap(numregions, region, overlap):
    """getoverlapindices (res_domain.f90:155-204), 1-based."""
    xs, xe, ys, ye, fx, fy = oracle_extent(numregions, region)
    ixc = fx + 2 * overlap
    iyc = fy + 2 * overlap
    periodic = False
    pole = False
    if xs - overlap < 1:
        in_xs = XGRID - overlap + 1
        periodic = True
    else:
        in_xs = xs - overlap
    if xe + overlap > XGRID:
        in_xe = overlap
        periodic = True
    else:
        in_xe = overlap + xe
    if ys - overlap < 1:
        in_ys = 1
        iyc = fy + overlap + (ys - 1)
        pole = True
    else:
        in_ys = ys - overlap
    if ye + overlap > YGRID:
        in_ye = YGRID
        iyc = fy + overlap + (YGRID - ye)
        pole = True
    else:
        in_ye = overlap + ye
    return in_xs, in_xe, in_ys, in_ye, ixc, iyc, pole, periodic


@pytest.fixture(scope="module")
def layout():
    return RegionLayout(GEOM, n_regions=1152, overlap=1)


def test_decomposition_1152(layout):
    fx, fy = oracle_decomposition(1152)
    assert (layout.xc, layout.yc) == (fx, fy) == (2, 2)
    assert layout.nx_blocks * layout.ny_blocks == 1152


def test_core_extents_match_oracle(layout):
    for region in [0, 1, 23, 24, 145, 575, 1128, 1151]:
        xs, xe, ys, ye, fx, fy = oracle_extent(1152, region)
        assert layout.x0[region] == xs - 1
        assert layout.y0[region] == ys - 1


def test_unit_test_fixture_288():
    """The reference's own unit test: region 145 of 288 ranks
    (tests/mod_unit_test.f90:63-96 uses 288 regions)."""
    xs, xe, ys, ye, fx, fy = oracle_extent(288, 145)
    lay = RegionLayout(GEOM, n_regions=288, overlap=1)
    assert lay.x0[145] == xs - 1 and lay.y0[145] == ys - 1
    assert (lay.xc, lay.yc) == (fx, fy)


def test_halo_windows_match_oracle(layout):
    for cls in layout.classes:
        for j, region in enumerate(cls.region_ids[:5]):
            in_xs, in_xe, in_ys, in_ye, ixc, iyc, pole, periodic = \
                oracle_overlap(1152, int(region), 1)
            assert cls.ix_in.shape[1] == ixc
            assert cls.iy_in.shape[1] == iyc
            # first window indices (x may wrap)
            assert cls.ix_in[j, 0] == in_xs - 1
            assert cls.iy_in[j, 0] == in_ys - 1
            assert cls.iy_in[j, -1] == in_ye - 1


def test_classes_partition(layout):
    all_ids = np.concatenate([c.region_ids for c in layout.classes])
    assert sorted(all_ids) == list(range(1152))
    # T30: south pole row, north pole row, interior
    sizes = sorted(c.count for c in layout.classes)
    assert sizes == [48, 48, 1056]


def test_scatter_gather_core_roundtrip(layout):
    """Scattering all core patches reassembles the full field exactly."""
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.standard_normal((GEOM.nlat, GEOM.nlon)))
    out = jnp.zeros_like(field)
    for cls in layout.classes:
        patches = layout.gather_patches(field, cls.iy_core, cls.ix_core)
        out = layout.scatter_core(cls, patches, out)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(field))


def test_class_patches_matches_gather(layout):
    """The roll-based class_patches equals the index-gather oracle, for
    window and core patches, 2-D and 4-D fields, every class."""
    rng = np.random.default_rng(7)
    f2 = jnp.asarray(rng.standard_normal((GEOM.nlat, GEOM.nlon)))
    f4 = jnp.asarray(rng.standard_normal((4, 8, GEOM.nlat, GEOM.nlon)))
    for cls in layout.classes:
        for core in (False, True):
            iy = cls.iy_core if core else cls.iy_in
            ix = cls.ix_core if core else cls.ix_in
            for f in (f2, f4):
                want = np.asarray(layout.gather_patches(f, iy, ix))
                got = np.asarray(layout.class_patches(cls, f, core))
                np.testing.assert_array_equal(got, want)


def test_pack_unpack_roundtrip(layout):
    rng = np.random.default_rng(1)
    V, K = 4, 8
    atmo = jnp.asarray(rng.standard_normal((V, K, GEOM.nlat, GEOM.nlon)))
    logp = jnp.asarray(rng.standard_normal((GEOM.nlat, GEOM.nlon)))
    precip = jnp.asarray(rng.standard_normal((GEOM.nlat, GEOM.nlon)))
    cls = [c for c in layout.classes if c.count == 1056][0]
    vec = layout.pack_vector(cls, atmo, logp=logp, precip=precip,
                             core_only=True)
    assert vec.shape == (1056, 136)
    out = layout.unpack_core_vector(cls, vec, V, K, logp=True, precip=True)
    # re-scatter and compare against originals on covered points
    a2 = jnp.zeros_like(atmo)
    a2 = layout.scatter_core(cls, out["atmo"], a2)
    covered = np.zeros((GEOM.nlat, GEOM.nlon), dtype=bool)
    covered[np.asarray(cls.iy_core)[:, :, None],
            np.asarray(cls.ix_core)[:, None, :]] = True
    np.testing.assert_allclose(np.asarray(a2)[..., covered],
                               np.asarray(atmo)[..., covered])


def test_input_to_target_consistency(layout):
    """input_to_target of a packed input vector == directly packed core."""
    rng = np.random.default_rng(2)
    V, K = 4, 8
    atmo = jnp.asarray(rng.standard_normal((V, K, GEOM.nlat, GEOM.nlon)))
    logp = jnp.asarray(rng.standard_normal((GEOM.nlat, GEOM.nlon)))
    precip = jnp.asarray(rng.standard_normal((GEOM.nlat, GEOM.nlon)))
    sst = jnp.asarray(rng.standard_normal((GEOM.nlat, GEOM.nlon)))
    tisr = jnp.asarray(rng.standard_normal((GEOM.nlat, GEOM.nlon)))
    for cls in layout.classes:
        vec_in = layout.pack_vector(cls, atmo, logp=logp, precip=precip,
                                    sst=sst, tisr=tisr)
        xi, yi = cls.input_shape
        expect_size = V * K * xi * yi + 4 * xi * yi
        assert vec_in.shape == (cls.count, expect_size)
        tgt = layout.input_to_target(cls, vec_in, V, K, K, 0,
                                     logp=True, precip=True, sst=True,
                                     tisr=True)
        direct = layout.pack_vector(cls, atmo, logp=logp, precip=precip,
                                    core_only=True)
        np.testing.assert_allclose(np.asarray(tgt), np.asarray(direct))


def test_vector_layout_sizes():
    """Production sizes: 576 inputs / 136 outputs for interior bottom regions
    (mod_reservoir.f90:153-171)."""
    lay_in = build_layout(4, 4, 4, 8, logp=True, precip=True, sst=True,
                          tisr=True)
    assert lay_in.total == 576
    lay_out = build_layout(2, 2, 4, 8, logp=True, precip=True, sst=False,
                           tisr=False)
    assert lay_out.total == 136
