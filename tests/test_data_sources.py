"""Production data-path hardening (VERDICT r2 #3 / ADVICE mediums):

- ERASource must splice Feb 29 out of leap-year files and span year
  boundaries (the reference's in-stream handling,
  speedy_res_interface.f90:439-632, splice at :588-596);
- ModelStateReader reads precomputed SPEEDY forecast-state year files
  (read_model_states, speedy_res_interface.f90:634-720);
- training end-to-end across a synthesized leap-year boundary must equal
  training on the manually-spliced in-memory series;
- checkpoint round-trip must preserve ragged (win_cols) imports.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from speedy_ml_tpu.data.era import ERA5Reader
from speedy_ml_tpu.data.model_states import (ModelStateReader,
                                             write_model_states)
from speedy_ml_tpu.hybrid.chunked import ArraySource, ERASource

NLAT, NLON, NZ = 16, 32, 2
LEAP0 = 1992           # leap year


def write_era_year(path, year, n_hours, nlat=NLAT, nlon=NLON, nz=NZ,
                   base=0.0):
    """Synthesize one ERA year file whose every field encodes the RAW
    file hour index (value = base + hour), so alignment is checkable."""
    import h5py
    ramp = (base + np.arange(n_hours, dtype=np.float32))
    f3 = np.broadcast_to(ramp[:, None, None, None],
                         (n_hours, nz, nlat, nlon)).astype(np.float32)
    f2 = np.broadcast_to(ramp[:, None, None],
                         (n_hours, nlat, nlon)).astype(np.float32)
    with h5py.File(path, "w") as f:
        for name in ("Temperature", "U-wind", "V-wind",
                     "Specific-Humidity"):
            f.create_dataset(name, data=f3, compression="gzip",
                             compression_opts=1)
        for name in ("logp", "tp", "sst", "tisr"):
            f.create_dataset(name, data=f2, compression="gzip",
                             compression_opts=1)


@pytest.fixture(scope="module")
def era_root(tmp_path_factory):
    """Leap year (8784 h) + a short following year."""
    root = tmp_path_factory.mktemp("era")
    write_era_year(root / f"era_5_y{LEAP0}_regridded_mpi_fixed_var_gcc.nc",
                   LEAP0, 8784, base=0.0)
    write_era_year(root / f"era_5_y{LEAP0+1}_regridded_mpi_fixed_var_gcc.nc",
                   LEAP0 + 1, 96, base=100000.0)
    return root


def expected_file_hour(model_hour):
    """Model-calendar hour (365-d years from LEAP0) -> encoded value."""
    year = model_hour // 8760
    off = model_hour % 8760
    if year == 0:
        # leap year: file hours skip Feb 29 ([59*24, 60*24))
        feb29 = 59 * 24
        return off if off < feb29 else off + 24
    return 100000.0 + off


def test_erasource_leap_splice(era_root):
    src = ERASource(ERA5Reader(era_root), LEAP0, 2 * 8760)
    # samples around the Feb-29 splice
    idx = np.array([59 * 24 - 1, 59 * 24, 59 * 24 + 5])
    t = src.truth_at(idx)["atmo"][:, 0, 0, 0, 0]
    want = [expected_file_hour(h) for h in idx]
    np.testing.assert_allclose(t, want)


def test_erasource_year_boundary(era_root):
    src = ERASource(ERA5Reader(era_root), LEAP0, 2 * 8760)
    # one chunk straddling Dec 31 -> Jan 1 (model hours 8757..8764)
    idx = np.arange(8757, 8765)
    out = src.truth_at(idx)
    want = [expected_file_hour(h) for h in idx]
    np.testing.assert_allclose(out["atmo"][:, 0, 0, 0, 0], want)
    np.testing.assert_allclose(out["logp"][:, 0, 0], want)
    # q is unit-converted kg/kg -> g/kg
    np.testing.assert_allclose(out["atmo"][:, 3, 0, 0, 0],
                               np.asarray(want) * 1000.0, rtol=1e-6)


def test_erasource_sst_anomalies(era_root):
    climo = np.full((365, NLAT, NLON), 7.0, dtype=np.float32)
    src = ERASource(ERA5Reader(era_root), LEAP0, 8760, sst_climo=climo)
    idx = np.array([0, 8759])
    out = src.truth_at(idx)
    want = np.asarray([expected_file_hour(h) for h in idx]) - 7.0
    np.testing.assert_allclose(out["sst"][:, 0, 0], want)


def test_model_state_reader_roundtrip(tmp_path):
    rpy = 8760 // 6
    for yi, base in ((0, 0.0), (1, 5000.0)):
        ramp = base + np.arange(rpy, dtype=np.float32)
        atmo = np.broadcast_to(ramp[:, None, None, None, None],
                               (rpy, 4, NZ, 4, 8)).astype(np.float32)
        logp = np.broadcast_to(ramp[:, None, None],
                               (rpy, 4, 8)).astype(np.float32)
        write_model_states(tmp_path / f"restart_6hour_y{2000+yi}.nc",
                           atmo, logp)
    r = ModelStateReader(tmp_path, 2000)
    # across the year boundary
    hours = np.array([8754, 8760, 8766])
    out = r.model_at(hours)
    np.testing.assert_allclose(out["atmo"][:, 0, 0, 0, 0],
                               [1459.0, 5000.0, 5001.0])
    np.testing.assert_allclose(out["logp"][:, 0, 0],
                               [1459.0, 5000.0, 5001.0])
    with pytest.raises(ValueError):
        r.model_at(np.array([7]))      # off the 6-h cadence


class OffsetSource:
    """Shift a SeriesSource so training starts near a year boundary."""

    def __init__(self, src, offset, n):
        self.src, self.offset, self._n = src, offset, n

    @property
    def n_samples(self):
        return self._n

    def truth_at(self, idx):
        return self.src.truth_at(np.asarray(idx) + self.offset)

    def model_at(self, idx):
        return self.src.model_at(np.asarray(idx) + self.offset)


def test_train_across_leap_year_boundary(era_root):
    """train_class_production through an ERASource window that crosses
    the leap-year -> next-year boundary equals training on the manually
    spliced in-memory series (ArraySource)."""
    import jax
    from speedy_ml_tpu.core import Geometry
    from speedy_ml_tpu.data.era import era_to_truth
    from speedy_ml_tpu.esn.domain import RegionLayout
    from speedy_ml_tpu.esn.reservoir import ESNHyper
    from speedy_ml_tpu.hybrid.chunked import train_class_production

    geom = Geometry(trunc=10, nlon=NLON, nlat=NLAT, nlev=NZ)
    layout = RegionLayout(geom, n_regions=32, overlap=1)
    cls = layout.classes[1]
    hyper = ESNHyper(m=500, deg=3, noise_mag=0.05)
    key = jax.random.PRNGKey(4)

    T, off = 64, 8760 - 30     # 30 samples in year 0, 34 in year 1
    era = ERASource(ERA5Reader(era_root), LEAP0, 2 * 8760)
    src_stream = OffsetSource(era, off, T)

    # manually spliced reference series
    reader = ERA5Reader(era_root)
    vars_ = ("t", "u", "v", "q", "logp", "precip", "sst", "tisr")
    y0 = reader.read_hours(LEAP0, reader.valid_hour_index(LEAP0)[off:],
                           variables=vars_)
    y1 = reader.read_hours(LEAP0 + 1, np.arange(off + T - 8760),
                           variables=vars_)
    manual = era_to_truth({k: np.concatenate([y0[k], y1[k]]) for k in vars_})
    src_mem = ArraySource(manual)

    kw = dict(nz=NZ, region_chunk=64, time_chunk=16, stride=2,
              n_discard=2, hybrid=False)
    p_stream = train_class_production(layout, cls, src_stream, hyper, key,
                                      **kw)
    p_mem = train_class_production(layout, cls, src_mem, hyper, key, **kw)
    np.testing.assert_allclose(np.asarray(p_stream.res.wout),
                               np.asarray(p_mem.res.wout),
                               rtol=5e-4, atol=5e-5)


def test_checkpoint_roundtrip_ragged_win_cols(tmp_path):
    """save_hybrid/load_hybrid must preserve win_cols for
    reference-imported (ragged) packs (ADVICE r2 medium #1)."""
    import types
    import jax
    from speedy_ml_tpu.core import Geometry
    from speedy_ml_tpu.data.checkpoint import load_hybrid, save_hybrid
    from speedy_ml_tpu.data.reference_import import (
        assemble_reference_class, synthesize_reference_worker)
    from speedy_ml_tpu.esn.domain import RegionLayout
    from speedy_ml_tpu.esn.reservoir import esn_step, readout

    geom = Geometry(trunc=10, nlon=32, nlat=16, nlev=NZ)
    layout = RegionLayout(geom, n_regions=32, overlap=1)
    rng = np.random.Generator(np.random.Philox(5))
    packs = []
    for cls in layout.classes:
        workers = [synthesize_reference_worker(
            rng, NZ, cls.core_shape, cls.input_shape,
            has_sst=bool(i % 2), m=432, deg=3, model_identity=False)
            for i in range(cls.count)]
        packs.append(assemble_reference_class(layout, cls, workers, NZ,
                                              dtype=jnp.float32))
    assert packs[0].res.win_cols is not None
    fake = types.SimpleNamespace(packs=packs, ml_only=False,
                                 ocean_packs=None, base_sst=None,
                                 sea_mask=None)
    save_hybrid(fake, str(tmp_path / "ck"))

    class GcmStub:
        class geom:
            nlev = NZ
        dtype = jnp.float32
        nsteps_day = 96

    hyb2 = load_hybrid(GcmStub(), layout, str(tmp_path / "ck"))
    for p0, p1 in zip(packs, hyb2.packs):
        assert p1.res.win_cols is not None
        np.testing.assert_array_equal(np.asarray(p0.res.win_cols),
                                      np.asarray(p1.res.win_cols))
        # behavioral equality: one ESN step + readout
        Rc, I = p0.res.mean.shape[0], p0.res.n_in
        u = jnp.asarray(rng.normal(0, 1, (Rc, I)), dtype=jnp.float32)
        lm = jnp.asarray(rng.normal(0, 1, (Rc, p0.res.n_speedy)),
                         dtype=jnp.float32)
        x0 = jnp.zeros((Rc, p0.res.n), dtype=jnp.float32)
        o0 = readout(p0.res, esn_step(p0.res, x0, u), lm)
        o1 = readout(p1.res, esn_step(p1.res, x0, u), lm)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   rtol=1e-6, atol=1e-6)
