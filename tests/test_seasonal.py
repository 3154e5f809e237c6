"""Seasonal data plumbing (VERDICT r1 #6): date-indexed TISR/SST
climatology tables in the hybrid cycle (get_tisr_by_date/get_sst_by_date,
mpires.f90:1644-1725), Feb-29 splicing in the ERA reader
(speedy_res_interface.f90:588-596), and SST anomalies."""

import numpy as np
import jax.numpy as jnp
import pytest

from speedy_ml_tpu.data.calendar import (ModelDate, day_of_year_365,
                                         hour_of_year_365)


def test_hour_of_year_365_wraps_leap():
    # non-leap: Dec 31 23h = 8759
    assert hour_of_year_365(ModelDate(1991, 12, 31, 23)) == 8759
    # leap year: after Feb 29 the index wraps into the 365-day table
    assert hour_of_year_365(ModelDate(1992, 3, 1, 0)) == \
        hour_of_year_365(ModelDate(1991, 3, 1, 0)) + 24
    assert 0 <= hour_of_year_365(ModelDate(1992, 12, 31, 23)) < 8760


def test_day_of_year_365():
    assert day_of_year_365(ModelDate(1990, 1, 1)) == 0
    assert day_of_year_365(ModelDate(1990, 12, 31)) == 364
    assert day_of_year_365(ModelDate(1990, 3, 1)) == 59


def test_era_feb29_splice(tmp_path):
    """A synthetic leap-year file: hour h has value h everywhere; the
    spliced stream must skip hours [59*24, 60*24)."""
    import h5py
    from speedy_ml_tpu.data.era import ERA5Reader

    nlat, nlon, nz = 4, 8, 2
    n = 8784
    path = tmp_path / "era_5_y1992_regridded_mpi_fixed_var_gcc.nc"
    hours = np.arange(n, dtype=np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("Temperature",
                         data=np.broadcast_to(
                             hours[:, None, None, None],
                             (n, nz, nlat, nlon)).copy())
        f.create_dataset("logp",
                         data=np.broadcast_to(hours[:, None, None],
                                              (n, nlat, nlon)).copy())

    r = ERA5Reader(str(tmp_path))
    assert r.year_hours(1992) == 8784
    idx = r.valid_hour_index(1992)
    assert len(idx) == 8760
    feb29_first = 59 * 24
    assert feb29_first not in idx and feb29_first + 23 not in idx

    chunks = list(r.stream_samples(1992, 8760, variables=("t", "logp"),
                                   chunk_hours=2000))
    got = np.concatenate([c["t"][:, 0, 0, 0] for c in chunks])
    assert len(got) == 8760
    expect = np.concatenate([np.arange(feb29_first),
                             np.arange(feb29_first + 24, 8784)])
    np.testing.assert_array_equal(got, expect)


def test_sst_anomalies():
    from speedy_ml_tpu.data.era import era_to_truth
    T, nlat, nlon, nz = 5, 4, 8, 2
    rng = np.random.Generator(np.random.Philox(1))
    era = dict(t=rng.normal(260, 10, (T, nz, nlat, nlon)),
               u=np.zeros((T, nz, nlat, nlon)),
               v=np.zeros((T, nz, nlat, nlon)),
               q=np.zeros((T, nz, nlat, nlon)),
               logp=np.zeros((T, nlat, nlon)),
               sst=np.full((T, nlat, nlon), 300.0))
    climo = np.full((365, nlat, nlon), 298.0)
    hoy = np.arange(T) * 6
    truth = era_to_truth(era, sst_climo=climo, hour_of_year=hoy)
    np.testing.assert_allclose(truth["sst"], 2.0)


def test_cycle_uses_tables():
    """With tables installed, the ESN feedback sees the date-indexed TISR
    and the SST grid follows the daily climatology + bias ramp."""
    from speedy_ml_tpu.core import Geometry
    from speedy_ml_tpu.esn.domain import RegionLayout
    from speedy_ml_tpu.hybrid.model import HybridAtmosphere

    class FakeGCM:
        dtype = jnp.float64
        geom = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)
        nsteps_day = 36

    hyb = HybridAtmosphere.__new__(HybridAtmosphere)
    hyb.gcm = FakeGCM()
    hyb.tisr_table = None
    hyb.tisr_hours_per_entry = 1
    hyb.sst_table = None
    hyb.ocean_packs = None

    g = FakeGCM.geom
    tisr_tab = np.arange(8760, dtype=np.float64)[:, None, None] * \
        np.ones((1, g.nlat, g.nlon))
    hyb.set_tisr_table(tisr_tab[::6], hours_per_entry=6)
    sst_tab = 280.0 + np.arange(365, dtype=np.float64)[:, None, None] * \
        np.ones((1, g.nlat, g.nlon))
    hyb.set_sst_table(sst_tab)

    f = hyb.tisr_field(jnp.asarray(0.5), jnp.asarray(1230),
                       table=hyb.tisr_table,
                       hours_per_entry=hyb.tisr_hours_per_entry)
    # hour 1230 -> entry 205 -> table value 205*6 = 1230
    np.testing.assert_allclose(np.asarray(f), 1230.0)

    sst = hyb.sst_by_date(jnp.asarray(24 * 40 + 3), jnp.asarray(1.5),
                          hyb.sst_table)
    np.testing.assert_allclose(np.asarray(sst), 280.0 + 40 + 1.5)
    # below-freezing entries get no bias
    hyb.set_sst_table(np.full((365, g.nlat, g.nlon), 271.0))
    sst = hyb.sst_by_date(jnp.asarray(0), jnp.asarray(1.5), hyb.sst_table)
    np.testing.assert_allclose(np.asarray(sst), 271.0)
