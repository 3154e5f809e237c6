"""Native IO runtime tests: parity between C++ and numpy paths."""

import numpy as np
import pytest

from speedy_ml_tpu.runtime import native


def test_native_builds():
    lib = native.get_lib()
    assert lib is not None, "native library failed to build"


def test_read_boundary_field_parity(tmp_path):
    nlat, nlon = 8, 16
    rng = np.random.default_rng(0)
    data = rng.standard_normal((3, nlat, nlon)).astype("<f4")
    data[1, 2, 3] = -1000.0  # missing value
    path = tmp_path / "fort.99"
    data.tofile(path)

    for group in range(3):
        got = native.read_boundary_field(path, group, nlon, nlat)
        # reference semantics: stored north->south; flip; zero <= -999
        expect = data[group][::-1].astype(np.float64)
        expect[expect <= -999] = 0.0
        np.testing.assert_array_equal(got, expect)


def test_gather_series_parity():
    rng = np.random.default_rng(1)
    T, nlat, nlon = 4, 16, 32
    R, ny, nx = 10, 3, 4
    fields = rng.standard_normal((T, nlat, nlon)).astype(np.float32)
    iy = rng.integers(0, nlat, size=(R, ny)).astype(np.int32)
    ix = rng.integers(0, nlon, size=(R, nx)).astype(np.int32)

    got = native.gather_series(fields, iy, ix, n_threads=4)
    expect = fields[:, iy[:, :, None], ix[:, None, :]].reshape(T, R, -1)
    np.testing.assert_array_equal(got, expect)


def test_boundary_reader_used_by_pipeline():
    """The boundaries module and the native reader agree on real files."""
    import os
    path = "/root/reference/bin/fort.20"
    if not os.path.exists(path):
        pytest.skip("reference boundary files unavailable")
    from speedy_ml_tpu.physics.boundaries import read_boundary_records
    a = read_boundary_records(path, 0, 96, 48)
    b = native.read_boundary_field(path, 0, 96, 48)
    np.testing.assert_array_equal(a, b)
