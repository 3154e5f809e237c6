"""Checkpoint round-trip + reference-format import helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry, PhysicalConstants
from speedy_ml_tpu.data.checkpoint import (coo_to_ell, load_hybrid,
                                           save_hybrid, win_to_rowvals)
from speedy_ml_tpu.esn.domain import RegionLayout
from speedy_ml_tpu.esn.reservoir import ell_spmv
from speedy_ml_tpu.gcm import GCM
from speedy_ml_tpu.hybrid.build import build_untrained_hybrid
from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data

GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)


def test_save_load_roundtrip(tmp_path):
    from speedy_ml_tpu.core.spectral import SpectralTransform
    sht = SpectralTransform(GEOM, dtype=jnp.float32)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float32,
              bd=synthetic_boundary_data(GEOM, sht))
    hyb = build_untrained_hybrid(gcm, n_regions=128, m=300, radius_iters=5)
    save_hybrid(hyb, tmp_path / "ckpt")

    layout = RegionLayout(GEOM, n_regions=128, overlap=1)
    hyb2 = load_hybrid(gcm, layout, tmp_path / "ckpt", dtype=jnp.float32)
    for p1, p2 in zip(hyb.packs, hyb2.packs):
        np.testing.assert_array_equal(np.asarray(p1.res.wout),
                                      np.asarray(p2.res.wout))
        np.testing.assert_array_equal(np.asarray(p1.res.cols),
                                      np.asarray(p2.res.cols))
        assert p1.res.n_in == p2.res.n_in
        np.testing.assert_array_equal(np.asarray(p1.std.in_mean),
                                      np.asarray(p2.std.in_mean))


def test_checkpoint_format_version_rejected(tmp_path):
    """Old/unversioned checkpoints must be rejected, not misread."""
    import json
    from speedy_ml_tpu.core.spectral import SpectralTransform
    sht = SpectralTransform(GEOM, dtype=jnp.float32)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float32,
              bd=synthetic_boundary_data(GEOM, sht))
    hyb = build_untrained_hybrid(gcm, n_regions=128, m=300, radius_iters=5)
    save_hybrid(hyb, tmp_path / "ckpt")
    meta_path = tmp_path / "ckpt" / "meta.json"
    meta = json.loads(meta_path.read_text())
    assert meta["format_version"] == 2
    del meta["format_version"]   # simulate a pre-versioning checkpoint
    meta_path.write_text(json.dumps(meta))
    layout = RegionLayout(GEOM, n_regions=128, overlap=1)
    with pytest.raises(ValueError, match="format_version"):
        load_hybrid(gcm, layout, tmp_path / "ckpt", dtype=jnp.float32)


def test_coo_to_ell():
    # 3x3 matrix with entries (1,1)=2, (1,3)=5, (3,2)=7 (1-based COO)
    rows = np.array([1, 1, 3])
    cols = np.array([1, 3, 2])
    vals = np.array([2.0, 5.0, 7.0])
    ell_cols, ell_vals = coo_to_ell(rows, cols, vals, 3)
    x = np.array([1.0, 2.0, 3.0])
    # vals are slot-major (J, R, n)
    y = np.asarray(ell_spmv(jnp.asarray(ell_vals.T[:, None, :]),
                            jnp.asarray(ell_cols[None]),
                            jnp.asarray(x[None])))[0]
    np.testing.assert_allclose(y, [2 * 1 + 5 * 3, 0.0, 7 * 2])


def test_win_to_rowvals():
    n, I = 12, 3
    q = n // I
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(n)
    win = np.zeros((n, I))
    for i in range(I):
        win[i * q:(i + 1) * q, i] = vals[i * q:(i + 1) * q]
    got = win_to_rowvals(win)
    np.testing.assert_allclose(got, vals)
    win[0, 2] = 1.0   # break structure
    with pytest.raises(ValueError):
        win_to_rowvals(win)


def test_reference_weight_reader_format(tmp_path):
    """Round-trip through an h5py file shaped like the reference output."""
    import h5py
    n, I, O, k = 24, 6, 4, 40
    rng = np.random.default_rng(1)
    # NetCDF stores Fortran arrays transposed: the file holds (I, n) for
    # the Fortran (n, I) win; the reader transposes back
    with h5py.File(tmp_path / "worker_0001_level_1_test.nc", "w") as f:
        f["win"] = rng.standard_normal((I, n))
        f["wout"] = rng.standard_normal((n, O))
        f["rows"] = rng.integers(1, n + 1, size=k)
        f["cols"] = rng.integers(1, n + 1, size=k)
        f["vals"] = rng.standard_normal(k)
        f["mean"] = rng.standard_normal(10)
        f["std"] = np.abs(rng.standard_normal(10))
    from speedy_ml_tpu.data.checkpoint import read_reference_worker
    d = read_reference_worker(tmp_path / "worker_0001_level_1_test.nc")
    assert d["win"].shape == (n, I)
    assert d["vals"].shape == (k,)


@pytest.mark.slow
def test_save_load_roundtrip_with_ocean(tmp_path):
    """Ocean packs (idx_map, SST scalars, hybrid_readout flag, weights)
    survive the checkpoint round trip — the path the climate-run
    restart and the bf16 validation depend on."""
    import jax
    from speedy_ml_tpu.core.spectral import SpectralTransform
    from speedy_ml_tpu.esn.reservoir import ESNHyper
    from speedy_ml_tpu.hybrid.training import train_hybrid
    from tests.test_ocean import fabricate_truth

    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float64,
              bd=synthetic_boundary_data(GEOM, sht))
    layout = RegionLayout(GEOM, n_regions=128, overlap=1)
    truth = fabricate_truth(120)
    hyb = train_hybrid(gcm, layout, truth, None,
                       ESNHyper(m=400, noise_mag=0.0),
                       jax.random.PRNGKey(1), ocean=True,
                       ocean_hyper=ESNHyper(m=200, sigma=0.6, beta_res=1e-4,
                                            noise_mag=0.0,
                                            using_prior=False),
                       n_discard=4, n_batches=4, dtype=jnp.float64)
    save_hybrid(hyb, tmp_path / "ckpt")
    hyb2 = load_hybrid(gcm, layout, tmp_path / "ckpt", dtype=jnp.float64)
    assert hyb2.ocean_packs is not None
    for o1, o2 in zip(hyb.ocean_packs, hyb2.ocean_packs):
        np.testing.assert_array_equal(np.asarray(o1.res.wout),
                                      np.asarray(o2.res.wout))
        np.testing.assert_array_equal(np.asarray(o1.idx_map),
                                      np.asarray(o2.idx_map))
        np.testing.assert_array_equal(np.asarray(o1.mean_sst),
                                      np.asarray(o2.mean_sst))
        assert o1.hybrid_readout == o2.hybrid_readout
    np.testing.assert_array_equal(np.asarray(hyb.base_sst),
                                  np.asarray(hyb2.base_sst))
    # the loaded model runs a cycle
    sync = {k: truth[k][-6:] for k in truth}
    hstate = hyb2.start_prediction(sync, None, truth["sst"][-1])
    hstate, diag = hyb2.cycle(hstate, jnp.asarray(0),
                              jnp.asarray(0.5, jnp.float64),
                              jnp.asarray(0.1, jnp.float64))
    assert bool(jnp.isfinite(hstate.sst_grid).all())
