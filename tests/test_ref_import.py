"""Reference trained-weight import: assembly of per-worker files into
batched ClassPacks (VERDICT r1 #2; parallelmain.f90:142-199,
mod_io.f90:2911-3009).

Oracle: for each region, a plain-numpy ESN step + readout using the RAW
worker arrays (Fortran semantics) must equal the batched imported
program — including ragged regions (no-SST land workers with different
n, I, q padded into the class batch).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speedy_ml_tpu.core import Geometry
from speedy_ml_tpu.esn.domain import RegionLayout
from speedy_ml_tpu.esn.reservoir import ESNHyper, esn_step, readout
from speedy_ml_tpu.data.reference_import import (
    assemble_reference_class, read_reference_worker,
    synthesize_reference_worker, worker_path, write_reference_worker,
    import_reference_weights)

GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=2)
NZ = 2


@pytest.fixture(scope="module")
def layout():
    return RegionLayout(GEOM, n_regions=32, overlap=1)


def numpy_esn_oracle(w, feedback, local_model, leakage=1.0):
    """One reference predict() step in plain numpy from raw worker arrays
    (mod_reservoir.f90:1416-1453)."""
    n = w["win"].shape[0]
    A = np.zeros((n, n))
    A[w["rows"] - 1, w["cols"] - 1] += w["vals"]   # COO (1-based)
    x = np.zeros(n)
    x_new = (1 - leakage) * x + leakage * np.tanh(
        A @ x + w["win"] @ feedback)
    xt = x_new.copy()
    xt[1::2] = xt[1::2] ** 2                        # rows 2:n:2 squared
    aug = np.concatenate([local_model, xt])
    return w["wout"] @ aug, x_new


def make_workers(layout, cls, seed=0, land_every=3):
    """Synthesize a class's workers; every `land_every`-th is a no-SST
    (land) worker to exercise ragged assembly."""
    rng = np.random.Generator(np.random.Philox(seed))
    out = []
    for i in range(cls.count):
        has_sst = (i % land_every) != 1
        out.append(synthesize_reference_worker(
            rng, NZ, cls.core_shape, cls.input_shape, has_sst,
            m=432, deg=3, model_identity=False, wout_scale=0.1))
    return out


def test_roundtrip_file_orientation(tmp_path, layout):
    cls = layout.classes[1]
    rng = np.random.Generator(np.random.Philox(7))
    w = synthesize_reference_worker(rng, NZ, cls.core_shape,
                                    cls.input_shape, True, m=432, deg=3)
    p = worker_path(str(tmp_path), 5, "test")
    write_reference_worker(p, w["win"], w["wout"], w["rows"], w["cols"],
                           w["vals"], w["mean"], w["std"])
    r = read_reference_worker(p)
    np.testing.assert_array_equal(r["win"], w["win"])
    np.testing.assert_array_equal(r["wout"], w["wout"])
    np.testing.assert_array_equal(r["rows"], w["rows"])
    np.testing.assert_allclose(r["mean"], w["mean"])


def test_production_shape_worker():
    """One worker at TRUE production shapes: sea n=5760/I=576/q=10 and
    land n=6160/I=560/q=11 (mod_reservoir.f90 allocate_res_new)."""
    rng = np.random.Generator(np.random.Philox(3))
    sea = synthesize_reference_worker(rng, 8, (2, 2), (4, 4), True)
    assert (sea["n"], sea["I"], sea["q"]) == (5760, 576, 10)
    assert sea["wout"].shape == (136, 132 + 5760)
    land = synthesize_reference_worker(rng, 8, (2, 2), (4, 4), False)
    assert (land["n"], land["I"], land["q"]) == (6160, 560, 11)
    assert land["win"].shape == (6160, 560)


def test_batched_import_equals_numpy_oracle(layout):
    cls = layout.classes[1]
    workers = make_workers(layout, cls, seed=1)
    pack = assemble_reference_class(layout, cls, workers, NZ,
                                    hyper=ESNHyper(), dtype=jnp.float64)
    Rc = cls.count
    I_full = pack.res.n_in
    S = workers[0]["S"]
    rng = np.random.Generator(np.random.Philox(11))
    fb_full = rng.normal(0, 1, (Rc, I_full))
    lm = rng.normal(0, 1, (Rc, S))

    x0 = jnp.zeros((Rc, pack.res.n), dtype=jnp.float64)
    x1 = esn_step(pack.res, x0, jnp.asarray(fb_full), 1.0)
    out = readout(pack.res, x1, jnp.asarray(lm))

    xi, yi = cls.input_shape
    xy = xi * yi
    atmo_in = 4 * NZ * xy
    sst_off = atmo_in + 2 * xy
    for r in range(Rc):
        w = workers[r]
        if w["I"] == I_full:
            fb_r = fb_full[r]
        else:
            # land region: drop the SST block from the padded vector
            fb_r = np.concatenate([fb_full[r, :sst_off],
                                   fb_full[r, sst_off + xy:]])
        o_ref, x_ref = numpy_esn_oracle(w, fb_r, lm[r])
        n = w["n"]
        np.testing.assert_allclose(np.asarray(x1[r, :n]), x_ref,
                                   rtol=1e-10, atol=1e-12)
        # padded states stay exactly zero
        if n < pack.res.n:
            assert np.abs(np.asarray(x1[r, n:])).max() == 0.0
        np.testing.assert_allclose(np.asarray(out[r]), o_ref,
                                   rtol=1e-9, atol=1e-11)


def test_mean_std_component_permutation(layout):
    """File order [atmo, logp, TISR, precip, SST] maps into our
    [atmo, logp, precip, sst, tisr] (mod_reservoir.f90:1819-1845)."""
    cls = layout.classes[1]
    workers = make_workers(layout, cls, seed=2, land_every=10**9)
    a = 4 * NZ
    # tag the file components distinctly
    for w in workers:
        w["mean"] = np.concatenate([np.arange(a, dtype=float),
                                    [100.0, 300.0, 200.0, 400.0]])
        # file order: logp=100, tisr=300, precip=200, sst=400
    pack = assemble_reference_class(layout, cls, workers, NZ)
    cm = np.asarray(pack.std.comp_mean[0])
    assert cm[a] == 100.0       # logp
    assert cm[a + 1] == 200.0   # precip
    assert cm[a + 2] == 400.0   # sst
    assert cm[a + 3] == 300.0   # tisr


@pytest.mark.slow
def test_imported_weights_hybrid_forecast(tmp_path):
    """14-day hybrid forecast from imported (synthetic, identity-model)
    weights: the full trained-weights prediction path of
    parallelmain.f90:142-272 runs and stays physical."""
    from speedy_ml_tpu.core import PhysicalConstants
    from speedy_ml_tpu.core.spectral import SpectralTransform
    from speedy_ml_tpu.data.calendar import ModelDate
    from speedy_ml_tpu.gcm import GCM
    from speedy_ml_tpu.hybrid.chunked import (ArraySource,
                                              streaming_standardizer)
    from speedy_ml_tpu.hybrid.driver import run_prediction
    from speedy_ml_tpu.hybrid.training import generate_nature_run
    from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data

    # the GCM needs the 8-level sigma tables; the import path itself is
    # level-count agnostic
    geom = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)
    nz = 8
    layout = RegionLayout(geom, n_regions=32, overlap=1)
    sht = SpectralTransform(geom, dtype=jnp.float64)
    bd = synthetic_boundary_data(geom, sht)
    gcm = GCM(geom, PhysicalConstants(), dtype=jnp.float64, bd=bd)

    # realistic per-region component stats from a short nature run
    truth, snaps, dates = generate_nature_run(gcm, ModelDate(1990, 3, 1),
                                              10, spinup_days=1)
    src = ArraySource(truth)
    rng = np.random.Generator(np.random.Philox(21))

    def reader(region_id):
        # identity-model wout + tiny reservoir contribution, worker stats
        # from the nature run, written/read through the file format
        for cls_i, cls in enumerate(layout.classes):
            hit = np.where(cls.region_ids == region_id)[0]
            if len(hit):
                break
        std = stds[cls_i]
        a = 4 * nz
        cm = np.asarray(std.comp_mean[hit[0]])
        cs = np.asarray(std.comp_std[hit[0]])
        w = synthesize_reference_worker(
            rng, nz, cls.core_shape, cls.input_shape,
            has_sst=bool(region_id % 2), m=1500, deg=3,
            comp_mean=cm, comp_std=np.maximum(cs, 1e-3),
            wout_scale=1e-4, model_identity=True)
        p = worker_path(str(tmp_path), region_id, "t")
        write_reference_worker(p, w["win"], w["wout"], w["rows"],
                               w["cols"], w["vals"], w["mean"], w["std"])
        return read_reference_worker(p)

    stds = [streaming_standardizer(layout, cls, src, nz,
                                   dtype=jnp.float64)
            for cls in layout.classes]
    hyb = import_reference_weights(gcm, layout, nz, reader,
                                   dtype=jnp.float64)

    sync = {k: v[:-1] for k, v in truth.items()}
    model_next = dict(atmo=truth["atmo"][-1], logp=truth["logp"][-1])
    hstate = hyb.start_prediction(sync, model_next, truth["sst"][-1])

    n_cycles = 56    # 14 days of 6-h cycles
    date = dates[-1]
    out_path = tmp_path / "pred.npz"
    hstate, run_dates = run_prediction(hyb, hstate, date, n_cycles,
                                       output_path=str(out_path))
    assert bool(hstate.safe)
    assert len(run_dates) == n_cycles
    z = np.load(out_path)
    atmo = z["atmo"][-1]
    assert np.isfinite(atmo).all()
    assert 160.0 < atmo[0].min() and atmo[0].max() < 330.0
