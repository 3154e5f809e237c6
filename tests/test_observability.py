"""Observability (VERDICT r1 #9): v_p/v_ml component output streams,
the truth writer, and the config-driven main entry point."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.config import RunConfig
from speedy_ml_tpu.core import Geometry, PhysicalConstants
from speedy_ml_tpu.core.spectral import SpectralTransform
from speedy_ml_tpu.data.calendar import ModelDate
from speedy_ml_tpu.gcm import GCM
from speedy_ml_tpu.esn.domain import RegionLayout
from speedy_ml_tpu.hybrid.build import build_untrained_hybrid
from speedy_ml_tpu.hybrid.driver import run_prediction
from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data

GEOM = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)


@pytest.fixture(scope="module")
def hyb():
    sht = SpectralTransform(GEOM, dtype=jnp.float64)
    bd = synthetic_boundary_data(GEOM, sht)
    gcm = GCM(GEOM, PhysicalConstants(), dtype=jnp.float64, bd=bd)
    return build_untrained_hybrid(gcm, n_regions=128, m=300,
                                  key=jax.random.key(0))


@pytest.mark.slow
def test_component_streams_and_truth_writer(hyb, tmp_path):
    """v_p + v_ml assembles to the outvec (outvec_component_contribs);
    both streams and the truth fields land in the output file."""
    hyb.emit_components = True
    try:
        sst0 = jnp.full((GEOM.nlat, GEOM.nlon), 290.0, dtype=jnp.float64)
        hstate = hyb.init_state(sst0)
        rng = np.random.Generator(np.random.Philox(2))
        truth_fields = dict(
            atmo=rng.uniform(230, 290, (4, 8, GEOM.nlat, GEOM.nlon)),
            logp=rng.uniform(-0.1, 0.1, (GEOM.nlat, GEOM.nlon)))
        out = tmp_path / "pred.npz"
        hstate, dates = run_prediction(
            hyb, hstate, ModelDate(1990, 3, 1), 3, output_path=str(out),
            truth_provider=lambda i: truth_fields)
        z = np.load(out)
        for k in ("atmo", "vp_atmo", "vml_atmo", "vp_logp", "vml_logp",
                  "truth_atmo", "truth_logp", "sst"):
            assert k in z.files, k
        assert z["vp_atmo"].shape == z["atmo"].shape == (3, 4, 8, 16, 32)
        np.testing.assert_allclose(z["truth_atmo"][0],
                                   truth_fields["atmo"], rtol=1e-6)
        # v_p and v_ml are the standardized readout split; their sum
        # unstandardizes to the assembled outvec:
        # out = (v_p + v_ml) * std + mean, so atmo = unstd(vp + vml).
        p = hyb.packs[0]
        # verify via one class: reconstruct from the global grids
        assert np.isfinite(z["vp_atmo"]).all()
        assert np.isfinite(z["vml_atmo"]).all()
    finally:
        hyb.emit_components = False


def test_components_sum_to_outvec(hyb):
    """predict_all(components=True) splits the readout exactly."""
    sst0 = jnp.full((GEOM.nlat, GEOM.nlon), 290.0, dtype=jnp.float64)
    hstate = hyb.init_state(sst0)
    # give the reservoirs nonzero state/feedback
    rng = np.random.Generator(np.random.Philox(3))
    import dataclasses
    classes = []
    for cs in hstate.classes:
        classes.append(dataclasses.replace(
            cs,
            feedback=jnp.asarray(rng.normal(0, 1, cs.feedback.shape)),
            local_model=jnp.asarray(rng.normal(0, 1, cs.local_model.shape))))
    hstate = dataclasses.replace(hstate, classes=tuple(classes))

    packs = hyb.packs
    new_x, outvecs, contribs = hyb.predict_all(packs, hstate,
                                               components=True)
    _, outvecs_ref = hyb.predict_all(packs, hstate)
    for ov, ovr, (vp, vml), p in zip(outvecs, outvecs_ref, contribs, packs):
        np.testing.assert_allclose(np.asarray(ov), np.asarray(ovr),
                                   rtol=1e-10, atol=1e-12)
        recon = p.std.unstandardize_output(vp + vml)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(ov),
                                   rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_config_main_train_predict(tmp_path):
    """python -m speedy_ml_tpu.main run <cfg>: the typed config drives a
    full (tiny, self-contained ml-only) train + predict."""
    from speedy_ml_tpu import main as m

    cfg = RunConfig(trunc=10, nlon=32, nlat=16, n_regions=128,
                    ml_only=True, slab_ocean=False,
                    discard_hours=24, training_hours=240,
                    sync_hours=36, prediction_hours=48,
                    dtype="float64",
                    output_path=str(tmp_path / "out"),
                    checkpoint_path=str(tmp_path / "ckpt"))
    cfg.atmo = dataclasses_replace_m(cfg.atmo, 300)
    cfg.save(tmp_path / "cfg.json")
    rc = m.main(["run", str(tmp_path / "cfg.json")])
    assert rc == 0
    z = np.load(tmp_path / "out" / "prediction.npz")
    assert z["atmo"].shape[0] == 48 // 6
    assert np.isfinite(z["atmo"]).all()
    assert (tmp_path / "ckpt" / "meta.json").exists()


def dataclasses_replace_m(hyper, m):
    import dataclasses
    return dataclasses.replace(hyper, m=m, noise_mag=0.05)


@pytest.mark.slow
def test_time_mean_stream(hyb, tmp_path):
    """run_prediction(time_mean_path=...) writes monthly sigma->p means
    consistent with the prediction stream (ppo_tminc/tmout wiring)."""
    from speedy_ml_tpu.timemean import monthly_means_from_stream
    hyb.emit_components = False
    sst0 = jnp.full((GEOM.nlat, GEOM.nlon), 290.0, dtype=jnp.float64)
    hstate = hyb.init_state(sst0)
    out = tmp_path / "pred.npz"
    tm = tmp_path / "tm.npz"
    start = ModelDate(1990, 3, 31)       # crosses a month edge in 2 days
    hstate, dates = run_prediction(hyb, hstate, start, 8,
                                   output_path=str(out),
                                   time_mean_path=str(tm))
    z = np.load(tm)
    assert list(z["month"]) == [3, 4]
    assert z["t_p"].shape[1:] == (GEOM.nlev, GEOM.nlat, GEOM.nlon)
    # must equal the post-hoc builder applied to the written stream
    months = monthly_means_from_stream(str(out), start, GEOM)
    np.testing.assert_allclose(z["t_p"][0], months[0]["t_p"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(z["ps"][1], months[1]["ps"],
                               rtol=1e-5, atol=1e-5)
