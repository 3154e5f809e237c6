"""Golden regression + climate sanity for the full GCM (VERDICT r1 #4).

1. Golden: a deterministic 100-step f64 T30 integration with the real
   reference boundary climatology must reproduce the checked-in state
   bit-for-bit-ish (pins refactors; BASELINE config #1 intent — no
   Fortran compiler exists here, so the anchor is this framework's own
   audited integration).
2. Climate sanity: a multi-week run from rest develops the canonical
   SPEEDY circulation — westerly midlatitude jets aloft, tropical
   easterlies near the surface, physical global-mean temperature —
   checked against documented SPEEDY climatology ranges.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.data.calendar import ModelDate
from speedy_ml_tpu.gcm import GCM

GOLDEN = Path(__file__).parent / "golden" / "dycore_t30_100step.npz"


@pytest.mark.slow
def test_golden_regression_100steps():
    gcm = GCM(dtype=jnp.float64)
    state, forcing = gcm.init_state(ModelDate(1990, 7, 1))
    state = gcm.stepone(state, forcing)
    state = gcm.run_window(state, forcing, 98)
    g = np.load(GOLDEN)
    sp = state.spectral
    for name, arr in [("vor", sp.vor[1]), ("div", sp.div[1]),
                      ("t", sp.t[1]), ("ps", sp.ps[1]), ("tr", sp.tr[1])]:
        ref = g[name]
        scale = max(np.abs(ref).max(), 1e-30)
        np.testing.assert_allclose(
            np.asarray(arr), ref, rtol=1e-9, atol=1e-9 * scale,
            err_msg=f"golden mismatch in {name}")
    np.testing.assert_allclose(np.asarray(state.fluxes.precip),
                               g["precip"], rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_climate_sanity_jets():
    """20-day July run from rest: zonal-mean circulation structure.

    SPEEDY's documented climatology (Molteni 2003; the reference's
    hybrid_climo verification targets): upper-level (sigma~0.2-0.3)
    westerly jets of tens of m/s in midlatitudes, near-surface tropical
    easterlies (trade winds), global-mean lowest-level T near 288 K."""
    gcm = GCM(dtype=jnp.float32)
    date = ModelDate(1990, 7, 1)
    state, forcing = gcm.init_state(date)
    state = gcm.stepone(state, forcing)
    state, date = gcm.run_days(state, date, 20)

    sht = gcm.sht
    sp = state.spectral
    u, v = sht.uv_grid(sp.vor[1], sp.div[1])      # (K, lat, lon)
    t = sht.spec_to_grid(sp.t[1])
    uz = np.asarray(u).mean(axis=2)               # zonal mean (K, lat)
    lat = np.rad2deg(gcm.geom.lat_radians)
    w = np.cos(gcm.geom.lat_radians)

    # upper troposphere (k=2, sigma=0.2): midlatitude westerly jets
    midlat_n = (lat > 20) & (lat < 60)
    midlat_s = (lat < -20) & (lat > -60)
    assert uz[2][midlat_n].max() > 10.0, "no NH upper-level westerly jet"
    assert uz[2][midlat_s].max() > 10.0, "no SH upper-level westerly jet"

    # near-surface tropics (k=7, sigma=0.95): mean easterlies (trades)
    tropics = np.abs(lat) < 15
    assert uz[7][tropics].mean() < 0.0, "no tropical surface easterlies"

    # global-mean lowest-level temperature in a physical range
    tbar = float((np.asarray(t[7]) * w[:, None]).sum()
                 / (w.sum() * gcm.geom.nlon))
    assert 270.0 < tbar < 300.0, f"global-mean sfc T {tbar}"

    # fields bounded
    assert np.abs(np.asarray(u)).max() < 150.0
    assert np.isfinite(np.asarray(t)).all()
