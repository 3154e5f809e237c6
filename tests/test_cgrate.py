"""cgrate limiter (dyn_step.f90:192-276) behavior."""
import jax, jax.numpy as jnp, numpy as np
from speedy_ml_tpu.core import Geometry
from speedy_ml_tpu.dycore.model import DycoreModel

def test_cgrate_damps_fast_growth_only():
    g = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)
    m = DycoreModel(g, dtype=jnp.float64, cgrate_on=True)
    rng = np.random.default_rng(0)
    shp = (g.nlev, g.mx, g.nx)
    f = jnp.asarray(rng.normal(0, 1e-5, shp) + 1j * rng.normal(0, 1e-5, shp))
    f = m.sht.trunct(f)
    # growing case: tendency aligned with the field, rate >> grmax
    fdt_grow = f * 1e-3
    out_v, out_d = m._cgrate(f, f, fdt_grow, fdt_grow)
    # eddy part damped: |out| < |fdt| on m>0 coefficients
    assert float(jnp.abs(out_v[:, 1:]).sum()) < float(jnp.abs(fdt_grow[:, 1:]).sum())
    # zonal-mean untouched
    np.testing.assert_array_equal(np.asarray(out_v[:, 0]), np.asarray(fdt_grow[:, 0]))
    # damping magnitude: cdamp = 0.8*grate/rnorm = 0.8e-3 here
    expect = fdt_grow[:, 1:] - 0.8e-3 * f[:, 1:]
    np.testing.assert_allclose(np.asarray(out_v[:, 1:]), np.asarray(expect),
                               rtol=1e-10)
    # slow growth: untouched
    fdt_slow = f * 1e-9
    out_v2, _ = m._cgrate(f, f, fdt_slow, fdt_slow)
    np.testing.assert_array_equal(np.asarray(out_v2), np.asarray(fdt_slow))
    # decaying: untouched
    out_v3, _ = m._cgrate(f, f, -fdt_grow, -fdt_grow)
    np.testing.assert_array_equal(np.asarray(out_v3), np.asarray(-fdt_grow))

def test_cgrate_off_by_default():
    g = Geometry(trunc=10, nlon=32, nlat=16, nlev=8)
    m = DycoreModel(g, dtype=jnp.float64)
    assert m.cgrate_on is False
