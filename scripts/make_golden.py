"""Generate the checked-in dycore+physics golden regression state.

A deterministic 100-step f64 integration at T30 with the REAL reference
boundary climatology (fort.20-26), full physics, from a rest start on
1990-07-01.  tests/test_golden.py re-runs this configuration and asserts
allclose against the stored state, pinning future refactors
(VERDICT r1 weak #1 / BASELINE config #1 intent).
"""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from speedy_ml_tpu.data.calendar import ModelDate
from speedy_ml_tpu.gcm import GCM

gcm = GCM(dtype=jnp.float64)
state, forcing = gcm.init_state(ModelDate(1990, 7, 1))
state = gcm.stepone(state, forcing)
state = gcm.run_window(state, forcing, 98)   # stepone = 2 steps; total 100
sp = state.spectral
np.savez_compressed(
    "tests/golden/dycore_t30_100step.npz",
    vor=np.asarray(sp.vor[1]), div=np.asarray(sp.div[1]),
    t=np.asarray(sp.t[1]), ps=np.asarray(sp.ps[1]),
    tr=np.asarray(sp.tr[1]),
    precip=np.asarray(state.fluxes.precip))
tg = gcm.sht.spec_to_grid(sp.t[1])
print("golden saved; T range", float(tg.min()), float(tg.max()))
