"""Benchmark: hybrid-model throughput in simulated years per day.

Runs the flagship configuration (T30L8 SPEEDY + 1,152 batched reservoirs,
6-h coupling cycle) on the available accelerator and prints one JSON line:

  {"metric": "hybrid_sim_years_per_day", "value": N, "unit": "sim-years/day",
   "vs_baseline": N/100}

Baseline: the reference publishes no throughput numbers (BASELINE.md);
the driver's north-star target is 100 sim-years/day, so vs_baseline is
value/100.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from speedy_ml_tpu.core.geometry import Geometry
    from speedy_ml_tpu.core.spectral import SpectralTransform
    from speedy_ml_tpu.gcm import GCM
    from speedy_ml_tpu.hybrid.build import build_untrained_hybrid
    from __graft_entry__ import _boundary

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log("bench: devices", jax.devices())

    geom = Geometry()
    sht = SpectralTransform(geom, dtype=jnp.float32)
    gcm = GCM(geom, dtype=jnp.float32, bd=_boundary(geom, sht))
    log("bench: gcm built")
    # production-scale reservoirs: m=6000 -> n=5760/region, 1,152 regions
    m = int(os.environ.get("BENCH_M", "6000"))
    hyb = build_untrained_hybrid(gcm, m=m, radius_iters=10)
    log("bench: hybrid built, m =", m)

    hstate = hyb.init_state(jnp.asarray(gcm.bd.sst12[0]))
    imon = jnp.asarray(0)
    fmon = jnp.asarray(0.5, jnp.float32)
    tyear = jnp.asarray(0.05, jnp.float32)
    log("bench: state initialized; compiling cycle")

    # compile + warmup; sync via host readback (block_until_ready does not
    # synchronize on tunneled backends).  Warm up CHAINED: XLA picks
    # different layouts for the cycle's outputs than fresh arrays have, so
    # the first output->input call compiles a second program variant.
    sync = lambda s: float(jnp.abs(s.classes[0].x).sum())
    hstate2, _ = hyb.cycle(hstate, imon, fmon, tyear)
    sync(hstate2)
    log("bench: compiled (fresh); warming chained variant")
    hstate3, _ = hyb.cycle(hstate2, imon, fmon, tyear)
    sync(hstate3)
    hstate = hstate2
    log("bench: compiled; timing")

    n_cycles = int(os.environ.get("BENCH_CYCLES", "20"))
    t0 = time.time()
    cur = hstate
    for _ in range(n_cycles):
        cur, _ = hyb.cycle(cur, imon, fmon, tyear)
    sync(cur)
    elapsed = time.time() - t0

    sim_seconds = n_cycles * 6 * 3600.0
    sim_years_per_day = (sim_seconds / elapsed) * 86400.0 / (365.0 * 86400.0)

    print(json.dumps({
        "metric": "hybrid_sim_years_per_day",
        "value": round(sim_years_per_day, 3),
        "unit": "sim-years/day",
        "vs_baseline": round(sim_years_per_day / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
