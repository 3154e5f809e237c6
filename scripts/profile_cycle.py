"""Component-level timing of the hybrid cycle on the current device.

Times (a) the ESN step + readout, (b) one SPEEDY 6-h window, (c) the full
cycle, to locate the bottleneck.  Usage: python scripts/profile_cycle.py
[BENCH_M=6000]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from speedy_ml_tpu.core.geometry import Geometry
from speedy_ml_tpu.core.spectral import SpectralTransform
from speedy_ml_tpu.gcm import GCM
from speedy_ml_tpu.hybrid.build import build_untrained_hybrid
from __graft_entry__ import _boundary


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    geom = Geometry()
    sht = SpectralTransform(geom, dtype=jnp.float32)
    gcm = GCM(geom, dtype=jnp.float32, bd=_boundary(geom, sht))
    m = int(os.environ.get("BENCH_M", "6000"))
    hyb = build_untrained_hybrid(gcm, m=m, radius_iters=10)
    print(f"classes: {len(hyb.packs)}", file=sys.stderr)
    for p in hyb.packs:
        print(f"  class Rc={p.cls.count} n={p.res.n} I={p.res.n_inputs} "
              f"O={p.res.n_outputs} S={p.res.n_speedy} "
              f"wout={p.res.wout.nbytes/1e9:.2f}GB "
              f"onehots={'None' if p.res.onehots is None else p.res.onehots.nbytes/1e9}",
              file=sys.stderr)

    hstate = hyb.init_state(jnp.asarray(gcm.bd.sst12[0]))
    imon = jnp.asarray(0)
    fmon = jnp.asarray(0.5, jnp.float32)
    tyear = jnp.asarray(0.05, jnp.float32)

    from speedy_ml_tpu.esn.reservoir import esn_step, readout

    # (a) esn step alone
    @jax.jit
    def esn_only(xs, fbs):
        return tuple(esn_step(p.res, x, fb, p.hyper.leakage)
                     for p, x, fb in zip(hyb.packs, xs, fbs))

    xs = tuple(cs.x for cs in hstate.classes)
    fbs = tuple(cs.feedback for cs in hstate.classes)
    t = timeit(esn_only, xs, fbs)
    print(f"esn_step:        {t*1e3:8.2f} ms")

    # (b) readout alone
    @jax.jit
    def read_only(xs, lms):
        return tuple(readout(p.res, x, lm)
                     for p, x, lm in zip(hyb.packs, xs, lms))

    lms = tuple(cs.local_model for cs in hstate.classes)
    t = timeit(read_only, xs, lms)
    print(f"readout:         {t*1e3:8.2f} ms")

    # (c) speedy window
    from speedy_ml_tpu.dycore.init import rest_state
    spec0, _ = rest_state(gcm.dyn, gcm.bd.orog)
    t = timeit(lambda s: hyb.speedy_window(s, hstate.sst_grid, imon, fmon,
                                           tyear), spec0, n=5)
    print(f"speedy_window:   {t*1e3:8.2f} ms  (24 steps -> "
          f"{t/24*1e3:.2f} ms/step)")

    # (d) full cycle
    t = timeit(lambda s: hyb.cycle(s, imon, fmon, tyear)[0], hstate, n=5)
    print(f"full cycle:      {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
