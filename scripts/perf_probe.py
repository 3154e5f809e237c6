"""One-shot performance probe: every hot path, forced-sync timings.

Run on the accelerator; prints one line per measurement.  All timings
force a host readback (the axon backend's block_until_ready does not
synchronize)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10, chain=None):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())   # warm + sync
    t0 = time.time()
    cur = out
    for _i in range(iters):
        cur = fn(*(args if chain is None else chain(cur, args)))
    _ = float(jax.tree_util.tree_leaves(cur)[0].sum())
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)

    # 1. ESN paths at production scale
    from speedy_ml_tpu.esn.reservoir import (BatchedReservoir, ESNHyper,
                                             esn_step, generate,
                                             make_onehots, readout)
    R, I = 1056, 576
    for m in (1000, 6000):
        hyper = ESNHyper(m=m)
        with jax.default_device(jax.devices("cpu")[0]):
            cols, vals, win, shifts = generate(
                jax.random.PRNGKey(0), R, I, hyper, 0.7, dtype=jnp.float32,
                radius_iters=3)
        n = vals.shape[2]
        S = 132
        dev = jax.devices()[0]
        res = BatchedReservoir(
            cols=jax.device_put(cols, dev), vals=jax.device_put(vals, dev),
            win_vals=jax.device_put(win, dev), n_in=I,
            wout=1e-3 * jax.random.normal(jax.random.PRNGKey(1),
                                          (R, 136, S + n), jnp.float32),
            mean=jnp.zeros((R, I)), std=jnp.ones((R, I)), shifts=shifts)
        res_g = BatchedReservoir(cols=res.cols, vals=res.vals,
                                 win_vals=res.win_vals, n_in=I, wout=res.wout,
                                 mean=res.mean, std=res.std)
        res_oh = BatchedReservoir(cols=res.cols, vals=res.vals,
                                  win_vals=res.win_vals, n_in=I, wout=res.wout,
                                  mean=res.mean, std=res.std,
                                  onehots=jax.device_put(make_onehots(cols, n),
                                                         dev))
        x = jax.random.normal(jax.random.PRNGKey(2), (R, n))
        u = jnp.ones((R, I))
        lm = jnp.ones((R, S))
        sj = jax.jit(lambda r, x, u: esn_step(r, x, u))
        timeit(f"esn_step shift m={m}", sj, res, x, u,
               chain=lambda c, a: (res, c, u))
        timeit(f"esn_step onehot m={m}", sj, res_oh, x, u,
               chain=lambda c, a: (res_oh, c, u))
        timeit(f"esn_step gather m={m}", sj, res_g, x, u,
               chain=lambda c, a: (res_g, c, u))
        rj = jax.jit(lambda r, x, lm: readout(r, x, lm))
        timeit(f"readout m={m}", rj, res, x, lm)

    # 2. GCM pieces at T30
    from speedy_ml_tpu.core.geometry import Geometry
    from speedy_ml_tpu.core.spectral import SpectralTransform
    from speedy_ml_tpu.gcm import GCM
    from speedy_ml_tpu.data.calendar import ModelDate
    from __graft_entry__ import _boundary

    geom = Geometry()
    sht = SpectralTransform(geom, dtype=jnp.float32)
    gcm = GCM(geom, dtype=jnp.float32, bd=_boundary(geom, sht))
    date = ModelDate(1990, 1, 1)
    state, forcing = gcm.init_state(date)
    state = gcm.stepone(state, forcing)

    step_j = jax.jit(lambda s: gcm.leapfrog(s, forcing))
    timeit("gcm leapfrog step", step_j, state,
           chain=lambda c, a: (c,), iters=20)

    win24 = jax.jit(lambda s: gcm.run_window(s, forcing, 24))
    timeit("gcm 24-step window", win24, state, chain=lambda c, a: (c,),
           iters=5)

    # transforms batched over 8 levels
    v = jax.random.normal(jax.random.PRNGKey(3), (8, geom.mx, geom.nx)) \
        .astype(jnp.complex64)
    s2g = jax.jit(sht.spec_to_grid)
    timeit("spec_to_grid (8 lev)", s2g, v, iters=50)
    g = jax.random.normal(jax.random.PRNGKey(4), (8, geom.nlat, geom.nlon),
                          jnp.float32)
    g2s = jax.jit(sht.grid_to_spec)
    timeit("grid_to_spec (8 lev)", g2s, g, iters=50)

    # 3. full hybrid cycle at m=6000
    from speedy_ml_tpu.hybrid.build import build_untrained_hybrid
    hyb = build_untrained_hybrid(gcm, m=6000, radius_iters=5)
    hstate = hyb.init_state(jnp.asarray(gcm.bd.sst12[0]))
    params = hyb.params
    im, fm, ty = (jnp.asarray(0), jnp.asarray(0.5, jnp.float32),
                  jnp.asarray(0.05, jnp.float32))

    def cyc(hs):
        ns, _ = hyb.cycle_with_params(params, hs, im, fm, ty)
        return ns

    cj = jax.jit(cyc)
    out = cj(hstate)
    _ = float(out.classes[0].x.sum())
    t0 = time.time()
    cur = out
    N = 10
    for _i in range(N):
        cur = cj(cur)
    _ = float(cur.classes[0].x.sum())
    dt = (time.time() - t0) / N
    print(f"hybrid cycle m=6000: {dt*1000:.1f} ms -> "
          f"{6*3600/dt/365/86400*86400:.1f} sim-years/day", flush=True)


if __name__ == "__main__":
    main()
