"""Batched echo-state networks, TPU-first.

Reference: mod_reservoir.f90 (gen_res/makesparse, reservoir_layer,
synchronize, predict).  Design differences from the Fortran:

- all regions live in ONE batched program: every array carries a leading
  region axis R, sharded over the device mesh (the reference assigns one
  region per MPI rank);
- the sparse adjacency uses an ELL layout (n, J) with near-uniform row
  degree — the reference's makesparse (mod_linalg.f90:180-218) draws
  row/col indices from concatenated random permutations, which makes row
  degrees {floor(k/n), floor(k/n)+1}, so J = floor(k/n)+1 pads almost
  nothing.  A x becomes a batched gather + small reduction (VPU/HBM), the
  input coupling Win u and the readout are batched matmuls (MXU);
- the spectral radius is found by batched power iteration instead of
  ARPACK (fixed iteration count for determinism);
- RNG is explicit (jax.random keys derived per region), replacing the
  per-worker seeded Fortran RNG.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchedReservoir:
    """Per-region reservoir weights, batched over the leading region axis R.

    Shapes (R regions, n nodes, J nnz/row, I inputs, O outputs, S speedy):
      cols: (R, n, J) int32   ELL column indices of A
      vals: (R, n, J)         ELL values of A (scaled to spectral radius)
      win:  (R, n, I)         input coupling (block-diagonal +-sigma)
      wout: (R, O, S + n)     readout on [local_model ; x-with-even-squared]
      mean: (R, I)            standardization mean per input element
      std:  (R, I)
    """
    cols: jnp.ndarray
    vals: jnp.ndarray
    win: jnp.ndarray
    wout: jnp.ndarray
    mean: jnp.ndarray
    std: jnp.ndarray

    @property
    def n(self):
        return self.win.shape[1]

    @property
    def n_inputs(self):
        return self.win.shape[2]

    @property
    def n_outputs(self):
        return self.wout.shape[1]

    @property
    def n_speedy(self):
        return self.wout.shape[2] - self.win.shape[1]


@dataclasses.dataclass(frozen=True)
class ESNHyper:
    """Static hyperparameters (mod_reservoir.f90:89-101)."""
    m: int = 6000              # target reservoir size
    deg: int = 6               # average degree of A
    sigma: float = 0.5         # input coupling scale
    leakage: float = 1.0
    beta_res: float = 0.001
    beta_model: float = 1.0
    prior_val: float = 0.0
    noise_mag: float = 0.2
    using_prior: bool = True

    def nodes(self, n_inputs: int) -> int:
        npi = int(round(self.m / n_inputs))
        return npi * n_inputs

    def nnz(self, n: int) -> int:
        return int(self.deg / self.m * n * n)


def radius_by_lat(lat_start: np.ndarray, lat_end: np.ndarray) -> np.ndarray:
    """Spectral radius by latitude band (res_domain.f90:1601-1638).

    Reproduces the reference behavior exactly: max_radius above 45 deg,
    otherwise the constant (max-min)/45 + min (the reference formula has
    no latitude factor; its trained weights saw these values)."""
    highest, rmax, rmin = 45.0, 0.7, 0.3
    smallest = np.minimum(np.abs(lat_start), np.abs(lat_end))
    return np.where(smallest >= highest, rmax, (rmax - rmin) / highest + rmin)


# ----------------------------------------------------------------------
# generation
# ----------------------------------------------------------------------

def _ell_from_perms(key, n: int, k: int, J: int):
    """ELL (cols, mask) replicating makesparse's permutation draws.

    rows and cols are each concatenations of random permutations of 0..n-1
    (plus a partial one); grouping by row index gives degree
    {k//n, k//n+1}.  Returns cols (n, J) int32 and mask (n, J)."""
    counter = k // n
    leftover = k - counter * n
    kr, kc, kl1, kl2 = jax.random.split(key, 4)
    # row indices: `counter` full permutations + `leftover` partial
    rows_full = jnp.concatenate(
        [jax.random.permutation(jax.random.fold_in(kr, i), n)
         for i in range(counter)] +
        ([jax.random.permutation(kl1, n)[:leftover]] if leftover else []))
    cols_full = jnp.concatenate(
        [jax.random.permutation(jax.random.fold_in(kc, i), n)
         for i in range(counter)] +
        ([jax.random.permutation(kl2, n)[:leftover]] if leftover else []))
    # scatter into ELL: position of each entry within its row
    # entries i*n..(i+1)*n-1 are a permutation -> slot i for every row
    slot = jnp.concatenate(
        [jnp.full((n,), i, dtype=jnp.int32) for i in range(counter)] +
        ([jnp.full((leftover,), counter, dtype=jnp.int32)] if leftover else []))
    cols = jnp.zeros((n, J), dtype=jnp.int32)
    mask = jnp.zeros((n, J), dtype=jnp.float32)
    cols = cols.at[rows_full, slot].set(cols_full.astype(jnp.int32))
    mask = mask.at[rows_full, slot].set(1.0)
    return cols, mask


def ell_spmv(vals: jnp.ndarray, cols: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x for batched ELL A. vals/cols (R, n, J); x (R, n) -> (R, n)."""
    gathered = jnp.take_along_axis(x[:, None, :], cols.reshape(x.shape[0], -1)[:, None, :],
                                   axis=2).reshape(cols.shape)
    return jnp.sum(vals * gathered, axis=-1)


def spectral_radius(vals, cols, key, iters: int = 200) -> jnp.ndarray:
    """|lambda_max| of each region's A by batched power iteration."""
    R, n, _ = vals.shape
    v = jax.random.normal(key, (R, n), dtype=vals.dtype)
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)

    def body(i, carry):
        v, lam = carry
        w = ell_spmv(vals, cols, v)
        lam = jnp.linalg.norm(w, axis=1)
        v = w / jnp.maximum(lam[:, None], 1e-30)
        return v, lam

    _, lam = jax.lax.fori_loop(0, iters, body, (v, jnp.ones((R,), vals.dtype)))
    return lam


def generate(key, n_regions: int, n_inputs: int, hyper: ESNHyper,
             radius: np.ndarray | float, dtype=jnp.float32,
             radius_iters: int = 200):
    """Random A (ELL) + Win for all regions (gen_res + the Win fill of
    train_reservoir, mod_reservoir.f90:180-281).

    radius: per-region spectral radius (R,) or scalar.
    Returns (cols, vals, win)."""
    n = hyper.nodes(n_inputs)
    k = hyper.nnz(n)
    J = k // n + (1 if k % n else 0)
    radius = jnp.broadcast_to(jnp.asarray(radius, dtype=dtype), (n_regions,))

    keys = jax.random.split(key, n_regions)

    def gen_one(kr):
        k1, k2 = jax.random.split(kr)
        cols, mask = _ell_from_perms(k1, n, k, J)
        vals = jax.random.uniform(k2, (n, J), dtype=dtype) * mask
        return cols, vals

    cols, vals = jax.vmap(gen_one)(keys)
    lam = spectral_radius(vals, cols, jax.random.fold_in(key, 7),
                          iters=radius_iters)
    vals = vals / lam[:, None, None] * radius[:, None, None]

    # Win: block-diagonal, q = n/n_inputs rows per input, +-sigma uniform
    q = n // n_inputs
    kw = jax.random.fold_in(key, 13)
    ip = jax.random.uniform(kw, (n_regions, n_inputs, q), dtype=dtype,
                            minval=-1.0, maxval=1.0) * hyper.sigma
    win = jnp.zeros((n_regions, n, n_inputs), dtype=dtype)
    rows = (jnp.arange(n_inputs)[:, None] * q + jnp.arange(q)[None, :])
    win = win.at[:, rows, jnp.arange(n_inputs)[:, None]].set(ip)
    return cols, vals, win


# ----------------------------------------------------------------------
# dynamics
# ----------------------------------------------------------------------

def esn_step(res: BatchedReservoir, x: jnp.ndarray, u: jnp.ndarray,
             leakage: float = 1.0) -> jnp.ndarray:
    """x' = (1-l) x + l tanh(A x + Win u); x (R, n), u (R, I)."""
    y = ell_spmv(res.vals, res.cols, x)
    y = y + jnp.einsum("rni,ri->rn", res.win, u)
    xt = jnp.tanh(y)
    if leakage == 1.0:
        return xt
    return (1.0 - leakage) * x + leakage * xt


def quad_expand(x: jnp.ndarray) -> jnp.ndarray:
    """Square every second node (Fortran rows 2:n:2 -> 0-based odd indices)."""
    n = x.shape[-1]
    idx = jnp.arange(n)
    return jnp.where(idx % 2 == 1, x * x, x)


def readout(res: BatchedReservoir, x: jnp.ndarray,
            local_model: jnp.ndarray | None = None) -> jnp.ndarray:
    """outvec = Wout [local_model ; x~]  (predict / predict_ml)."""
    xt = quad_expand(x)
    if local_model is not None:
        aug = jnp.concatenate([local_model, xt], axis=-1)
    else:
        aug = xt
    return jnp.einsum("roa,ra->ro", res.wout, aug)


def synchronize(res: BatchedReservoir, x: jnp.ndarray, inputs: jnp.ndarray,
                leakage: float = 1.0) -> jnp.ndarray:
    """Drive the ESN through inputs (T, R, I) without readout."""
    def body(xc, u):
        return esn_step(res, xc, u, leakage), None
    x, _ = jax.lax.scan(body, x, inputs)
    return x
