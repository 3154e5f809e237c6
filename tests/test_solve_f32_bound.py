"""f32 ridge-solve accuracy bound vs an f64 oracle (VERDICT r3 #3).

The production training path solves the normal equations in f32 with
Jacobi preconditioning (esn/train.py:194-260; the reference solves in
real*8 DGESV, mod_reservoir.f90:1233-1332 + mod_linalg.f90:109-151).
This pins the f32 error on a REAL ESN-state Gram (not a synthetic
well-conditioned one): relative readout error must stay below 5e-3 for
beta_res in {0.05, 0.01}.  The full production-shape (A~6000)
measurement is scripts/f32_solve_quant.py -> F32_SOLVE_QUANT.json.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.esn.reservoir import ESNHyper, generate, quad_expand
from speedy_ml_tpu.esn.train import NormalEq, solve_wout
from speedy_ml_tpu.hybrid.chunked import _chunk_accumulators


@pytest.fixture(scope="module")
def real_gram():
    rng = np.random.default_rng(0)
    R, I, T, O, S = 4, 60, 800, 20, 16
    hyper = ESNHyper(m=400, deg=6, noise_mag=0.0, beta_res=0.05)
    cols, vals, win, shifts = generate(jax.random.key(0), R, I, hyper,
                                       np.full(R, 0.6), dtype=jnp.float32)
    n = vals.shape[2]
    adv, acc = _chunk_accumulators(hyper, shifts, I,
                                   cols=None if shifts is not None else cols)
    z = jnp.asarray(rng.normal(0, 1, (T, R, I)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 1, (T, R, O)).astype(np.float32))
    zm = jnp.asarray(rng.normal(0, 1, (T, R, S)).astype(np.float32))
    x = jnp.zeros((R, n), jnp.float32)
    A = S + n
    ss = jnp.zeros((R, A, A), jnp.float32)
    st = jnp.zeros((R, O, A), jnp.float32)
    x = adv(vals, win, x, z[:10])
    x, ss, st = acc(vals, win, x, ss, st, z[10:], tgt[10:], zm[10:])
    aug = np.concatenate([np.asarray(zm[-1], np.float64),
                          np.asarray(quad_expand(x), np.float64)], axis=1)
    return ss, st, S, A, aug


@pytest.mark.parametrize("beta", [0.05, 0.01])
def test_f32_solve_matches_f64_oracle(real_gram, beta):
    ss, st, S, A, aug = real_gram
    hyper = ESNHyper(m=400, deg=6, noise_mag=0.0, beta_res=beta)
    # force the pure-f32 path even under the test suite's x64 mode
    with jax.numpy_dtype_promotion("standard"):
        w32 = np.asarray(solve_wout(NormalEq(ss=ss, st=st), hyper,
                                    n_speedy=S), np.float64)
    ss_h = np.asarray(ss, np.float64)
    st_h = np.asarray(st, np.float64)
    ridge = np.where(np.arange(A) < S, 1.0, beta ** 2)  # using_prior
    w64 = np.stack([np.linalg.solve(ss_h[r] + np.diag(ridge),
                                    st_h[r].T).T for r in range(ss.shape[0])])
    y32 = np.einsum("roa,ra->ro", w32, aug)
    y64 = np.einsum("roa,ra->ro", w64, aug)
    rel = np.linalg.norm(y32 - y64) / np.linalg.norm(y64)
    fro = np.linalg.norm(w32 - w64) / np.linalg.norm(w64)
    assert rel < 5e-3, f"readout rel err {rel}"
    assert fro < 5e-3, f"Wout rel err {fro}"
    assert np.isfinite(w32).all()


def test_bf16_readout_precision_bound():
    """cast_wout_bf16 keeps readout outputs within bf16 rounding of the
    f32 path (f32 accumulator; esn.reservoir.readout)."""
    import dataclasses
    from speedy_ml_tpu.esn.reservoir import BatchedReservoir, readout

    rng = np.random.default_rng(0)
    R, n, O, S = 6, 512, 24, 16
    with jax.numpy_dtype_promotion("standard"):
        wout = jnp.asarray(rng.normal(0, 0.5, (R, O, S + n)), jnp.float32)
        res = BatchedReservoir(
            cols=jnp.zeros((0,), jnp.int32), vals=jnp.zeros((1, R, n),
                                                            jnp.float32),
            win_vals=jnp.zeros((R, n), jnp.float32), wout=wout,
            mean=jnp.zeros((R, 1)), std=jnp.ones((R, 1)), n_in=1,
            shifts=(jnp.zeros((1,), jnp.int32),))
        x = jnp.asarray(rng.normal(0, 1, (R, n)), jnp.float32)
        lm = jnp.asarray(rng.normal(0, 1, (R, S)), jnp.float32)
        y32 = np.asarray(readout(res, x, lm))
        res16 = dataclasses.replace(res, wout=wout.astype(jnp.bfloat16))
        y16 = np.asarray(readout(res16, x, lm))
    assert y16.dtype == np.float32          # f32 accumulator output
    rel = np.linalg.norm(y16 - y32) / np.linalg.norm(y32)
    assert rel < 6e-3, rel                  # ~bf16 rounding, not worse
