"""ESN layer tests: sparse algebra, spectral radius, end-to-end Lorenz-63.

The Lorenz-63 task mirrors the reference's built-in toy
(mod_utilities.f90:1631-1663) and is the canonical ESN check: a trained
reservoir must track the attractor for several Lyapunov times.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.esn.reservoir import (BatchedReservoir, ESNHyper,
                                         ell_spmv, ell_spmv_shift, esn_step,
                                         generate, quad_expand, readout,
                                         spectral_radius, synchronize)
from speedy_ml_tpu.esn.train import (accumulate_batches, discard_transient,
                                     find_closest_divisor, solve_wout,
                                     NormalEq)


def ell_to_dense(vals, cols):
    J, R, n = vals.shape   # slot-major layout
    dense = np.zeros((R, n, n))
    v = np.asarray(vals)
    c = np.asarray(cols)
    if c.ndim == 2:   # shared pattern
        c = np.broadcast_to(c, (R, n, J))
    for r in range(R):
        for i in range(n):
            for j in range(J):
                dense[r, i, c[r, i, j]] += v[j, r, i]
    return dense


def test_ell_spmv_matches_dense():
    key = jax.random.PRNGKey(0)
    hyper = ESNHyper(m=120, deg=6)
    for shared in (True, False):
        cols, vals, win, shifts = generate(key, 3, 12, hyper, radius=0.9,
                                           dtype=jnp.float64,
                                           radius_iters=300,
                                           shared_pattern=shared,
                                           topology="random")
        assert shifts is None
        assert cols.ndim == (2 if shared else 3)
        dense = ell_to_dense(vals, cols)
        x = np.random.default_rng(0).standard_normal((3, vals.shape[2]))
        y = np.asarray(ell_spmv(vals, cols, jnp.asarray(x)))
        y_dense = np.einsum("rij,rj->ri", dense, x)
        np.testing.assert_allclose(y, y_dense, rtol=1e-12)


def test_shift_spmv_matches_dense():
    """The roll-based shift spmv is the same matrix as the cols gather."""
    key = jax.random.PRNGKey(3)
    hyper = ESNHyper(m=120, deg=6)
    cols, vals, win, shifts = generate(key, 3, 12, hyper, radius=0.9,
                                       dtype=jnp.float64, radius_iters=300)
    assert shifts is not None and cols.ndim == 2
    n = vals.shape[2]
    # cols really is (i + s_j) mod n
    expect = (np.arange(n)[:, None] + np.asarray(shifts)[None, :]) % n
    np.testing.assert_array_equal(np.asarray(cols), expect)
    x = np.random.default_rng(0).standard_normal((3, n))
    y_shift = np.asarray(ell_spmv_shift(vals, shifts, jnp.asarray(x)))
    y_gather = np.asarray(ell_spmv(vals, cols, jnp.asarray(x)))
    dense = ell_to_dense(vals, cols)
    y_dense = np.einsum("rij,rj->ri", dense, x)
    np.testing.assert_allclose(y_shift, y_dense, rtol=1e-12)
    np.testing.assert_allclose(y_shift, y_gather, rtol=1e-12)


def test_spectral_radius_scaled():
    key = jax.random.PRNGKey(1)
    hyper = ESNHyper(m=120, deg=6)
    radius = np.array([0.5, 0.9])
    cols, vals, win, _ = generate(key, 2, 12, hyper, radius=radius,
                                  dtype=jnp.float64, radius_iters=500)
    dense = ell_to_dense(vals, cols)
    for r in range(2):
        eigs = np.abs(np.linalg.eigvals(dense[r])).max()
        assert abs(eigs - radius[r]) < 0.05 * radius[r]


def test_sparsity_structure():
    """Row degrees must be near-uniform (permutation draws, makesparse)."""
    key = jax.random.PRNGKey(2)
    hyper = ESNHyper(m=600, deg=6)
    cols, vals, _, _ = generate(key, 1, 60, hyper, radius=0.9,
                                dtype=jnp.float64)
    n = vals.shape[2]
    k_target = hyper.nnz(n)
    nnz = int((np.asarray(vals) != 0).sum())
    # mask collisions can drop a few entries; within 2%
    assert abs(nnz - k_target) <= 0.02 * k_target + 5


def test_quad_expand():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(np.asarray(quad_expand(x)), [1.0, 4.0, 3.0, 16.0])


def test_find_closest_divisor():
    assert find_closest_divisor(1896, 37920) == 1896
    assert find_closest_divisor(7, 100) == 10 or find_closest_divisor(7, 100) == 5


def lorenz63(T, dt=0.02, s=10.0, r=28.0, b=8.0 / 3.0):
    x = np.array([1.0, 1.0, 1.0])
    out = np.zeros((T, 3))
    for t in range(T):
        for _ in range(5):  # substeps for accuracy
            dx = np.array([s * (x[1] - x[0]),
                           x[0] * (r - x[2]) - x[1],
                           x[0] * x[1] - b * x[2]])
            x = x + dt / 5 * dx
        out[t] = x
    return out


@pytest.mark.slow
def test_lorenz63_prediction():
    """Train a 2-region batched ESN on Lorenz-63; must track > 100 steps."""
    data = lorenz63(6000)
    mean, std = data.mean(0), data.std(0)
    z = (data - mean) / std

    R = 2
    hyper = ESNHyper(m=600, deg=6, sigma=0.5, beta_res=1e-4, noise_mag=0.0,
                     using_prior=False)
    key = jax.random.PRNGKey(42)
    cols, vals, win, shifts = generate(key, R, 3, hyper, radius=0.9,
                                       dtype=jnp.float64)
    n = vals.shape[2]

    series = jnp.asarray(np.broadcast_to(z[:, None, :], (len(z), R, 3)))
    res = BatchedReservoir(cols=cols, vals=vals, win_vals=win, n_in=3,
                           wout=jnp.zeros((R, 3, n)),
                           mean=jnp.zeros((R, 3)), std=jnp.ones((R, 3)),
                           shifts=shifts)

    n_discard = 100
    x0 = discard_transient(res, hyper, series[:n_discard])
    # train_in and target are the same series at the same offset: the
    # one-step-ahead pairing happens inside accumulate_batches
    eq, _ = accumulate_batches(res, hyper, series[n_discard:],
                               series[n_discard:], None, x0,
                               batch_size=1000)
    wout = solve_wout(eq, hyper, n_speedy=0)
    res = BatchedReservoir(cols=cols, vals=vals, win_vals=win, n_in=3, wout=wout,
                           mean=res.mean, std=res.std, shifts=shifts)

    # synchronize on held-out segment then free-run: after absorbing input
    # 4499 the readout predicts index 4500
    sync = series[4000:4500]
    x = synchronize(res, jnp.zeros((R, n)), sync)
    truth = np.asarray(series[4500:4700])

    preds = []
    out = readout(res, x)
    preds.append(np.asarray(out))
    for t in range(199):
        x = esn_step(res, x, out, hyper.leakage)
        out = readout(res, x)
        preds.append(np.asarray(out))
    preds = np.stack(preds)

    err = np.abs(preds[:100] - truth[:100]).max(axis=-1)
    # must track the attractor closely for the first ~100 steps (2 time units)
    assert err[:50].max() < 0.5, f"ESN diverged early: {err[:10]}"
    assert np.median(err[:100]) < 1.0


def test_pinv_svd_matches_reference_semantics():
    """pinv_svd (mod_linalg.f90:27-100): exact Moore-Penrose on
    well-conditioned input; small singular values ZEROED (not inverted)."""
    import numpy as np
    from speedy_ml_tpu.esn.train import pinv_svd

    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (7, 5))
    got = np.asarray(pinv_svd(jnp.asarray(a), thres=1e-10))
    np.testing.assert_allclose(got, np.linalg.pinv(a), rtol=1e-8, atol=1e-10)

    # rank-deficient with a small singular value below the threshold:
    # that direction must vanish from the pseudo-inverse
    u, s, vt = np.linalg.svd(a, full_matrices=False)
    s[-1] = 1e-3                                  # below thres=1e-2
    a2 = (u * s) @ vt
    got2 = np.asarray(pinv_svd(jnp.asarray(a2), thres=1e-2))
    want = (vt.T * np.where(s > 1e-2, 1.0 / s, 0.0)) @ u.T
    np.testing.assert_allclose(got2, want, rtol=1e-8, atol=1e-10)
    # batched
    b = rng.normal(0, 1, (3, 6, 4))
    gb = np.asarray(pinv_svd(jnp.asarray(b), thres=1e-12))
    for i in range(3):
        np.testing.assert_allclose(gb[i], np.linalg.pinv(b[i]),
                                   rtol=1e-8, atol=1e-10)
