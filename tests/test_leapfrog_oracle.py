"""Independent re-derivation oracle for ONE FULL leapfrog step
(VERDICT r4 next-round #5): grtend + hordif + timint are re-derived
here in scalar-loop numpy f64 DIRECTLY from the reference sources
(dyn_grtend.f90:36-279, dyn_step.f90:45-190, ini_indyns.f90:96-112)
and chained with the already-oracled sptend/implic re-derivations
(test_implicit_oracle.py) into a complete `step(2,2,delt2)`, compared
against `DycoreModel.step` on random truncated spectral states.

The raw spherical-harmonic primitives (spec<->grid, uvspec, vdspec,
grad, lap, trunct) are used as trusted building blocks: each is
independently anchored on analytic identities (quadrature exactness,
Laplacian eigenvalues, vor/div<->u,v consistency) in test_spectral.py,
so nothing in this file shares *tendency* code with the framework —
every vertical loop, mean, flux, filter, and damping term is re-derived
from the .f90 with explicit per-level indexing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from test_implicit_oracle import oracle_implic, oracle_sptend, oracle_tables

from speedy_ml_tpu.core import Geometry, PhysicalConstants
from speedy_ml_tpu.core.constants import THD, THDD, THDS, TDRS
from speedy_ml_tpu.dycore.model import DycoreModel
from speedy_ml_tpu.dycore.state import SpectralState

GEOM = Geometry()
C = PhysicalConstants()


@pytest.fixture(scope="module")
def model():
    return DycoreModel(GEOM, C, dtype=jnp.float64)


class Prims:
    """numpy wrappers around the analytic-anchored spectral primitives."""

    def __init__(self, sht):
        self.sht = sht
        self.cosr = np.asarray(sht.cosgr, dtype=np.float64)  # 1/cos(lat)

    def grid(self, v, kcos=1):
        g = np.array(self.sht.spec_to_grid(jnp.asarray(v)))
        if kcos == 2:
            g = g * self.cosr[:, None]
        return g

    def spec(self, g):
        return np.array(self.sht.grid_to_spec(jnp.asarray(g)))

    def uvspec(self, vor, div):
        u, v = self.sht.uvspec(jnp.asarray(vor), jnp.asarray(div))
        return np.array(u), np.array(v)

    def vdspec(self, ug, vg):
        vo, dv = self.sht.vdspec(jnp.asarray(ug), jnp.asarray(vg), kcos=2)
        return np.array(vo), np.array(dv)

    def grad(self, ps):
        px, py = self.sht.grad(jnp.asarray(ps))
        return np.array(px), np.array(py)

    def lap(self, v):
        return np.array(self.sht.lap(jnp.asarray(v)))

    def trunct(self, v):
        return np.array(self.sht.trunct(jnp.asarray(v)))


def oracle_grtend(pr, vor, div, t, ps, tr, tref, tref3, coriol,
                  dhs, dhsr, fsgr):
    """dyn_grtend.f90:36-279 (dynamics only, no phypar), scalar k loops.

    Spectral inputs at the dynamics time level j2; tr has a leading
    tracer axis.  Returns spectral (vordt, divdt, tdt, psdt, trdt).
    """
    kx = vor.shape[0]
    ntr = tr.shape[0]
    nlat, nlon = pr.grid(vor[0]).shape

    vorg = np.zeros((kx, nlat, nlon))
    divg = np.zeros((kx, nlat, nlon))
    tg = np.zeros((kx, nlat, nlon))
    ug = np.zeros((kx, nlat, nlon))
    vg = np.zeros((kx, nlat, nlon))
    trg = np.zeros((ntr, kx, nlat, nlon))
    for k in range(kx):
        vorg[k] = pr.grid(vor[k]) + coriol[:, None]
        divg[k] = pr.grid(div[k])
        tg[k] = pr.grid(t[k])
        for itr in range(ntr):
            trg[itr, k] = pr.grid(tr[itr, k])
        uc, vc = pr.uvspec(vor[k], div[k])
        ug[k] = pr.grid(uc, kcos=2)
        vg[k] = pr.grid(vc, kcos=2)

    umean = np.zeros((nlat, nlon))
    vmean = np.zeros((nlat, nlon))
    dmean = np.zeros((nlat, nlon))
    for k in range(kx):
        umean += ug[k] * dhs[k]
        vmean += vg[k] * dhs[k]
        dmean += divg[k] * dhs[k]

    pxs, pys = pr.grad(ps)
    px = pr.grid(pxs, kcos=2)
    py = pr.grid(pys, kcos=2)
    psdt = pr.spec(-umean * px - vmean * py)
    psdt[0, 0] = 0.0

    puv = np.zeros((kx, nlat, nlon))
    for k in range(kx):
        puv[k] = (ug[k] - umean) * px + (vg[k] - vmean) * py

    sigdt = np.zeros((kx + 1, nlat, nlon))
    sigm = np.zeros((kx + 1, nlat, nlon))
    for k in range(kx):
        sigdt[k + 1] = sigdt[k] - dhs[k] * (puv[k] + divg[k] - dmean)
        sigm[k + 1] = sigm[k] - dhs[k] * puv[k]
    sigdt[kx] = 0.0 * sigdt[kx]          # boundary rows stay zero
    sigm[kx] = 0.0 * sigm[kx]

    tgg = tg - tref[:, None, None]
    rpx = C.rgas * px
    rpy = C.rgas * py

    # zonal wind tendency (dyn_grtend.f90:141-151)
    temp = np.zeros((kx + 1, nlat, nlon))
    for k in range(1, kx):
        temp[k] = sigdt[k] * (ug[k] - ug[k - 1])
    utend = np.zeros((kx, nlat, nlon))
    for k in range(kx):
        utend[k] = vg[k] * vorg[k] - tgg[k] * rpx \
            - (temp[k + 1] + temp[k]) * dhsr[k]

    # meridional wind tendency (:153-163)
    temp[:] = 0.0
    for k in range(1, kx):
        temp[k] = sigdt[k] * (vg[k] - vg[k - 1])
    vtend = np.zeros((kx, nlat, nlon))
    for k in range(kx):
        vtend[k] = -ug[k] * vorg[k] - tgg[k] * rpy \
            - (temp[k + 1] + temp[k]) * dhsr[k]

    # temperature tendency (:165-182)
    temp[:] = 0.0
    for k in range(1, kx):
        temp[k] = sigdt[k] * (tgg[k] - tgg[k - 1]) \
            + sigm[k] * (tref[k] - tref[k - 1])
    ttend = np.zeros((kx, nlat, nlon))
    for k in range(kx):
        ttend[k] = tgg[k] * divg[k] - (temp[k + 1] + temp[k]) * dhsr[k] \
            + fsgr[k] * tgg[k] * (sigdt[k + 1] + sigdt[k]) \
            + tref3[k] * (sigm[k + 1] + sigm[k]) \
            + C.akap * (tg[k] * puv[k] - tgg[k] * dmean)

    # tracer tendency; no vertical advection between the top 3 layers
    # (:187-217, the k=2,3 zeroing with 1-based k)
    trtend = np.zeros((ntr, kx, nlat, nlon))
    for itr in range(ntr):
        temp[:] = 0.0
        for k in range(1, kx):
            temp[k] = sigdt[k] * (trg[itr, k] - trg[itr, k - 1])
        temp[1] = 0.0
        temp[2] = 0.0
        for k in range(kx):
            trtend[itr, k] = trg[itr, k] * divg[k] \
                - (temp[k + 1] + temp[k]) * dhsr[k]

    # grid -> spectral (:233-278)
    vordt = np.zeros_like(vor)
    divdt = np.zeros_like(div)
    tdt = np.zeros_like(t)
    trdt = np.zeros_like(tr)
    for k in range(kx):
        vordt[k], divdt[k] = pr.vdspec(utend[k], vtend[k])
        ke = 0.5 * (ug[k] * ug[k] + vg[k] * vg[k])
        divdt[k] = divdt[k] - pr.lap(pr.spec(ke))
        _, tadv = pr.vdspec(-ug[k] * tgg[k], -vg[k] * tgg[k])
        tdt[k] = tadv + pr.spec(ttend[k])
        for itr in range(ntr):
            _, qadv = pr.vdspec(-ug[k] * trg[itr, k], -vg[k] * trg[itr, k])
            trdt[itr, k] = qadv + pr.spec(trtend[itr, k])
    return vordt, divdt, tdt, psdt, trdt


def oracle_dmp_tables(mx, nx, trunc, dt):
    """Horizontal-diffusion damping tables (ini_indyns.f90:96-112) and
    the implicit factors 1/(1+dmp*dt) (ini_impint: dmp1 build)."""
    hdiff = 1.0 / (THD * 3600.0)
    hdifd = 1.0 / (THDD * 3600.0)
    hdifs = 1.0 / (THDS * 3600.0)
    rlap = 1.0 / float(trunc * (trunc + 1))
    dmp = np.zeros((mx, nx))
    dmpd = np.zeros((mx, nx))
    dmps = np.zeros((mx, nx))
    for j in range(nx):
        for k in range(mx):
            twn = float(k + j)
            elap = twn * (twn + 1.0) * rlap
            dmp[k, j] = hdiff * elap ** 4
            dmpd[k, j] = hdifd * elap ** 4
            dmps[k, j] = hdifs * elap
    return dict(dmp=dmp, dmpd=dmpd, dmps=dmps,
                dmp1=1.0 / (1.0 + dmp * dt),
                dmp1d=1.0 / (1.0 + dmpd * dt),
                dmp1s=1.0 / (1.0 + dmps * dt))


def oracle_hordif(field, fdt, dmp, dmp1):
    """dyn_step.f90:130-151."""
    out = np.array(fdt)
    for k in range(out.shape[0]):
        out[k] = (out[k] - dmp * field[k]) * dmp1
    return out


def oracle_timint(pr, field2, fdt, j1, dt, eps, wil):
    """dyn_step.f90:153-190: trunct + leapfrog + RAW filter.

    field2: (2, ...) complex both time levels; returns the new (2, ...).
    """
    fdt = pr.trunct(fdt)
    old1 = field2[0]
    oldj = field2[j1 - 1]
    fnew = old1 + dt * fdt
    new1 = oldj + wil * eps * (old1 - 2.0 * oldj + fnew)
    new2 = fnew - (1.0 - wil) * eps * (new1 - 2.0 * oldj + fnew)
    return np.stack([new1, new2], axis=0)


def _rand_spec(rng, shape, sht, mag):
    f = rng.normal(0, 1, shape) + 1j * rng.normal(0, 1, shape)
    return np.asarray(sht.trunct(jnp.asarray(f))) * mag


def test_full_leapfrog_step_matches_oracle(model):
    """One filtered leapfrog step (j1=2, j2=2, dt=2*delt, alph=0.5):
    grtend -> sptend -> implic -> hordif(+sdrag+strat) -> timint."""
    rng = np.random.default_rng(7)
    g = GEOM
    kx, mx, nx, ntr = g.nlev, g.mx, g.nx, g.ntracers
    pr = Prims(model.sht)

    hsg = np.asarray(g.half_sigma, dtype=np.float64)
    fsg = 0.5 * (hsg[1:] + hsg[:-1])
    dhs = hsg[1:] - hsg[:-1]
    dhsr = 0.5 / dhs
    fsgr = C.akap / (2.0 * fsg)
    coriol = 2.0 * C.omega * np.asarray(g.sin_lat, dtype=np.float64)
    a = C.rearth
    dt = model.delt2
    tab = oracle_tables(hsg, dt, 0.5, mx, nx, a)
    dtab = oracle_dmp_tables(mx, nx, g.trunc, dt)

    def rs(shape, mag):
        return _rand_spec(rng, shape, model.sht, mag)

    # two distinct time levels, dynamically plausible magnitudes
    vor = np.stack([rs((kx, mx, nx), 2e-5), rs((kx, mx, nx), 2e-5)])
    div = np.stack([rs((kx, mx, nx), 1e-5), rs((kx, mx, nx), 1e-5)])
    t = np.stack([rs((kx, mx, nx), 1.0), rs((kx, mx, nx), 1.0)])
    ps = np.stack([rs((mx, nx), 1e-2), rs((mx, nx), 1e-2)])
    tr = np.stack([rs((ntr, kx, mx, nx), 0.5), rs((ntr, kx, mx, nx), 0.5)])
    phis = rs((mx, nx), 100.0)

    state = SpectralState(vor=jnp.asarray(vor), div=jnp.asarray(div),
                          t=jnp.asarray(t), ps=jnp.asarray(ps),
                          tr=jnp.asarray(tr))

    # ---------------- framework step ----------------
    new_state, _ = model.step(state, jnp.asarray(phis), 2, 2, dt,
                              model.imp_double, physics_fn=None)

    # ---------------- oracle step -------------------
    # 1. grid-point tendencies at j2=2 (our index 1)
    vordt, divdt, tdt, psdt, trdt = oracle_grtend(
        pr, vor[1], div[1], t[1], ps[1], tr[1],
        tab["tref"], tab["tref3"], coriol, dhs, dhsr, fsgr)

    # 2. linear tendencies at time level 1 + implicit correction
    divdt, tdt, psdt = oracle_sptend(
        tab, div[0], t[0], ps[0], phis, divdt, tdt, psdt, a, hsg, fsg)
    divdt, tdt, psdt = oracle_implic(tab, divdt, tdt, psdt)

    # 3. horizontal diffusion (dyn_step.f90:60-106); corrections absent
    vordt = oracle_hordif(vor[0], vordt, dtab["dmp"], dtab["dmp1"])
    divdt = oracle_hordif(div[0], divdt, dtab["dmpd"], dtab["dmp1d"])
    ctmp = t[0].copy()
    tdt = oracle_hordif(ctmp, tdt, dtab["dmp"], dtab["dmp1"])

    sdrag = 1.0 / (TDRS * 3600.0)
    for n in range(nx):
        vordt[0, 0, n] -= sdrag * vor[0, 0, 0, n]
        divdt[0, 0, n] -= sdrag * div[0, 0, 0, n]

    vordt[0:1] = oracle_hordif(vor[0, 0:1], vordt[0:1], dtab["dmps"],
                               dtab["dmp1s"])
    divdt[0:1] = oracle_hordif(div[0, 0:1], divdt[0:1], dtab["dmps"],
                               dtab["dmp1s"])
    tdt[0:1] = oracle_hordif(ctmp[0:1], tdt[0:1], dtab["dmps"],
                             dtab["dmp1s"])

    trdt[0] = oracle_hordif(tr[0, 0], trdt[0], dtab["dmpd"], dtab["dmp1d"])
    for itr in range(1, ntr):
        trdt[itr] = oracle_hordif(tr[0, itr], trdt[itr], dtab["dmp"],
                                  dtab["dmp1"])

    # 4. time integration, filtered leapfrog (j1=2 -> eps=rob)
    eps, wil = model.rob, model.wil
    o_ps = oracle_timint(pr, ps, psdt, 2, dt, eps, wil)
    o_vor = oracle_timint(pr, vor, vordt, 2, dt, eps, wil)
    o_div = oracle_timint(pr, div, divdt, 2, dt, eps, wil)
    o_t = oracle_timint(pr, t, tdt, 2, dt, eps, wil)
    o_tr = np.stack([oracle_timint(pr, tr[:, itr], trdt[itr], 2, dt,
                                   eps, wil) for itr in range(ntr)], axis=1)

    np.testing.assert_allclose(np.asarray(new_state.ps), o_ps,
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(new_state.vor), o_vor,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_state.div), o_div,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_state.t), o_t,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(new_state.tr), o_tr,
                               rtol=1e-9, atol=1e-10)


def test_initial_leapfrog_step_matches_oracle(model):
    """The unfiltered initial leapfrog (j1=1, j2=2, dt=delt, eps=0) used
    by stepone (ini_stepone.f90) — exercises the j1=1 branch of timint."""
    rng = np.random.default_rng(11)
    g = GEOM
    kx, mx, nx, ntr = g.nlev, g.mx, g.nx, g.ntracers
    pr = Prims(model.sht)

    hsg = np.asarray(g.half_sigma, dtype=np.float64)
    fsg = 0.5 * (hsg[1:] + hsg[:-1])
    dhs = hsg[1:] - hsg[:-1]
    dhsr = 0.5 / dhs
    fsgr = C.akap / (2.0 * fsg)
    coriol = 2.0 * C.omega * np.asarray(g.sin_lat, dtype=np.float64)
    dt = model.delt
    tab = oracle_tables(hsg, dt, 0.5, mx, nx, C.rearth)
    dtab = oracle_dmp_tables(mx, nx, g.trunc, dt)

    def rs(shape, mag):
        return _rand_spec(rng, shape, model.sht, mag)

    vor = np.stack([rs((kx, mx, nx), 2e-5)] * 2)
    div = np.stack([rs((kx, mx, nx), 1e-5)] * 2)
    t = np.stack([rs((kx, mx, nx), 1.0)] * 2)
    ps = np.stack([rs((mx, nx), 1e-2)] * 2)
    tr = np.stack([rs((ntr, kx, mx, nx), 0.5)] * 2)
    phis = rs((mx, nx), 100.0)
    state = SpectralState(vor=jnp.asarray(vor), div=jnp.asarray(div),
                          t=jnp.asarray(t), ps=jnp.asarray(ps),
                          tr=jnp.asarray(tr))

    new_state, _ = model.step(state, jnp.asarray(phis), 1, 2, dt,
                              model.imp_full, physics_fn=None)

    vordt, divdt, tdt, psdt, trdt = oracle_grtend(
        pr, vor[1], div[1], t[1], ps[1], tr[1],
        tab["tref"], tab["tref3"], coriol, dhs, dhsr, fsgr)
    divdt, tdt, psdt = oracle_sptend(
        tab, div[0], t[0], ps[0], phis, divdt, tdt, psdt, C.rearth,
        hsg, fsg)
    divdt, tdt, psdt = oracle_implic(tab, divdt, tdt, psdt)
    vordt = oracle_hordif(vor[0], vordt, dtab["dmp"], dtab["dmp1"])
    divdt = oracle_hordif(div[0], divdt, dtab["dmpd"], dtab["dmp1d"])
    tdt = oracle_hordif(t[0], tdt, dtab["dmp"], dtab["dmp1"])
    sdrag = 1.0 / (TDRS * 3600.0)
    vordt[0, 0, :] -= sdrag * vor[0, 0, 0, :]
    divdt[0, 0, :] -= sdrag * div[0, 0, 0, :]
    vordt[0:1] = oracle_hordif(vor[0, 0:1], vordt[0:1], dtab["dmps"],
                               dtab["dmp1s"])
    divdt[0:1] = oracle_hordif(div[0, 0:1], divdt[0:1], dtab["dmps"],
                               dtab["dmp1s"])
    tdt[0:1] = oracle_hordif(t[0, 0:1], tdt[0:1], dtab["dmps"],
                             dtab["dmp1s"])
    trdt[0] = oracle_hordif(tr[0, 0], trdt[0], dtab["dmpd"], dtab["dmp1d"])

    eps, wil = 0.0, model.wil
    o_ps = oracle_timint(pr, ps, psdt, 1, dt, eps, wil)
    o_vor = oracle_timint(pr, vor, vordt, 1, dt, eps, wil)
    o_div = oracle_timint(pr, div, divdt, 1, dt, eps, wil)
    o_t = oracle_timint(pr, t, tdt, 1, dt, eps, wil)
    o_tr = np.stack([oracle_timint(pr, tr[:, itr], trdt[itr], 1, dt,
                                   eps, wil) for itr in range(ntr)], axis=1)

    np.testing.assert_allclose(np.asarray(new_state.ps), o_ps,
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(new_state.vor), o_vor,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_state.div), o_div,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_state.t), o_t,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(new_state.tr), o_tr,
                               rtol=1e-9, atol=1e-10)
