"""Independent re-derivation oracle for the semi-implicit core
(VERDICT r3 weak #4): impint tables + geop + sptend + implic are
re-derived here in straight-line scalar-loop numpy f64 DIRECTLY from
the reference sources (ini_impint.f90, ini_indyns.f90:39-91,
dyn_geop.f90, dyn_sptend.f90, dyn_implic.f90) — sharing nothing with
speedy_ml_tpu.dycore except physical constants and the sigma grid —
and compared against the framework's batched implementation on random
truncated spectral states.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speedy_ml_tpu.core import Geometry, PhysicalConstants
from speedy_ml_tpu.dycore.model import DycoreModel
from speedy_ml_tpu.dycore.state import SpectralState

GEOM = Geometry()          # T30: the production truncation
C = PhysicalConstants()
GAMMA = 6.0                # mod_dyncon0.f90:10


def oracle_tables(hsg, dt, alph, mx, nx, a):
    """impint (ini_impint.f90) + indyns vertical tables, scalar loops."""
    kx = len(hsg) - 1
    dhs = np.array([hsg[k + 1] - hsg[k] for k in range(kx)])
    fsg = np.array([0.5 * (hsg[k + 1] + hsg[k]) for k in range(kx)])
    dhsr = np.array([0.5 / dhs[k] for k in range(kx)])
    fsgr = np.array([C.akap / (2.0 * fsg[k]) for k in range(kx)])

    rgam = C.rgas * GAMMA / (1000.0 * C.grav)
    tref = np.array([288.0 * max(0.2, fsg[k]) ** rgam for k in range(kx)])
    tref1 = C.rgas * tref
    tref2 = C.akap * tref
    tref3 = fsgr * tref

    xi = dt * alph
    xxi = xi / (a * a)
    dhsx = xi * dhs
    elz = np.zeros((mx, nx))
    for n in range(1, nx + 1):
        for m in range(1, mx + 1):
            ll = m + n - 2                      # isc=1: mm=m, ll=mm+n-2
            elz[m - 1, n - 1] = float(ll) * float(ll + 1) * xxi

    ya = np.zeros((kx, kx))
    for k in range(kx):
        for k1 in range(kx):
            ya[k, k1] = -C.akap * tref[k] * dhs[k1]

    xa = np.zeros((kx, kx))                     # last column unused (kxm)
    for k in range(1, kx):                      # k=2..kx (1-based)
        xa[k, k - 1] = 0.5 * (C.akap * tref[k] / fsg[k]
                              - (tref[k] - tref[k - 1]) / dhs[k])
    for k in range(kx - 1):                     # k=1..kxm
        xa[k, k] = 0.5 * (C.akap * tref[k] / fsg[k]
                          - (tref[k + 1] - tref[k]) / dhs[k])

    dsum = np.zeros(kx)
    dsum[0] = dhs[0]
    for k in range(1, kx):
        dsum[k] = dsum[k - 1] + dhs[k]
    xb = np.zeros((kx, kx))
    for k in range(kx - 1):
        for k1 in range(kx):
            xb[k, k1] = dhs[k1] * dsum[k]
            if k1 <= k:
                xb[k, k1] -= dhs[k1]

    xc = np.zeros((kx, kx))
    for k in range(kx):
        for k1 in range(kx):
            xc[k, k1] = ya[k, k1]
            for k2 in range(kx - 1):
                xc[k, k1] += xa[k, k2] * xb[k2, k1]

    xd = np.zeros((kx, kx))
    for k in range(kx):
        for k1 in range(k + 1, kx):
            xd[k, k1] = C.rgas * np.log(hsg[k1 + 1] / hsg[k1])
        xd[k, k] = C.rgas * np.log(hsg[k + 1] / fsg[k])

    xe = np.zeros((kx, kx))
    for k in range(kx):
        for k1 in range(kx):
            for k2 in range(kx):
                xe[k, k1] += xd[k, k2] * xc[k2, k1]

    lmax = (mx - 1) + (nx - 1)
    xj = np.zeros((lmax + 1, kx, kx))           # index by ll (1..lmax)
    for l in range(1, lmax + 1):
        xxx = float(l) * float(l + 1) / (a * a)
        xf = np.zeros((kx, kx))
        for k in range(kx):
            for k1 in range(kx):
                xf[k, k1] = xi * xi * xxx * (C.rgas * tref[k] * dhs[k1]
                                             - xe[k, k1])
            xf[k, k] += 1.0
        xj[l] = np.linalg.inv(xf)

    xc = xc * xi
    return dict(dhs=dhs, fsg=fsg, dhsr=dhsr, tref=tref, tref1=tref1,
                tref2=tref2, tref3=tref3, dhsx=dhsx, elz=elz, xc=xc,
                xd=xd, xj=xj, xi=xi)


def oracle_geop(t, phis, hsg, fsg):
    """dyn_geop.f90 scalar translation; t (kx, mx, nx) complex."""
    kx = t.shape[0]
    xgeop1 = np.array([C.rgas * np.log(hsg[k + 1] / fsg[k])
                       for k in range(kx)])
    xgeop2 = np.zeros(kx)
    for k in range(kx - 1):
        xgeop2[k + 1] = C.rgas * np.log(fsg[k + 1] / hsg[k + 1])
    phi = np.zeros_like(t)
    phi[kx - 1] = phis + xgeop1[kx - 1] * t[kx - 1]
    for k in range(kx - 2, -1, -1):
        phi[k] = phi[k + 1] + xgeop2[k + 1] * t[k + 1] + xgeop1[k] * t[k]
    for k in range(1, kx - 1):                  # k=2..kx-1 (1-based)
        corf = (xgeop1[k] * 0.5 * np.log(hsg[k + 1] / fsg[k])
                / np.log(fsg[k + 1] / fsg[k - 1]))
        phi[k, 0, :] += corf * (t[k + 1, 0, :] - t[k - 1, 0, :])
    return phi


def oracle_sptend(tab, div, t, ps, phis, divdt, tdt, psdt, a, hsg, fsg):
    """dyn_sptend.f90 scalar translation."""
    kx, mx, nx = div.shape
    dmeanc = np.zeros((mx, nx), complex)
    for k in range(kx):
        dmeanc += div[k] * tab["dhs"][k]
    psdt = psdt - dmeanc
    psdt[0, 0] = 0.0

    sigdtc = np.zeros((kx + 1, mx, nx), complex)
    for k in range(kx - 1):
        sigdtc[k + 1] = sigdtc[k] - tab["dhs"][k] * (div[k] - dmeanc)

    dumk = np.zeros((kx + 1, mx, nx), complex)
    for k in range(1, kx):                      # k=2..kx
        dumk[k] = sigdtc[k] * (tab["tref"][k] - tab["tref"][k - 1])

    tdt = tdt.copy()
    for k in range(kx):
        tdt[k] = tdt[k] - (dumk[k + 1] + dumk[k]) * tab["dhsr"][k] \
            + tab["tref3"][k] * (sigdtc[k + 1] + sigdtc[k]) \
            - tab["tref2"][k] * dmeanc

    phi = oracle_geop(t, phis, hsg, fsg)
    # lap(x) = -l(l+1)/a^2 x; divdt -= lap(phi + rgas tref ps)
    ll = np.zeros((mx, nx))
    for n in range(nx):
        for m in range(mx):
            ll[m, n] = (m + n) * (m + n + 1)
    divdt = divdt.copy()
    for k in range(kx):
        dum = phi[k] + C.rgas * tab["tref"][k] * ps
        divdt[k] = divdt[k] + dum * ll / (a * a)
    return divdt, tdt, psdt


def oracle_implic(tab, divdt, tdt, psdt):
    """dyn_implic.f90 scalar translation."""
    kx, mx, nx = divdt.shape
    ye = np.zeros_like(tdt)
    for k1 in range(kx):
        for k in range(kx):
            ye[k] += tab["xd"][k, k1] * tdt[k1]
    for k in range(kx):
        ye[k] += tab["tref1"][k] * psdt
    yf = np.zeros_like(divdt)
    for k in range(kx):
        yf[k] = divdt[k] + tab["elz"] * ye[k]
    out = np.zeros_like(divdt)
    for n in range(nx):
        for m in range(mx):
            ll = m + n
            if ll != 0:
                out[:, m, n] = tab["xj"][ll] @ yf[:, m, n]
    psdt = psdt.copy()
    for k in range(kx):
        psdt = psdt - out[k] * tab["dhsx"][k]
    tdt = tdt.copy()
    for k in range(kx):
        for k1 in range(kx):
            tdt[k] += tab["xc"][k, k1] * out[k1]
    return out, tdt, psdt


@pytest.fixture(scope="module")
def model():
    return DycoreModel(GEOM, C, dtype=jnp.float64)


def _rand_spec(rng, shape, sht):
    f = rng.normal(0, 1, shape) + 1j * rng.normal(0, 1, shape)
    return np.asarray(sht.trunct(jnp.asarray(f)))


def test_sptend_plus_implic_match_oracle(model):
    rng = np.random.default_rng(3)
    g = GEOM
    kx, mx, nx = g.nlev, g.mx, g.nx
    hsg = np.asarray(g.half_sigma, dtype=np.float64)
    fsg = 0.5 * (hsg[1:] + hsg[:-1])
    a = C.rearth
    imp = model.imp_double
    tab = oracle_tables(hsg, model.delt2, 0.5, mx, nx, a)

    # table-level agreement first
    np.testing.assert_allclose(np.asarray(imp.tref), tab["tref"],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(imp.xd), tab["xd"],
                               rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(np.asarray(imp.xc), tab["xc"],
                               rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(imp.dhsx), tab["dhsx"],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(imp.elz), tab["elz"],
                               rtol=1e-12, atol=1e-15)

    st = SpectralState.zeros(g, cdtype=jnp.complex128)
    div = _rand_spec(rng, (kx, mx, nx), model.sht) * 1e-5
    t = _rand_spec(rng, (kx, mx, nx), model.sht) * 1.0
    ps = _rand_spec(rng, (mx, nx), model.sht) * 1e-2
    phis = _rand_spec(rng, (mx, nx), model.sht) * 100.0
    state = SpectralState(
        vor=st.vor, tr=st.tr,
        div=jnp.stack([jnp.asarray(div)] * 2),
        t=jnp.stack([jnp.asarray(t)] * 2),
        ps=jnp.stack([jnp.asarray(ps)] * 2))

    divdt0 = _rand_spec(rng, (kx, mx, nx), model.sht) * 1e-6
    tdt0 = _rand_spec(rng, (kx, mx, nx), model.sht) * 1e-4
    psdt0 = _rand_spec(rng, (mx, nx), model.sht) * 1e-6

    # --- sptend ---
    d1, t1, p1 = model.sptend(state, 0, imp, jnp.asarray(phis),
                              jnp.asarray(divdt0), jnp.asarray(tdt0),
                              jnp.asarray(psdt0))
    od, ot, op = oracle_sptend(tab, div, t, ps, phis, divdt0, tdt0,
                               psdt0, a, hsg, fsg)
    np.testing.assert_allclose(np.asarray(t1), ot, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p1), op, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), od, rtol=1e-8, atol=1e-9)

    # --- implic on the sptend output ---
    d2, t2, p2 = model.implicit_correction(imp, d1, t1, p1)
    od2, ot2, op2 = oracle_implic(tab, od, ot, op)
    np.testing.assert_allclose(np.asarray(d2), od2, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(t2), ot2, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p2), op2, rtol=1e-8, atol=1e-10)
