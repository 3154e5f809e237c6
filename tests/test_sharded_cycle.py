"""Peer-to-peer sharded cycle (hybrid/sharded.py) == replicated path.

The lon-sector shard_map transposition of sendrecievegrid
(mpires.f90:218-780) must reproduce the replicated-grid cycle exactly:
assemble, feedback (through the periodic ppermute lon halo), local
model, and the full cycle end-to-end on the 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speedy_ml_tpu.core import Geometry
from speedy_ml_tpu.hybrid.sharded import ShardedCycleOps
from speedy_ml_tpu.parallel.mesh import make_mesh

NZ = 8


@pytest.fixture(scope="module")
def hyb():
    from speedy_ml_tpu.core.spectral import SpectralTransform
    from speedy_ml_tpu.gcm import GCM
    from speedy_ml_tpu.hybrid.build import build_untrained_hybrid
    from speedy_ml_tpu.physics.boundaries import synthetic_boundary_data

    geom = Geometry(trunc=10, nlon=32, nlat=16, nlev=NZ)
    sht = SpectralTransform(geom, dtype=jnp.float64)
    gcm = GCM(geom, dtype=jnp.float64, bd=synthetic_boundary_data(geom, sht),
              zonal="dft")
    return build_untrained_hybrid(gcm, n_regions=32, m=1400, radius_iters=3)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def rand_outvecs(hyb, key):
    outs = []
    for i, p in enumerate(hyb.packs):
        Rc, O = p.cls.count, p.res.n_outputs
        v = jax.random.normal(jax.random.fold_in(key, i), (Rc, O),
                              dtype=hyb.gcm.dtype)
        # physical-ish values so clamps behave identically
        outs.append(v + 250.0)
    return outs


def test_assemble_matches(hyb, mesh):
    ops = ShardedCycleOps(hyb.layout, hyb.packs, mesh)
    outs = rand_outvecs(hyb, jax.random.PRNGKey(0))
    a0, l0, p0 = hyb.assemble_global(hyb.packs, outs)
    a1, l1, p1 = ops.assemble(hyb.packs, outs, NZ, hyb.gcm.dtype)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), rtol=1e-12)


def test_feedback_and_local_model_match(hyb, mesh):
    ops = ShardedCycleOps(hyb.layout, hyb.packs, mesh)
    g = hyb.gcm.geom
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 6)
    atmo = jax.random.normal(ks[0], (4, NZ, g.nlat, g.nlon), jnp.float64)
    logp = jax.random.normal(ks[1], (g.nlat, g.nlon), jnp.float64)
    precip = jnp.abs(jax.random.normal(ks[2], (g.nlat, g.nlon), jnp.float64))
    sst = 280.0 + jax.random.normal(ks[3], (g.nlat, g.nlon), jnp.float64)
    tisr = jnp.abs(jax.random.normal(ks[4], (g.nlat, g.nlon), jnp.float64))

    fb0 = hyb.build_feedback(hyb.packs, atmo, logp, precip, sst, tisr)
    fb1 = ops.feedback(hyb.packs, atmo, logp, precip, sst, tisr)
    for a, b in zip(fb0, fb1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-12)

    fc_atmo = jax.random.normal(ks[5], (4, NZ, g.nlat, g.nlon), jnp.float64)
    lm0 = hyb.build_local_model(hyb.packs, fc_atmo, logp)
    lm1 = ops.local_model(hyb.packs, fc_atmo, logp, NZ)
    for a, b in zip(lm0, lm1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-12)


def test_full_cycle_matches(hyb, mesh):
    """End-to-end: cycle() with set_mesh == cycle() replicated, from the
    same state, including the SPEEDY window and safety gate."""
    import copy
    args = (jnp.asarray(0), jnp.asarray(0.5, jnp.float64),
            jnp.asarray(0.05, jnp.float64))
    hstate = hyb.init_state(hyb.gcm.bd.sst12[0])
    ref_state, ref_diag = hyb.cycle(hstate, *args)

    hyb2 = copy.copy(hyb)
    hyb2.set_mesh(mesh, shard_gcm=False)
    new_state, diag = hyb2.cycle(hstate, *args)

    np.testing.assert_allclose(np.asarray(diag["atmo"]),
                               np.asarray(ref_diag["atmo"]),
                               rtol=1e-10, atol=1e-11)
    for cs_ref, cs_new in zip(ref_state.classes, new_state.classes):
        np.testing.assert_allclose(np.asarray(cs_new.x),
                                   np.asarray(cs_ref.x),
                                   rtol=1e-10, atol=1e-11)
        np.testing.assert_allclose(np.asarray(cs_new.feedback),
                                   np.asarray(cs_ref.feedback),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(cs_new.local_model),
                                   np.asarray(cs_ref.local_model),
                                   rtol=1e-9, atol=1e-10)


def test_no_grid_allgather_in_feedback_hlo(hyb, mesh):
    """The sharded feedback path must not all-gather the (lat, lon) grid:
    its compiled HLO contains ppermute (collective-permute) but no
    all-gather on grid-shaped operands."""
    ops = ShardedCycleOps(hyb.layout, hyb.packs, mesh)
    g = hyb.gcm.geom

    def fb(atmo, logp, precip, sst, tisr):
        return tuple(ops.feedback(hyb.packs, atmo, logp, precip, sst, tisr))

    from speedy_ml_tpu.hybrid.sharded import lon_sharding
    shards = (lon_sharding(mesh, 4), lon_sharding(mesh, 2),
              lon_sharding(mesh, 2), lon_sharding(mesh, 2),
              lon_sharding(mesh, 2))
    atmo = jax.device_put(jnp.zeros((4, NZ, g.nlat, g.nlon)), shards[0])
    f2 = [jax.device_put(jnp.zeros((g.nlat, g.nlon)), s) for s in shards[1:]]
    compiled = jax.jit(fb).lower(atmo, *f2).compile()
    hlo = compiled.as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo, "grid all-gather in sharded feedback"


def test_spectral_m_sharding_equality(mesh):
    """Tensor parallelism over zonal wavenumber m (SURVEY 2.3 TP row):
    the m-sharded transforms must equal the replicated ones exactly."""
    from speedy_ml_tpu.core.spectral import SpectralTransform
    g = Geometry()
    ref_sht = SpectralTransform(g, dtype=jnp.float64, zonal="dft")
    tp_sht = SpectralTransform(g, dtype=jnp.float64, zonal="dft")
    tp_sht.set_mesh(mesh)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.normal(size=(8, g.nlat, g.nlon)))
    ref = jax.jit(ref_sht.grid_to_spec)(f)
    got = jax.jit(tp_sht.grid_to_spec)(f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)
    gr_ref = jax.jit(lambda v: ref_sht.spec_to_grid(v))(ref)
    gr_got = jax.jit(lambda v: tp_sht.spec_to_grid(v))(got)
    np.testing.assert_allclose(np.asarray(gr_got), np.asarray(gr_ref),
                               rtol=1e-12, atol=1e-14)
    u, v = jax.jit(tp_sht.uv_grid)(ref, ref)
    u0, v0 = jax.jit(ref_sht.uv_grid)(ref, ref)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u0),
                               rtol=1e-11, atol=1e-13)
