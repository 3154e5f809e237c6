"""Scale-real multichip training: the FULL 1,152-region pass at m=6000
sharded over the 8-device mesh (VERDICT r4 next-round #6).

Extends the 64-region residency dryrun (dryrun_m6000_training.py /
MULTICHIP_M6000.json) to the whole production layout: every region of
every halo class is trained — generate, transient advance, chunked
normal-equation accumulation, per-device Gram-residency assertion, and
the shard_map ridge solve — in sequential 64-region chunks (8 regions
resident per device at a time, 18 chunks), exactly the plan the M6000
dryrun implied.  A region-chunked slab-ocean Gram pass (m=4000, the
production slab config; commit 6a4a954 path) is included.

Matches: res_domain.f90:31-62 (region ownership), the chunked normal
equations of mod_reservoir.f90:1559-1699, mod_slab_ocean_reservoir.f90
training, SURVEY 2.3.

Writes MULTICHIP_TRAIN_FULL.json with per-device peak Gram residency,
peak host RSS, and wall-clock per stage.  Run niced: the two host
cores make the 1,152 LU solves (A~5900) the dominant cost.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jax.sharding import NamedSharding, PartitionSpec as P

from speedy_ml_tpu.core.geometry import Geometry
from speedy_ml_tpu.esn.domain import RegionLayout
from speedy_ml_tpu.esn.reservoir import ESNHyper, generate, radius_by_lat
from speedy_ml_tpu.esn.train import NormalEq, solve_wout_sharded
from speedy_ml_tpu.hybrid.chunked import _chunk_accumulators, hyper_inputs
from speedy_ml_tpu.parallel.mesh import make_mesh, region_sharding

t0 = time.time()
mark = lambda m: print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / 1e6
    return -1.0


N_DEV = 8
M = int(os.environ.get("FULL_M", "6000"))
M_OCEAN = int(os.environ.get("FULL_M_OCEAN", "4000"))
CHUNK = 8 * N_DEV                       # 64 regions resident at a time
assert len(jax.devices()) >= N_DEV, jax.devices()
mesh = make_mesh(N_DEV)

geom = Geometry()                       # T30 production grid
layout = RegionLayout(geom, n_regions=1152, overlap=1)
hyper = ESNHyper(m=M, deg=6, noise_mag=0.0, beta_res=0.05)

shard2 = region_sharding(mesh, 2)
shard3 = region_sharding(mesh, 3)
slot3 = NamedSharding(mesh, P(None, "regions", None))

rng = np.random.default_rng(0)
peak_rss = 0.0
chunks_log = []
total_regions = 0
t_acc_total = 0.0
t_solve_total = 0.0


def run_chunk(rids, lat_s, lat_e, I, O, S, hyp, key, label):
    """One 64-region resident pass: generate -> advance -> accumulate ->
    residency assert -> sharded solve.  Returns (A, gram_shard_gb,
    t_acc, t_solve)."""
    global peak_rss
    Rt = len(rids)
    radius = radius_by_lat(lat_s, lat_e)
    cols, vals, win, shifts = generate(key, Rt, I, hyp, radius,
                                       dtype=jnp.float32, radius_iters=3)
    n = vals.shape[2]
    A = S + n
    vals = jax.device_put(vals, slot3)
    win = jax.device_put(win, shard2)
    advance, accumulate = _chunk_accumulators(
        hyp, shifts, I, cols=None if shifts is not None else cols)

    C = 4
    time3 = NamedSharding(mesh, P(None, "regions", None))
    mk = lambda *s: jax.device_put(
        jnp.asarray(rng.normal(0, 0.5, s).astype(np.float32)),
        time3 if len(s) == 3 else shard2)

    x = jax.device_put(jnp.zeros((Rt, n), jnp.float32), shard2)
    ss = jax.device_put(jnp.zeros((Rt, A, A), jnp.float32), shard3)
    st = jax.device_put(jnp.zeros((Rt, O, A), jnp.float32), shard3)

    t1 = time.time()
    x = advance(vals, win, x, mk(C, Rt, I))
    for _ in range(2):
        x, ss, st = accumulate(vals, win, x, ss, st,
                               mk(C, Rt, I), mk(C, Rt, O),
                               mk(C, Rt, S) if S > 0 else None)
    jax.block_until_ready(ss)
    t_acc = time.time() - t1

    # per-device Gram residency: each device owns exactly its shard
    shards = ss.addressable_shards
    assert len(shards) == N_DEV
    assert all(sh.data.shape == (Rt // N_DEV, A, A) for sh in shards)
    assert len({sh.device for sh in shards}) == N_DEV
    gram_gb = Rt // N_DEV * A * A * 4 / 1e9

    t1 = time.time()
    wout = solve_wout_sharded(NormalEq(ss=ss, st=st), hyp, n_speedy=S,
                              mesh=mesh)
    jax.block_until_ready(wout)
    t_solve = time.time() - t1
    assert bool(jnp.isfinite(wout).all()), f"non-finite Wout in {label}"
    wshards = wout.addressable_shards
    assert len({sh.device for sh in wshards}) == N_DEV
    peak_rss = max(peak_rss, rss_gb())
    return A, gram_gb, t_acc, t_solve


# ------------------------------------------------- atmosphere, all classes
NVAR = 4
for cls in layout.classes:
    I = hyper_inputs(layout, cls, geom.nlev)
    xc, yc = cls.core_shape
    O = NVAR * geom.nlev * xc * yc + 2 * xc * yc
    S = O - xc * yc
    ids = list(cls.region_ids)
    n_chunks = (len(ids) + CHUNK - 1) // CHUNK
    mark(f"class {cls.name}: {len(ids)} regions (I={I}, O={O}) in "
         f"{n_chunks} chunks of <= {CHUNK}")
    for c in range(n_chunks):
        part = ids[c * CHUNK:(c + 1) * CHUNK]
        real = len(part)
        while len(part) % N_DEV:
            part.append(part[-1])       # pad to the device count only
        rids = np.asarray(part)
        A, gram_gb, t_acc, t_solve = run_chunk(
            rids, layout.lat_start[rids], layout.lat_end[rids], I, O, S,
            hyper, jax.random.key(1000 + 10 * c), f"{cls.name}/{c}")
        total_regions += real
        t_acc_total += t_acc
        t_solve_total += t_solve
        chunks_log.append(dict(cls=cls.name, chunk=c, regions=real,
                               A=int(A), gram_shard_gb=round(gram_gb, 3),
                               acc_s=round(t_acc, 1),
                               solve_s=round(t_solve, 1)))
        mark(f"  chunk {c+1}/{n_chunks}: {real} regions, A={A}, "
             f"acc {t_acc:.0f}s solve {t_solve:.0f}s rss {rss_gb():.1f}GB")

assert total_regions == 1152, total_regions

# ------------------------------------- slab-ocean Gram path (m=4000)
# production slab config: bottom-class regions, region-chunked Gram
# solve (the 6a4a954 production HBM fix made this chunking the default)
import dataclasses

from speedy_ml_tpu.esn.ocean import OCEAN_HYPER, ocean_index_map

ocls = layout.classes[0]
o_ids = list(ocls.region_ids[:CHUNK])
while len(o_ids) % N_DEV:
    o_ids.append(o_ids[-1])
o_rids = np.asarray(o_ids)
o_hyper = dataclasses.replace(OCEAN_HYPER, m=M_OCEAN, noise_mag=0.0,
                              beta_res=0.01)
xc, yc = ocls.core_shape
O_o = xc * yc                            # SST-only readout
I_o = int(ocean_index_map(ocls, geom.nlev).shape[0])
mark(f"slab-ocean chunk: {len(o_rids)} regions at m={M_OCEAN} "
     f"(I={I_o}, O={O_o})")
A_o, gram_o, t_acc_o, t_solve_o = run_chunk(
    o_rids, layout.lat_start[o_rids], layout.lat_end[o_rids],
    I_o, O_o, 0, o_hyper, jax.random.key(77), "slab")
mark(f"  slab: A={A_o}, acc {t_acc_o:.0f}s solve {t_solve_o:.0f}s")

out = dict(n_devices=N_DEV, m=M, m_ocean=M_OCEAN,
           regions_total=1152, regions_trained=total_regions,
           chunk_regions=CHUNK, chunks=len(chunks_log),
           region_chunk_per_device=CHUNK // N_DEV,
           gram_shard_gb_max=max(c["gram_shard_gb"] for c in chunks_log),
           gram_resident_per_device=True,
           slab=dict(A=int(A_o), gram_shard_gb=round(gram_o, 3),
                     acc_s=round(t_acc_o, 1), solve_s=round(t_solve_o, 1)),
           wall_accumulate_s=round(t_acc_total, 1),
           wall_solve_s=round(t_solve_total, 1),
           wall_total_s=round(time.time() - t0, 1),
           peak_host_rss_gb=round(peak_rss, 1),
           wout_finite=True, platform="cpu-virtual",
           chunks_detail=chunks_log)
with open("/root/repo/MULTICHIP_TRAIN_FULL.json", "w") as f:
    json.dump(out, f, indent=1)
mark("OK wall_total_s=%.0f solve_s=%.0f peak_rss=%.1fGB"
     % (out["wall_total_s"], t_solve_total, peak_rss))
