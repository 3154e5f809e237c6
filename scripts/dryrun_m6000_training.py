"""Scale-real multichip training dryrun (VERDICT r3 #8).

One sharded normal-equation accumulation + ridge solve at the
PRODUCTION reservoir size m=6000 over an 8-virtual-device CPU mesh,
using the region-chunked trainer's inner programs
(hybrid.chunked._chunk_accumulators) with region chunk = 8 regions per
device, and asserting per-device Gram residency: each device holds
exactly its (Rt/n_dev, A, A) Gram shard, never the full (Rt, A, A)
block.

Matches: res_domain.f90:31-62 (region ownership), the chunked normal
equations of mod_reservoir.f90:1559-1699, SURVEY 2.3.

Writes MULTICHIP_M6000.json.  Runtime is dominated by the (64, 6028,
6028) f32 Gram einsum + batched LU on 2 host cores (~10-20 min).
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

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

N_DEV = 8
M = int(os.environ.get("DRYRUN_M", "6000"))
assert len(jax.devices()) >= N_DEV, jax.devices()
mesh = make_mesh(N_DEV)

geom = Geometry()                                   # T30 production grid
layout = RegionLayout(geom, n_regions=1152, overlap=1)
cls = layout.classes[1]                             # interior class
Rt = 8 * N_DEV                                      # 8 regions per device
hyper = ESNHyper(m=M, deg=6, noise_mag=0.0, beta_res=0.05)

I = hyper_inputs(layout, cls, geom.nlev)
xc, yc = cls.core_shape
NVAR = 4
O = NVAR * geom.nlev * xc * yc + 2 * xc * yc
S = O - xc * yc                                     # hybrid model block

mark(f"generating {Rt} reservoirs at m={M} (I={I}, O={O}, S={S})")
lat_s = layout.lat_start[cls.region_ids[:Rt]]
lat_e = layout.lat_end[cls.region_ids[:Rt]]
radius = radius_by_lat(lat_s, lat_e)
cols, vals, win, shifts = generate(jax.random.key(0), Rt, I, hyper, radius,
                                   dtype=jnp.float32, radius_iters=3)
n = vals.shape[2]
A = S + n
mark(f"A = {A}; per-device Gram shard = ({Rt//N_DEV}, {A}, {A}) "
     f"= {Rt//N_DEV*A*A*4/1e9:.2f} GB; full block {Rt*A*A*4/1e9:.2f} GB")

# shard everything region-major over the mesh
shard2 = region_sharding(mesh, 2)
shard3 = region_sharding(mesh, 3)
slot3 = NamedSharding(mesh, P(None, "regions", None))   # vals (J, R, n)
time3 = NamedSharding(mesh, P(None, "regions", None))   # series (C, R, .)
vals = jax.device_put(vals, slot3)
win = jax.device_put(win, shard2)

advance, accumulate = _chunk_accumulators(hyper, shifts, I,
                                          cols=None if shifts is not None
                                          else cols)

C = 2                                              # samples per time chunk
rng = np.random.default_rng(0)
mk = lambda *s: jax.device_put(
    jnp.asarray(rng.normal(0, 0.5, s).astype(np.float32)),
    time3 if len(s) == 3 else shard2)

x = jax.device_put(jnp.zeros((Rt, n), jnp.float32), shard2)
ss = jax.device_put(jnp.zeros((Rt, A, A), jnp.float32), shard3)
st = jax.device_put(jnp.zeros((Rt, O, A), jnp.float32), shard3)

mark("advance (transient discard) over the mesh")
x = advance(vals, win, x, mk(C, Rt, I))
jax.block_until_ready(x)

n_chunks = 2
for c in range(n_chunks):
    mark(f"accumulate chunk {c+1}/{n_chunks} (C={C})")
    x, ss, st = accumulate(vals, win, x, ss, st,
                           mk(C, Rt, I), mk(C, Rt, O), mk(C, Rt, S))
    jax.block_until_ready(ss)
t_acc = time.time() - t0

# --- per-device Gram residency ---
mark("asserting per-device Gram residency")
shards = ss.addressable_shards
assert len(shards) == N_DEV, len(shards)
devices = set()
for sh in shards:
    assert sh.data.shape == (Rt // N_DEV, A, A), sh.data.shape
    devices.add(sh.device)
assert len(devices) == N_DEV, "Gram shards not spread over all devices"
assert ss.sharding.is_equivalent_to(shard3, 3)

mark("sharded ridge solve (shard_map, local per-device LU)")
t1 = time.time()
wout = solve_wout_sharded(NormalEq(ss=ss, st=st), hyper, n_speedy=S,
                          mesh=mesh)
jax.block_until_ready(wout)
t_solve = time.time() - t1
assert wout.shape == (Rt, O, A)
assert bool(jnp.isfinite(wout).all()), "non-finite Wout"
wshards = wout.addressable_shards
assert len({sh.device for sh in wshards}) == N_DEV
assert wshards[0].data.shape == (Rt // N_DEV, O, A)

out = dict(n_devices=N_DEV, m=M, n=int(n), A=int(A), regions=Rt,
           region_chunk_per_device=Rt // N_DEV, I=int(I), O=int(O),
           S=int(S), gram_shard_gb=round(Rt // N_DEV * A * A * 4 / 1e9, 3),
           accumulate_chunks=n_chunks, samples_per_chunk=C,
           wall_accumulate_s=round(t_acc, 1),
           wall_solve_s=round(t_solve, 1),
           wout_finite=True,
           gram_resident_per_device=True,
           platform="cpu-virtual")
with open("/root/repo/MULTICHIP_M6000.json", "w") as f:
    json.dump(out, f, indent=1)
mark("OK " + json.dumps(out))
