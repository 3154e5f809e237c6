"""Prediction driver: the outer loop of a hybrid forecast run.

Reference: parallelmain.f90:142-272 (trained-weight load, prediction
initialization, the timestep loop with sendrecievegrid) — here a thin
Python loop around the jitted cycle, with a streaming output writer
replacing the root-rank NetCDF appends (mpires.f90:499-543).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from speedy_ml_tpu.data.calendar import ModelDate


class PredictionWriter:
    """Streaming 6-hourly output to an .npz series.

    Buffers in host memory and flushes in chunks; one file per run like
    the reference's hybrid_prediction_era...nc.  Base streams are
    atmo/logp/precip/sst; any further diag keys present are written too:
    vp_*/vml_* component contributions (mpires.f90:1114-1514) when
    `hyb.emit_components` is on, and truth_* fields when run_prediction
    gets a truth provider (write_truth_data, mpires.f90:918-1112)."""

    BASE = ("atmo", "logp", "precip", "sst")

    def __init__(self, path: str, flush_every: int = 64):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.buf: dict = {}
        self.flush_every = flush_every
        self.chunks = 0
        self._keys = None
        self._worker = None     # in-flight compression thread

    def append(self, diag: dict, sst_grid):
        rec = {k: diag[k] for k in diag
               if k in self.BASE or k.startswith(("vp_", "vml_", "truth_"))}
        rec["sst"] = sst_grid
        if self._keys is None:
            self._keys = sorted(rec)
            self.buf = {k: [] for k in self._keys}
        for k in self._keys:
            self.buf[k].append(np.asarray(rec[k], dtype=np.float32))
        if len(self.buf[self._keys[0]]) >= self.flush_every:
            self.flush()

    def flush(self, wait: bool = False):
        """Write the buffered chunk asynchronously.

        Compression (zlib, releases the GIL) runs in a worker thread so
        the prediction loop never blocks on it — a multi-year run flushes
        hundreds of ~100 MB chunks (the reference's root rank pays this
        serially in its NetCDF appends, mpires.f90:499-543).  At most one
        flush is in flight; the next joins it first, and consolidate()
        passes wait=True to drain."""
        import threading

        if self._worker is not None:
            self._worker.join()
            self._worker = None
        if self._keys is not None and self.buf[self._keys[0]]:
            out = {k: np.stack(v) for k, v in self.buf.items()}
            path = self.path.with_suffix(f".part{self.chunks}.npz")
            self._worker = threading.Thread(
                target=np.savez_compressed, args=(path,), kwargs=out)
            self._worker.start()
            self.chunks += 1
            self.buf = {k: [] for k in self._keys}
        if wait and self._worker is not None:
            self._worker.join()
            self._worker = None

    def consolidate(self):
        """Merge all parts into one file."""
        self.flush(wait=True)
        parts = sorted(self.path.parent.glob(self.path.stem + ".part*.npz"),
                       key=lambda p: int(p.suffixes[-2][5:]))
        if not parts:
            return
        merged = {}
        for k in np.load(parts[0]).files:
            merged[k] = np.concatenate([np.load(p)[k] for p in parts])
        np.savez_compressed(self.path.with_suffix(".npz"), **merged)
        for p in parts:
            p.unlink()


def run_prediction(hyb, hstate, start_date: ModelDate, n_cycles: int,
                   output_path: str | None = None,
                   stop_if_unsafe: bool = True,
                   timestep_hours: int = 6,
                   sst_bias_per_year: float = 0.0,
                   truth_provider=None,
                   time_mean_path: str | None = None,
                   consolidate: bool = True,
                   progress_every: int = 0):
    """Run `n_cycles` hybrid 6-h cycles from `hstate`.

    Returns (final state, list of dates).  Stops early if the SPEEDY
    safety gate trips (parallelmain.f90:268-270).  sst_bias_per_year:
    non-stationary-climate SST ramp (K/year) applied to climatological
    SST over open water (mod_utilities.f90:1806-1823 ramp +
    current_sst_bias of get_sst_by_date).  truth_provider: optional
    callable cycle_index -> dict of truth grids, written alongside the
    prediction for the verification workflow (write_truth_data,
    mpires.f90:918-1112).  consolidate=False leaves the stream as
    .partN.npz chunk files — REQUIRED for multi-year runs, whose merged
    arrays (e.g. 17 GB of atmo for 20 years) exceed host RAM; analysis
    reads the parts via analysis.iter_prediction_parts."""
    import time as _time

    from speedy_ml_tpu.data.calendar import hour_of_year_365

    writer = PredictionWriter(output_path) if output_path else None
    tmean = None
    if time_mean_path:
        # monthly sigma->p time-mean products alongside the stream
        # (ppo_tminc/ppo_tmout; timemean.py)
        from speedy_ml_tpu.timemean import TimeMeanAccumulator
        tmean = TimeMeanAccumulator(hyb.gcm.geom,
                                    phis=np.asarray(hyb.gcm.bd.phis0))
    date = start_date
    dates = []
    params = hyb.params
    dt = hyb.gcm.dtype
    # the gate is checked EVERY cycle with a one-step lag: bool(prev_safe)
    # only blocks on the already-finished previous cycle, keeping host
    # dispatch pipelined; the cycle itself holds SPEEDY in-graph the moment
    # the gate trips, so the lagged step cannot poison state
    # (parallelmain.f90:268-270 immediate-abort semantics).
    prev_safe = None
    for i in range(n_cycles):
        if stop_if_unsafe and prev_safe is not None and not bool(prev_safe):
            print(f"prediction stopped: SPEEDY safety gate at cycle {i - 1}")
            break
        bias = sst_bias_per_year * (i * timestep_hours) / 8760.0
        hstate, diag = hyb.cycle_with_params(
            params, hstate, jnp.asarray(date.month - 1),
            jnp.asarray(date.tmonth, dtype=dt),
            jnp.asarray(date.tyear, dtype=dt),
            jnp.asarray(hour_of_year_365(date), dtype=jnp.int32),
            jnp.asarray(bias, dtype=dt))
        prev_safe = hstate.safe
        dates.append(date)
        date = date.advance_hours(timestep_hours)
        if writer:
            if truth_provider is not None:
                tr = truth_provider(i)
                diag = dict(diag, **{f"truth_{k}": v for k, v in tr.items()})
            writer.append(diag, hstate.sst_grid)
        if tmean is not None:
            tmean.add(dates[-1], np.asarray(diag["atmo"]),
                      np.asarray(diag["logp"]), np.asarray(diag["precip"]),
                      np.asarray(hstate.sst_grid))
        if progress_every and (i + 1) % progress_every == 0:
            print(f"cycle {i + 1}/{n_cycles} ({date.year}-{date.month:02d}"
                  f"-{date.day:02d}) safe={bool(prev_safe)} "
                  f"t={_time.strftime('%H:%M:%S')}", flush=True)
    if writer:
        if consolidate:
            writer.consolidate()
        else:
            writer.flush(wait=True)
    if tmean is not None:
        tmean.save(time_mean_path)
    return hstate, dates
