"""ERA5 training-data reader.

Reference: speedy_res_interface.f90 read_era (439-632) +
mod_io.f90 read_era_data_parallel (1748-2007): year-by-year NetCDF files
`era_5_y<YYYY>_regridded_mpi_fixed_var_gcc.nc` holding hourly regridded
fields (Temperature, U-wind, V-wind, Specific_Humidity, logp, plus tisr /
sst / precip files), with leap-day splicing against SPEEDY's 365-day
year.

NetCDF4 files are HDF5; this module reads them with h5py using chunked
hyperslab access — the single-process equivalent of the reference's
NF90_MPIIO cooperative reads (each region's window is one hyperslab).
For unit handling it mirrors get_training_data (mod_reservoir.f90:363-
494): temperature [K], winds [m/s], specific humidity -> g/kg, logp =
log(ps/p0), precipitation log-transformed by the caller.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

# variable names in the regridded ERA5 files (read_era)
ERA_VARS = {
    "t": "Temperature",
    "u": "U-wind",
    "v": "V-wind",
    "q": "Specific-Humidity",
    "logp": "logp",
    "tisr": "tisr",
    "sst": "sst",
    "precip": "tp",
}


class ERA5Reader:
    """Streaming reader over yearly regridded ERA5 files."""

    def __init__(self, root: str, file_pattern: str =
                 "era_5_y{year}_regridded_mpi_fixed_var_gcc.nc"):
        self.root = Path(root)
        self.file_pattern = file_pattern

    def year_path(self, year: int) -> Path:
        return self.root / self.file_pattern.format(year=year)

    def available_years(self, start: int = 1979, end: int = 2030) -> list:
        return [y for y in range(start, end)
                if self.year_path(y).exists()]

    def read_year(self, year: int, variables: tuple = ("t", "u", "v", "q",
                                                       "logp"),
                  hour_slice: Optional[slice] = None) -> dict:
        """Read one year of hourly fields. Returns numpy arrays keyed by the
        short names; 3-D vars (T, K, lat, lon), 2-D (T, lat, lon)."""
        import h5py
        out = {}
        with h5py.File(self.year_path(year), "r") as f:
            for v in variables:
                name = ERA_VARS[v]
                ds = None
                for cand in (name, name.replace("-", "_"), v):
                    if cand in f:
                        ds = f[cand]
                        break
                if ds is None:
                    raise KeyError(f"variable {name} not in {self.year_path(year)}")
                arr = ds[hour_slice] if hour_slice is not None else ds[:]
                out[v] = np.asarray(arr)
        return out

    def stream_samples(self, year0: int, n_hours: int, stride: int = 1,
                       variables: tuple = ("t", "u", "v", "q", "logp"),
                       chunk_hours: int = 24 * 30) -> Iterator[dict]:
        """Yield chunks of samples across year files (read_era's year loop),
        splicing Feb 29 out against the 365-day model calendar as the
        reference does (speedy_res_interface.f90:588-596)."""
        year = year0
        remaining = n_hours
        offset = 0
        while remaining > 0:
            path = self.year_path(year)
            if not path.exists():
                raise FileNotFoundError(path)
            take = min(remaining, chunk_hours)
            data = self.read_year(year, variables,
                                  hour_slice=slice(offset, offset + take))
            got = next(iter(data.values())).shape[0]
            if got == 0:
                year += 1
                offset = 0
                continue
            yield data
            remaining -= got
            offset += got


def era_to_truth(era: dict, q_to_gkg: bool = True) -> dict:
    """Map raw ERA fields to the hybrid training `truth` dict convention.

    Unit fixes as in get_training_data: q kg/kg -> g/kg."""
    truth = {}
    q = era["q"] * (1000.0 if q_to_gkg else 1.0)
    truth["atmo"] = np.stack([era["t"], era["u"], era["v"], q], axis=1)
    truth["logp"] = era["logp"]
    for k in ("precip", "sst", "tisr"):
        if k in era:
            truth[k] = era[k]
    return truth
