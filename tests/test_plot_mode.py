"""`main plot` renders the figure set from a prediction stream via the
CLI dispatch (the reference's scripts/ plotting workflow as one mode)."""

import numpy as np

from speedy_ml_tpu.config import RunConfig
from speedy_ml_tpu.main import main


def test_plot_mode(tmp_path):
    nlat, nlon, nlev, T = 16, 32, 8, 12
    cfg = RunConfig(trunc=10, nlon=nlon, nlat=nlat, n_regions=128,
                    ml_only=True, output_path=str(tmp_path))
    cfg.save(tmp_path / "cfg.json")
    rng = np.random.default_rng(0)
    np.savez_compressed(
        tmp_path / "prediction.npz",
        atmo=280 + rng.normal(0, 5, (T, 4, nlev, nlat, nlon)),
        logp=rng.normal(0, 0.01, (T, nlat, nlon)),
        precip=rng.gamma(0.5, 2.0, (T, nlat, nlon)),
        sst=300 + rng.normal(0, 1, (T, nlat, nlon)))
    assert main(["plot", str(tmp_path / "cfg.json")]) == 0
    figs = sorted(p.name for p in (tmp_path / "figures").glob("*.png"))
    assert figs == ["global_mean_t.png", "precip_extremes.png",
                    "qbo_section.png", "sst_anomaly.png",
                    "zonal_mean_u.png"]   # < 2 years: no ENSO figures
    for p in (tmp_path / "figures").glob("*.png"):
        assert p.stat().st_size > 5000, p
