"""Crop ERA5 2m_temperature to the PRISM CONUS box for ERA5->PRISM
downscaling (reference data/processing/era5_cropped.py, 99 LoC): daily-max
resample, per-split {data, mean, std} npz + coords.npz. xarray-gated CLI.
"""

from __future__ import annotations

import glob
import os

import numpy as np

# PRISM spatial bounds (reference era5_cropped.py:45-48)
PRISM_BOTTOM = 24.10
PRISM_TOP = 49.94
PRISM_LEFT = 234.98
PRISM_RIGHT = 293.48
PRISM_START_DATE = "1981-01-01"


def crop_era5_to_prism(source: str, destination: str, train_end: int = 2015,
                       val_end: int = 2016, test_end: int = 2018):
    try:
        import xarray as xr
    except ImportError as e:  # pragma: no cover
        raise ImportError("era5_cropped needs xarray (offline env)") from e

    files = sorted(glob.glob(os.path.join(source, "2m_temperature", "*.nc")))
    xarr = xr.open_mfdataset(files, combine="by_coords")
    os.makedirs(destination, exist_ok=True)

    spans = {
        "train": (PRISM_START_DATE, f"{train_end}-12-31"),
        "val": (f"{train_end + 1}-01-01", f"{val_end}-12-31"),
        "test": (f"{val_end + 1}-01-01", f"{test_end}-12-31"),
    }
    coords_saved = False
    for split, (t0, t1) in spans.items():
        sel = xarr.sel({
            "time": slice(t0, t1),
            "lat": slice(PRISM_BOTTOM, PRISM_TOP),
            "lon": slice(PRISM_LEFT, PRISM_RIGHT),
        }).resample(time="1D").max(dim="time")
        arr = sel["t2m"].data
        np.savez(os.path.join(destination, f"{split}.npz"),
                 data=np.asarray(arr),
                 mean=np.asarray(sel.mean(dim="time")["t2m"].data),
                 std=np.asarray(sel.std(dim="time")["t2m"].data))
        if not coords_saved:
            np.savez(os.path.join(destination, "coords.npz"),
                     lat=sel.lat.data, lon=sel.lon.data)
            coords_saved = True


if __name__ == "__main__":  # pragma: no cover
    from argparse import ArgumentParser

    p = ArgumentParser(description="Crop ERA5 for ERA5->PRISM downscaling")
    p.add_argument("source")
    p.add_argument("destination")
    p.add_argument("--train_end", default=2015, type=int)
    p.add_argument("--val_end", default=2016, type=int)
    p.add_argument("--test_end", default=2018, type=int)
    a = p.parse_args()
    crop_era5_to_prism(a.source, a.destination, a.train_end, a.val_end, a.test_end)
