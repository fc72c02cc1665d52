"""ClimateBench (CMIP6) regridding preprocessor (reference
data/processing/climatebench.py): regrid the ClimateBench input/output
netCDFs to a regular ddeg_out grid, expanding the scalar forcings (CO2, CH4)
to spatial fields first.

xESMF is the reference's regridder; it is not in the TPU image, so `regrid`
falls back to bilinear `jax.image.resize` over the regular lat/lon grid —
adequate for the regular ClimateBench grids. Run offline with xesmf installed
for bit-parity with the reference.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np

LIST_SIMU = [
    "hist-GHG.nc", "hist-aer.nc", "historical.nc",
    "ssp126.nc", "ssp370.nc", "ssp585.nc", "ssp245.nc",
]
CONSTANT_VARS = ["CO2", "CH4"]


def output_grid(ddeg_out: float):
    lat = np.arange(-90 + ddeg_out / 2, 90, ddeg_out)
    lon = np.arange(0, 360, ddeg_out)
    return lat, lon


def regrid(ds_in, ddeg_out: float, method: str = "bilinear",
           reuse_weights: bool = True, cmip: bool = False, rename=None):
    """xarray Dataset -> regridded Dataset (reference climatebench.py:47-80).
    Uses xESMF when available, else bilinear resize on the regular grid."""
    import xarray as xr

    if "latitude" in ds_in.coords:
        ds_in = ds_in.rename({"latitude": "lat", "longitude": "lon"})
    if cmip:
        ds_in = ds_in.drop_vars(("lat_bnds", "lon_bnds"), errors="ignore")
        ds_in = ds_in.drop_vars(("plev_bnds", "time_bnds"), errors="ignore")
    if rename is not None:
        ds_in = ds_in.rename({rename[0]: rename[1]})

    lat_out, lon_out = output_grid(ddeg_out)
    try:
        import xesmf as xe

        grid_out = xr.Dataset({"lat": (["lat"], lat_out), "lon": (["lon"], lon_out)})
        regridder = xe.Regridder(ds_in, grid_out, method, periodic=True,
                                 reuse_weights=reuse_weights)
        ds_out = regridder(ds_in, keep_attrs=True).astype("float32")
    except ImportError:
        import jax

        def resize_da(da):
            arr = np.asarray(da)
            out_shape = arr.shape[:-2] + (len(lat_out), len(lon_out))
            return np.asarray(jax.image.resize(arr, out_shape, method="bilinear"))

        data_vars = {}
        for name, da in ds_in.data_vars.items():
            if {"lat", "lon"}.issubset(da.dims):
                dims = [d for d in da.dims if d not in ("lat", "lon")] + ["lat", "lon"]
                da_t = da.transpose(*dims)
                data_vars[name] = (tuple(dims), resize_da(da_t).astype("float32"))
            else:
                data_vars[name] = da
        coords = {k: v for k, v in ds_in.coords.items() if k not in ("lat", "lon")}
        coords["lat"] = lat_out
        coords["lon"] = lon_out
        ds_out = xr.Dataset(data_vars, coords=coords)

    if rename is not None:
        if rename[0] == "zg":
            ds_out["z"] = ds_out["z"] * 9.807
        if rename[0] == "rsdt":
            ds_out["tisr"] = ds_out["tisr"] * 3600
            ds_out = ds_out.isel(time=slice(1, None, 12))
    return ds_out


def process_climatebench(path: str, save_path: str, ddeg_out: float = 5.625):
    """reference climatebench.py:10-44 (click CLI -> function)."""
    import xarray as xr

    os.makedirs(save_path, exist_ok=True)
    files = [p for p in glob(os.path.join(path, "*.nc"))
             if any(s in p for s in LIST_SIMU)]
    for p in files:
        x = xr.open_dataset(p)
        if "input" in p:
            for v in CONSTANT_VARS:
                if v in x:
                    x[v] = x[v].expand_dims(
                        dim={"latitude": 96, "longitude": 144}, axis=(1, 2))
        x_regridded = regrid(x, ddeg_out, reuse_weights=False)
        x_regridded.to_netcdf(os.path.join(save_path, os.path.basename(p)))


if __name__ == "__main__":  # pragma: no cover
    from argparse import ArgumentParser

    ap = ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--ddeg_out", type=float, default=5.625)
    a = ap.parse_args()
    process_climatebench(a.path, a.save_path, a.ddeg_out)
