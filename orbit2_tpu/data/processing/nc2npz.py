"""Offline netCDF -> npz shard converter (reference
data/processing/nc2npz.py:22-199).

Produces exactly the on-disk layout the data layer consumes:
  <root>/{train,val,test}/<year>_<shard>.npz   arrays [T, 1, H, W] per var
  <root>/normalize_mean.npz / normalize_std.npz  (train-split stats,
      combined across shards by the law of total variance, reference :139-154)
  <root>/{split}/climatology.npz                 [1, H, W] per var
  <root>/lat.npy, lon.npy

Needs xarray + netCDF4 (not in the TPU image) — gated import; run offline.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

from orbit2_tpu.data.processing.era5_constants import (
    CONSTANTS,
    DEFAULT_PRESSURE_LEVELS,
    NAME_TO_VAR,
    PRECIP_VARIABLES,
    PRESSURE_LEVEL_VARS,
)

HOURS_PER_YEAR = 8736  # 364 days, like the reference (:33)


def _require_xarray():
    try:
        import xarray as xr  # noqa: F401

        return xr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "nc2npz needs xarray+netCDF4; run offline where they are installed"
        ) from e


def nc2np(path, variables, years, save_dir, partition, num_shards_per_year,
          precip_accum_hours: int = 6):
    """Convert yearly netCDF files to sharded npz + stats (reference :22-165)."""
    xr = _require_xarray()
    os.makedirs(os.path.join(save_dir, partition), exist_ok=True)

    if partition == "train":
        normalize_mean: Dict[str, List[np.ndarray]] = {}
        normalize_std: Dict[str, List[np.ndarray]] = {}
    climatology: Dict[str, List[np.ndarray]] = {}

    constants_path = os.path.join(path, "constants.nc")
    constants_values = {}
    constants_stats = {}
    if os.path.exists(constants_path):
        constants = xr.open_mfdataset(constants_path, combine="by_coords")
        constant_fields = [v for v in CONSTANTS if v in NAME_TO_VAR and
                           NAME_TO_VAR[v] in constants]
        for f in constant_fields:
            val = constants[NAME_TO_VAR[f]].to_numpy()
            constants_values[f] = val
            # constants MUST appear in normalize_mean/std.npz — the runtime
            # get_normalize indexes them for every non-precip input variable
            # (reference nc2npz.py:43-45)
            constants_stats[f] = (
                np.asarray([val.mean()], dtype=np.float32),
                np.asarray([val.std()], dtype=np.float32),
            )

    for year in years:
        np_vars: Dict[str, np.ndarray] = {}

        for var in variables:
            code = NAME_TO_VAR[var]
            ds = xr.open_mfdataset(
                os.path.join(path, var, f"*{year}*.nc"), combine="by_coords"
            )
            if len(ds[code].shape) == 3:  # surface-level: (T, H, W)
                ds[code] = ds[code].expand_dims("val", axis=1)
                arr = ds[code].to_numpy()
                if var in PRECIP_VARIABLES:
                    # trailing-window accumulation by cumsum difference (no
                    # year-boundary wraparound), then the reference's
                    # log(eps + tp) - log(eps) transform is BAKED INTO the
                    # shards at preprocessing time (reference nc2npz.py:66-71)
                    # — the runtime LogTransform (data/transforms.py) is for
                    # raw-meter precip sources (prism/daymet), not for
                    # nc2npz-produced ERA5 shards.
                    tp_cum = np.cumsum(arr, axis=0)
                    tp_cum[precip_accum_hours:] = (
                        tp_cum[precip_accum_hours:]
                        - tp_cum[:-precip_accum_hours])
                    eps = 0.001
                    arr = np.log(eps + tp_cum) - np.log(eps)
                # trim leap years to the trailing HOURS_PER_YEAR steps
                # (reference nc2npz.py:72-74)
                np_vars[var] = arr.astype(np.float32)[-HOURS_PER_YEAR:]
                _accumulate_stats(partition, var, np_vars[var],
                                  locals().get("normalize_mean"),
                                  locals().get("normalize_std"))
                climatology.setdefault(var, []).append(
                    np_vars[var].mean(axis=0))
            else:  # pressure levels: (T, L, H, W)
                all_levels = ds["level"][:].to_numpy()
                levels = np.intersect1d(all_levels, DEFAULT_PRESSURE_LEVELS)
                for level in levels:
                    ds_level = ds.sel(level=[level])
                    key = f"{var}_{int(level)}"
                    np_vars[key] = ds_level[code].to_numpy().astype(
                        np.float32)[-HOURS_PER_YEAR:]
                    _accumulate_stats(partition, key, np_vars[key],
                                      locals().get("normalize_mean"),
                                      locals().get("normalize_std"))
                    climatology.setdefault(key, []).append(
                        np_vars[key].mean(axis=0))

        # replicate constants over time (reference :38-45)
        t = next(iter(np_vars.values())).shape[0]
        for f, val in constants_values.items():
            np_vars[f] = np.broadcast_to(
                val[None, None], (t, 1) + val.shape
            ).astype(np.float32)

        # shard the year (reference :157)
        # equal shard sizes are load-bearing: per-rank sample-count balance
        # (docs/multihost_data.md) assumes them — mirror the reference's
        # divisibility assert (reference nc2npz.py:155)
        assert t % num_shards_per_year == 0, (
            f"{t} hours per year must divide num_shards={num_shards_per_year}")
        per_shard = t // num_shards_per_year
        for shard_id in range(num_shards_per_year):
            lo = shard_id * per_shard
            hi = lo + per_shard
            np.savez(
                os.path.join(save_dir, partition, f"{year}_{shard_id}.npz"),
                **{k: v[lo:hi] for k, v in np_vars.items()},
            )

    if partition == "train":
        # combine per-year stats via law of total variance (reference :139-154)
        mean_out, std_out = {}, {}
        for var in normalize_mean:
            means = np.stack(normalize_mean[var])
            stds = np.stack(normalize_std[var])
            mean = means.mean(0)
            variance = (stds**2).mean(0) + (means**2).mean(0) - mean**2
            if var in PRECIP_VARIABLES:
                # log-space precip is normalized to zero mean but keeps its
                # measured std (reference nc2npz.py:151-153); the runtime
                # LogTransform branch never reads these stats anyway
                mean_out[var] = np.zeros_like(mean)
            else:
                mean_out[var] = mean
            std_out[var] = np.sqrt(variance)
        for f, (m, s) in constants_stats.items():
            mean_out[f] = m
            std_out[f] = s
        np.savez(os.path.join(save_dir, "normalize_mean.npz"), **mean_out)
        np.savez(os.path.join(save_dir, "normalize_std.npz"), **std_out)

    clim = {k: np.stack(v).mean(0) for k, v in climatology.items()}
    np.savez(os.path.join(save_dir, partition, "climatology.npz"), **clim)


def _accumulate_stats(partition, var, arr, normalize_mean, normalize_std):
    if partition != "train" or normalize_mean is None:
        return
    normalize_mean.setdefault(var, []).append(arr.mean(axis=(0, 2, 3)))
    normalize_std.setdefault(var, []).append(arr.std(axis=(0, 2, 3)))


def convert_nc2npz(root_dir, save_dir, variables, start_train_year,
                   start_val_year, start_test_year, end_year, num_shards):
    """reference :168-199."""
    assert start_val_year > start_train_year
    assert start_test_year > start_val_year
    assert end_year > start_test_year

    xr = _require_xarray()
    splits = {
        "train": range(start_train_year, start_val_year),
        "val": range(start_val_year, start_test_year),
        "test": range(start_test_year, end_year),
    }
    os.makedirs(save_dir, exist_ok=True)
    for partition, years in splits.items():
        nc2np(root_dir, variables, years, save_dir, partition, num_shards)

    # lat/lon from any file (reference :193-199)
    example = None
    for var in variables:
        d = os.path.join(root_dir, var)
        if os.path.isdir(d):
            files = [f for f in os.listdir(d) if f.endswith(".nc")]
            if files:
                example = os.path.join(d, files[0])
                break
    if example:
        ds = xr.open_dataset(example)
        lat_name = "lat" if "lat" in ds else "latitude"
        lon_name = "lon" if "lon" in ds else "longitude"
        np.save(os.path.join(save_dir, "lat.npy"), ds[lat_name].to_numpy())
        np.save(os.path.join(save_dir, "lon.npy"), ds[lon_name].to_numpy())
