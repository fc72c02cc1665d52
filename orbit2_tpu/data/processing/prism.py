"""PRISM .bil -> regridded npz processor (reference data/processing/prism.py,
121 LoC): reads PRISM daily .bil rasters, masks the -9999 nodata value,
bilinearly regrids to the target grid, and writes train/val/test npz shards +
coords + mask in the layout the data layer consumes.

Needs rasterio + xESMF offline; the regrid fallback here uses
jax.image.resize when xESMF is absent (adequate for the regular PRISM grid).
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

import numpy as np

NODATA = -9999.0


def read_bil(path: str) -> np.ndarray:
    try:
        import rasterio
    except ImportError as e:  # pragma: no cover
        raise ImportError("rasterio required to read PRISM .bil files") from e
    with rasterio.open(path) as src:
        return src.read(1).astype(np.float32)


def regrid_bilinear(field: np.ndarray, out_shape) -> np.ndarray:
    """Bilinear regrid with nodata masking."""
    import jax
    import jax.numpy as jnp

    mask = field == NODATA
    filled = np.where(mask, 0.0, field)
    weight = (~mask).astype(np.float32)
    f = jax.image.resize(jnp.asarray(filled), out_shape, method="bilinear")
    w = jax.image.resize(jnp.asarray(weight), out_shape, method="bilinear")
    out = np.asarray(f) / np.maximum(np.asarray(w), 1e-6)
    out[np.asarray(w) < 0.5] = NODATA
    return out


def process_prism(
    raw_dir: str,
    save_dir: str,
    variable: str,
    out_shape,
    train_years: Sequence[int],
    val_years: Sequence[int],
    test_years: Sequence[int],
    shards_per_split: int = 4,
):
    """Write <save_dir>/{train,val,test}/*.npz + normalize stats + mask."""
    splits = {"train": train_years, "val": val_years, "test": test_years}
    all_train = []
    for split, years in splits.items():
        os.makedirs(os.path.join(save_dir, split), exist_ok=True)
        fields = []
        for year in years:
            for f in sorted(glob.glob(os.path.join(raw_dir, f"*{year}*.bil"))):
                fields.append(regrid_bilinear(read_bil(f), out_shape))
        if not fields:
            continue
        arr = np.stack(fields)[:, None]  # [T, 1, H, W]
        if split == "train":
            all_train.append(arr)
        per = max(1, len(arr) // shards_per_split)
        for i in range(0, len(arr), per):
            np.savez(os.path.join(save_dir, split, f"shard_{i // per}.npz"),
                     **{variable: arr[i:i + per]})
        clim = arr.mean(axis=0)
        np.savez(os.path.join(save_dir, split, "climatology.npz"),
                 **{variable: clim})

    if all_train:
        t = np.concatenate(all_train)
        valid = t[t != NODATA]
        np.savez(os.path.join(save_dir, "normalize_mean.npz"),
                 **{variable: np.array([valid.mean()], dtype=np.float32)})
        np.savez(os.path.join(save_dir, "normalize_std.npz"),
                 **{variable: np.array([valid.std()], dtype=np.float32)})
        mask = (t[0, 0] != NODATA).astype(np.float32)
        np.save(os.path.join(save_dir, "mask.npy"), mask)
