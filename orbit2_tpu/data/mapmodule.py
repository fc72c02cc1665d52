"""Single-variable ERA5 -> PRISM downscaling module (reference
data/mapmodule.py:17-106 + npzdataset.py:7-49).

Consumes the era5_cropped/prism processed layout: per-split
{data [T,H,W], mean [H,W], std [H,W]} npz + coords.npz + mask.npy. Targets
are padded (2,2,3,3) like the reference collate (mapmodule.py:14) so the
PRISM grid hits a conv-friendly shape; `get_out_mask` returns the matching
padded validity mask for masked losses.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from orbit2_tpu.data.transforms import Normalize

PAD = ((3, 3), (2, 2))  # (lat lo/hi, lon lo/hi) — reference F.pad (2,2,3,3)


class NpzDataset:
    """reference npzdataset.py:7-49 — whole-split arrays with scalar
    (nan-aware) normalization."""

    def __init__(self, npz_in_file, npz_out_file, in_transform=None,
                 out_transform=None):
        with np.load(npz_in_file) as npz:
            self.in_per_pixel_mean = npz["mean"]
            self.in_per_pixel_std = npz["std"]
            self.in_data = npz["data"][:, None]  # [T, 1, H, W]
            self.in_total_mean = float(np.nanmean(npz["data"]))
            self.in_total_std = float(np.nanstd(npz["data"]))
        with np.load(npz_out_file) as npz:
            self.out_per_pixel_mean = npz["mean"]
            self.out_per_pixel_std = npz["std"]
            self.out_data = npz["data"][:, None]
            self.out_total_mean = float(np.nanmean(npz["data"]))
            self.out_total_std = float(np.nanstd(npz["data"]))
        self.in_transform = in_transform or Normalize(
            self.in_total_mean, self.in_total_std)
        self.out_transform = out_transform or Normalize(
            self.out_total_mean, self.out_total_std)
        if len(self.in_data) != len(self.out_data):
            raise RuntimeError("length of input and output data do not match")

    def __len__(self):
        return len(self.in_data)

    def __getitem__(self, i):
        return (self.in_transform(self.in_data[i]),
                self.out_transform(self.out_data[i]))


class ERA5toPRISMDataModule:
    def __init__(self, in_root_dir, out_root_dir, batch_size=32, num_workers=0):
        self.in_root_dir = in_root_dir
        self.out_root_dir = out_root_dir
        self.batch_size = batch_size
        self.out_vars = ["daily_tmax"]

    def setup(self, stage: Optional[str] = None):
        self.train_dataset = NpzDataset(
            os.path.join(self.in_root_dir, "train.npz"),
            os.path.join(self.out_root_dir, "train.npz"))
        self.in_transform = self.train_dataset.in_transform
        self.out_transform = self.train_dataset.out_transform
        self.val_dataset = NpzDataset(
            os.path.join(self.in_root_dir, "val.npz"),
            os.path.join(self.out_root_dir, "val.npz"),
            self.in_transform, self.out_transform)
        self.test_dataset = NpzDataset(
            os.path.join(self.in_root_dir, "test.npz"),
            os.path.join(self.out_root_dir, "test.npz"),
            self.in_transform, self.out_transform)
        self.out_mask = np.load(os.path.join(self.out_root_dir, "mask.npy"))
        with np.load(os.path.join(self.in_root_dir, "coords.npz")) as npz:
            self.in_lat, self.in_lon = npz["lat"], npz["lon"]
        with np.load(os.path.join(self.out_root_dir, "coords.npz")) as npz:
            self.out_lat, self.out_lon = npz["lat"], npz["lon"]

    # ---- protocol -----------------------------------------------------------

    def get_lat_lon(self):
        return self.out_lat, self.out_lon

    def get_data_variables(self):
        return ["daily_tmax"], ["daily_tmax"]

    def get_data_dims(self):
        x, y = self.train_dataset[0]
        y = np.pad(y, ((0, 0),) + PAD)
        return ((self.batch_size,) + x.shape, (self.batch_size,) + y.shape)

    def get_climatology(self, split="train"):
        """Protocol shape is (H, W) per variable (itermodule returns the
        same), padded like the targets/mask so climatology-based metrics
        broadcast against the padded predictions."""
        ds = {"train": self.train_dataset, "val": self.val_dataset,
              "test": self.test_dataset}[split]
        return {"daily_tmax": np.pad(ds.out_per_pixel_mean, PAD)}

    def get_out_transforms(self):
        return {"daily_tmax": self.out_transform}

    def get_out_mask(self):
        return np.pad(self.out_mask, PAD)

    def _loader(self, ds):
        bs = self.batch_size
        for lo in range(0, len(ds), bs):
            xs, ys = [], []
            for i in range(lo, min(lo + bs, len(ds))):
                x, y = ds[i]
                xs.append(x)
                ys.append(np.pad(y, ((0, 0),) + PAD))
            yield (np.stack(xs), np.stack(ys), ["daily_tmax"], ["daily_tmax"])

    def train_dataloader(self):
        return self._loader(self.train_dataset)

    def val_dataloader(self):
        return self._loader(self.val_dataset)

    def test_dataloader(self):
        return self._loader(self.test_dataset)
