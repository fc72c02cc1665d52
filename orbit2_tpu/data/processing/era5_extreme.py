"""Extreme-temperature mask generation (reference
data/processing/era5_extreme.py, 201 LoC).

Pipeline: 7-day (168h) rolling mean of 2m_temperature -> 9-point spatially
smoothed field (center x4, edges x1, corners x0.25, /9) -> per-pixel
5%/95% climatological percentiles -> binary masks marking timesteps outside
them (`2m_temperature_extreme_mask`, consumed by the collate's mask branch,
itermodule collate reference :459-488).

Core math is pure numpy (testable); only the optional nc loading is gated.
"""

from __future__ import annotations

import numpy as np


def smoothed_rolling_mean(x: np.ndarray, time_horizon: int = 7 * 24,
                          window: int = 1) -> np.ndarray:
    """x: [T, H, W] -> [(T - horizon)//window, H, W] of spatially smoothed
    rolling means (reference era5_extreme.py:59-82)."""
    means = []
    for i in range(time_horizon, x.shape[0], window):
        means.append(x[i - time_horizon : i].mean(axis=0))
    m = np.stack(means)

    l = np.roll(m, 1, -1)
    r = np.roll(m, -1, -1)
    d = np.roll(m, 1, -2)
    u = np.roll(m, -1, -2)
    ld = np.roll(l, 1, -2)
    lu = np.roll(l, -1, -2)
    rd = np.roll(r, 1, -2)
    ru = np.roll(r, -1, -2)
    g = 4 * m + (l + r + d + u) + 0.25 * (ld + lu + rd + ru)
    return g / 9.0


def extreme_thresholds(g: np.ndarray, low_percentile: float = 0.05,
                       high_percentile: float = 0.95):
    """Per-pixel low/high thresholds over the climatology dimension
    (reference :84-92)."""
    s = np.sort(g, axis=0)
    low = s[int(low_percentile * g.shape[0])]
    high = s[int(high_percentile * g.shape[0])]
    return low, high


def extreme_mask(g: np.ndarray, low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """1 where the smoothed mean is outside [low, high] (extreme event)."""
    return ((g < low) | (g > high)).astype(np.float32)


def generate_extreme_masks(x: np.ndarray, time_horizon: int = 7 * 24,
                           window: int = 1, low_percentile: float = 0.05,
                           high_percentile: float = 0.95):
    """x: [T, H, W] raw 2m_temperature -> (masks [T', H, W], low, high)."""
    g = smoothed_rolling_mean(x, time_horizon, window)
    low, high = extreme_thresholds(g, low_percentile, high_percentile)
    return extreme_mask(g, low, high), low, high


def process_era5_extreme(source_npz: str, target: str, variable="t2m",
                         time_horizon: int = 7 * 24):  # pragma: no cover
    """File-level driver matching the reference CLI shape."""
    import glob
    import os

    os.makedirs(target, exist_ok=True)
    for split in ("train", "val", "test"):
        out_dir = os.path.join(target, split)
        os.makedirs(out_dir, exist_ok=True)
        for f in sorted(glob.glob(os.path.join(source_npz, split, "*.npz"))):
            data = np.load(f)
            if variable not in data:
                continue
            x = np.squeeze(data[variable], axis=1)
            masks, low, high = generate_extreme_masks(x, time_horizon)
            np.savez(os.path.join(out_dir, os.path.basename(f)),
                     **{"2m_temperature_extreme_mask": masks[:, None]})
