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
                           high_percentile: float = 0.95, low=None, high=None):
    """x: [T, H, W] raw 2m_temperature -> (masks [T, H, W], low, high).

    Masks are FULL length, zero for the first `time_horizon` steps, and
    mask[i] flags g[i - horizon] (reference era5_extreme.py:96-105:
    air_temp_extreme_mask is zeros_like(air_temp) filled from horizon on) —
    so masks align 1:1 with the data timesteps they gate. Thresholds may be
    passed in (the reference computes them once from a climatology period
    and applies them to every shard)."""
    g = smoothed_rolling_mean(x, time_horizon, window)
    if low is None or high is None:
        low, high = extreme_thresholds(g, low_percentile, high_percentile)
    masks = np.zeros_like(x, dtype=np.float32)
    masks[time_horizon:] = extreme_mask(g[: x.shape[0] - time_horizon],
                                        low, high)
    return masks, low, high


def group_files_by_year(files):
    """Group `<year>_<shard>.npz` paths by year, each group sorted by shard
    index (reference era5_extreme.py:99-113). Files that don't match the
    nc2npz naming (and climatology files) become standalone single-file
    groups so masks are still produced for them."""
    import os
    import re

    groups: dict = {}
    for f in files:
        base = os.path.basename(f)
        if "climatology" in base:
            continue
        m = re.fullmatch(r"(\d{4})_(\d+)\.npz", base)
        if m:
            groups.setdefault(int(m.group(1)), []).append((int(m.group(2)), f))
        else:
            groups[base] = [(0, f)]
    return [[f for _, f in sorted(v)] for _, v in sorted(
        groups.items(), key=lambda kv: str(kv[0]))]


def process_era5_extreme(source_npz: str, target: str,
                         variable="2m_temperature",
                         time_horizon: int = 7 * 24):
    """File-level driver matching the reference semantics
    (era5_extreme.py:96-170): ALL shards of a year are concatenated along
    time BEFORE the rolling mean / mask pass, then split back per shard —
    so shard boundaries never truncate the rolling window or inject extra
    zeroed mask steps. Thresholds come from the TRAIN split's per-year
    smoothed climatology; masks are merged INTO the data shards (every
    original key preserved + `<var>_extreme_mask`), full-length and
    time-aligned."""
    import glob
    import os

    mask_key = f"{variable}_extreme_mask"

    def year_groups(split):
        return group_files_by_year(
            glob.glob(os.path.join(source_npz, split, "*.npz")))

    # pass 1: thresholds over the train split's smoothed means, rolling
    # windows computed per-YEAR over the concatenated shards
    g_all = []
    for files in year_groups("train"):
        xs = []
        for f in files:
            data = np.load(f)
            if variable in data:
                xs.append(data[variable])
        if not xs:
            continue
        x = np.squeeze(np.concatenate(xs, axis=0), axis=1)
        if x.shape[0] > time_horizon:
            g_all.append(smoothed_rolling_mean(x, time_horizon))
    if not g_all:
        raise FileNotFoundError(
            f"no train shards containing {variable!r} under {source_npz}")
    low, high = extreme_thresholds(np.concatenate(g_all, axis=0))

    os.makedirs(target, exist_ok=True)
    for split in ("train", "val", "test"):
        out_dir = os.path.join(target, split)
        os.makedirs(out_dir, exist_ok=True)
        for files in year_groups(split):
            shards = [dict(np.load(f)) for f in files]
            # shards lacking the variable pass through UNCHANGED (skipping
            # the whole year would silently shrink the target dataset);
            # the year's rolling mean concatenates only the shards that
            # carry the variable, in file order
            with_var = [(f, d) for f, d in zip(files, shards)
                        if variable in d]
            for f, d in zip(files, shards):
                if variable not in d:
                    np.savez(os.path.join(out_dir, os.path.basename(f)), **d)
            if not with_var:
                continue
            lengths = [d[variable].shape[0] for _, d in with_var]
            x = np.squeeze(
                np.concatenate([d[variable] for _, d in with_var], axis=0),
                axis=1)
            masks, _, _ = generate_extreme_masks(x, time_horizon,
                                                 low=low, high=high)
            start = 0
            for (f, d), n in zip(with_var, lengths):
                d[mask_key] = masks[start : start + n, None]
                start += n
                np.savez(os.path.join(out_dir, os.path.basename(f)), **d)
    return low, high
