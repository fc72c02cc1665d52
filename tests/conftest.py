"""Test harness: 8 virtual CPU devices for mesh/sharding tests.

The reference has no distributed tests at all (SURVEY.md §4); here every
parallelism path is exercised on a fake multi-device CPU backend.
"""

import os

# Force the virtual 8-device CPU backend. The environment's sitecustomize
# registers the axon TPU plugin at interpreter start and pins
# JAX_PLATFORMS=axon, so plain env vars are too late — override via
# jax.config before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() >= 8, "virtual CPU mesh unavailable"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synth_dataset(tmp_path_factory):
    """Synthetic npz-shard dataset in the reference's on-disk format
    (SURVEY.md §2.5): per-split <root>/{train,val,test}/*.npz with arrays
    [T, 1, H, W] per variable, normalize_mean.npz / normalize_std.npz,
    lat.npy / lon.npy, per-split climatology.npz [1, H, W]."""
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(0)

    in_vars = [
        "land_sea_mask", "orography", "lattitude", "landcover",
        "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
    ]
    out_vars = ["total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max"]
    H, W, MAG, T = 16, 32, 4, 8

    def write_split(base, h, w, variables, n_files=2):
        for split in ("train", "val", "test"):
            d = base / split
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_files):
                arrays = {}
                for v in variables:
                    if v == "total_precipitation_24hr":
                        a = rng.gamma(0.3, 0.004, size=(T, 1, h, w))
                    elif v in ("land_sea_mask", "landcover"):
                        a = rng.integers(0, 2, size=(T, 1, h, w)).astype(np.float64)
                    else:
                        a = rng.normal(280, 10, size=(T, 1, h, w))
                    arrays[v] = a.astype(np.float32)
                np.savez(d / f"shard_{i}.npz", **arrays)
            clim = {v: rng.normal(280, 1, size=(1, h, w)).astype(np.float32)
                    for v in variables}
            np.savez(d / "climatology.npz", **clim)
        np.save(base / "lat.npy", np.linspace(-88, 88, h).astype(np.float32))
        np.save(base / "lon.npy", np.linspace(0, 358, w).astype(np.float32))
        np.savez(base / "normalize_mean.npz",
                 **{v: np.array([280.0], dtype=np.float32) for v in variables})
        np.savez(base / "normalize_std.npz",
                 **{v: np.array([10.0], dtype=np.float32) for v in variables})

    low = root / "low"
    high = root / "high"
    write_split(low, H, W, in_vars)
    write_split(high, H * MAG, W * MAG, out_vars)
    return {
        "low": str(low), "high": str(high), "in_vars": in_vars,
        "out_vars": out_vars, "H": H, "W": W, "mag": MAG, "T": T,
    }


@pytest.fixture(scope="session")
def default_vars():
    return (
        "land_sea_mask", "orography", "lattitude", "landcover",
        "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
    )
