"""nc2npz converter parity tests (VERDICT r1 weak #4).

xarray/netCDF4 are not in this image, so a minimal fake-xarray shim backs the
converter with npz files saved under .nc names. The shim implements exactly
the slice of the xarray API nc2npz touches; the converter code under test is
unmodified.

Covers the reference semantics (reference data/processing/nc2npz.py):
  * precip accumulated by cumsum difference — no year-boundary wraparound
    (:66-70), then log(eps + tp) - log(eps) baked into the shards (:71)
  * [-HOURS_PER_YEAR:] leap-year trim (:72-74)
  * constants get normalize_mean/std entries (:43-45) — without them
    IterDataModule.get_normalize KeyErrors on real converter output
  * full round-trip: converter output feeds IterDataModule.setup() + one
    batch, unmodified
"""

import glob as globmod
import os

import numpy as np
import pytest

import orbit2_tpu.data.processing.nc2npz as nc2npz_mod
from orbit2_tpu.data.processing.nc2npz import convert_nc2npz

IN_VARS = ["2m_temperature", "total_precipitation_24hr"]
CONSTS = ["land_sea_mask", "orography", "lattitude"]
H, W = 8, 16
T_RAW = 20          # "leap year": longer than HOURS_PER_YEAR below
HOURS = 16          # patched HOURS_PER_YEAR for the test
ACCUM = 6


class _FakeVar:
    def __init__(self, arr):
        self._arr = np.asarray(arr)

    @property
    def shape(self):
        return self._arr.shape

    def to_numpy(self):
        return self._arr

    def expand_dims(self, name, axis):
        return _FakeVar(np.expand_dims(self._arr, axis))


class _FakeDS:
    def __init__(self, arrays):
        self._d = {k: _FakeVar(v) for k, v in arrays.items()}

    def __getitem__(self, k):
        return self._d[k]

    def __setitem__(self, k, v):
        self._d[k] = v

    def __contains__(self, k):
        return k in self._d


class _FakeXarray:
    """open_mfdataset/open_dataset over npz files saved with .nc names."""

    @staticmethod
    def _load(pattern):
        files = sorted(globmod.glob(pattern)) if any(
            c in pattern for c in "*?[") else [pattern]
        assert files, pattern
        arrays = {}
        for f in files:
            with np.load(f) as z:
                for k in z.files:
                    arrays[k] = z[k]
        return _FakeDS(arrays)

    def open_mfdataset(self, pattern, combine=None, parallel=False):
        return self._load(pattern)

    def open_dataset(self, path):
        return self._load(path)


@pytest.fixture()
def raw_nc_tree(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    root = tmp_path / "raw"
    raw = {}
    for var in IN_VARS:
        d = root / var
        d.mkdir(parents=True)
        for year in (2000, 2001, 2002):
            if "precipitation" in var:
                a = rng.gamma(0.3, 0.001, size=(T_RAW, H, W))
            else:
                a = rng.normal(280, 10, size=(T_RAW, H, W))
            raw[(var, year)] = a.astype(np.float64)
            code = nc2npz_mod.NAME_TO_VAR[var]
            # np.savez appends .npz unless given a file handle
            with open(d / f"era5_{year}.nc", "wb") as fh:
                np.savez(fh, **{
                    code: raw[(var, year)],
                    "lat": np.linspace(-80, 80, H),
                    "lon": np.linspace(0, 350, W),
                })
    consts = {
        "lsm": rng.integers(0, 2, size=(H, W)).astype(np.float64),
        "orography": rng.normal(300, 200, size=(H, W)),
        "lat2d": np.broadcast_to(np.linspace(-80, 80, H)[:, None],
                                 (H, W)).copy(),
    }
    with open(root / "constants.nc", "wb") as fh:
        np.savez(fh, **consts)

    monkeypatch.setattr(nc2npz_mod, "_require_xarray", lambda: _FakeXarray())
    monkeypatch.setattr(nc2npz_mod, "HOURS_PER_YEAR", HOURS)
    return {"root": str(root), "raw": raw, "consts": consts}


@pytest.fixture()
def converted(raw_nc_tree, tmp_path):
    out = tmp_path / "npz"
    convert_nc2npz(raw_nc_tree["root"], str(out), IN_VARS,
                   start_train_year=2000, start_val_year=2001,
                   start_test_year=2002, end_year=2003, num_shards=2)
    return {"out": str(out), **raw_nc_tree}


def _expected_precip(raw_tp):
    """Reference accumulation: trailing cumsum difference + log(eps+x)-log(eps),
    then trim to the last HOURS steps."""
    tp = raw_tp[:, None]  # (T, 1, H, W)
    cum = np.cumsum(tp, axis=0)
    cum[ACCUM:] = cum[ACCUM:] - cum[:-ACCUM]
    eps = 0.001
    return (np.log(eps + cum) - np.log(eps)).astype(np.float32)[-HOURS:]


def test_precip_cumsum_log_and_trim(converted):
    shards = sorted(globmod.glob(os.path.join(converted["out"], "train", "2000_*.npz")))
    assert len(shards) == 2
    got = np.concatenate([np.load(s)["total_precipitation_24hr"] for s in shards])
    want = _expected_precip(converted["raw"][("total_precipitation_24hr", 2000)])
    assert got.shape == (HOURS, 1, H, W)  # leap-year trim applied
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # no wraparound: the first ACCUM-1 steps of the KEPT window accumulate
    # only from within the year (cumsum semantics), never from the year end
    t2m = np.concatenate([np.load(s)["2m_temperature"] for s in shards])
    np.testing.assert_allclose(
        t2m, converted["raw"][("2m_temperature", 2000)][None][0][-HOURS:, None],
        rtol=1e-6)


def test_constants_in_shards_and_stats(converted):
    shard = np.load(os.path.join(converted["out"], "train", "2000_0.npz"))
    for c in CONSTS:
        assert c in shard.files
        assert shard[c].shape == (HOURS // 2, 1, H, W)
    mean = np.load(os.path.join(converted["out"], "normalize_mean.npz"))
    std = np.load(os.path.join(converted["out"], "normalize_std.npz"))
    for c in CONSTS:
        assert c in mean.files and c in std.files, c
    code = {"land_sea_mask": "lsm", "orography": "orography",
            "lattitude": "lat2d"}
    for c in CONSTS:
        np.testing.assert_allclose(
            mean[c], [converted["consts"][code[c]].mean()], rtol=1e-6)
    # precip: zero mean, measured (not unit) std in log space
    np.testing.assert_array_equal(mean["total_precipitation_24hr"], [0.0])
    assert std["total_precipitation_24hr"][0] > 0
    assert not np.isclose(std["total_precipitation_24hr"][0], 1.0)


def test_roundtrip_through_itermodule(converted):
    """The KeyError regression: setup() + get_normalize on REAL converter
    output (constants included, stats not pre-supplied by the fixture)."""
    from orbit2_tpu.data.itermodule import IterDataModule

    in_vars = CONSTS + IN_VARS
    dm = IterDataModule(
        "downscaling", converted["out"], converted["out"], in_vars,
        out_vars=["2m_temperature"], batch_size=2, buffer_size=4,
        num_workers=1,
    )
    dm.setup()
    x, y, iv, ov = next(iter(dm.train_dataloader()))
    assert x.shape[1] == len(in_vars)
    assert np.isfinite(np.asarray(x)).all()
    assert list(ov) == ["2m_temperature"]
