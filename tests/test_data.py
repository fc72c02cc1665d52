"""Data layer tests: tiling round-trip, shard coverage, LogTransform
semantics, collate shapes, data module protocol."""

import numpy as np
import pytest

from orbit2_tpu.data import (
    BatchLoader,
    IterDataModule,
    LogTransform,
    Normalize,
    NpyReader,
    Downscale,
    halo_lrtb,
    tile_shapes,
    tile_slices,
)


def test_halo_even_odd():
    # even overlap: symmetric, lon = 2x lat (reference iterdataset.py:112-119)
    assert halo_lrtb(4) == (4, 4, 2, 2)
    # odd overlap: right/bottom take the extra
    assert halo_lrtb(3) == (2, 4, 1, 2)
    assert halo_lrtb(0) == (0, 0, 0, 0)


@pytest.mark.parametrize("div,overlap", [(2, 2), (4, 3), (2, 0)])
def test_tile_slices_cover_and_shape(div, overlap):
    yinp, xinp, mag = 32, 64, 4
    yout, xout = yinp * mag, xinp * mag
    tiles = tile_slices(div, overlap, yinp, xinp, yout, xout)
    assert len(tiles) == div * div
    (hgt, wid), (out_h, out_w) = tile_shapes(div, overlap, yinp, xinp, yout, xout)
    # every tile has the same shape (edge tiles borrow halo inward)
    for t in tiles:
        assert t.yi[1] - t.yi[0] == hgt
        assert t.xi[1] - t.xi[0] == wid
        assert t.yo[1] - t.yo[0] == out_h
        assert t.xo[1] - t.xo[0] == out_w
        assert 0 <= t.yi[0] and t.yi[1] <= yinp
        assert 0 <= t.xi[0] and t.xi[1] <= xinp
    # interior (non-halo) regions tile the full image exactly once
    cover = np.zeros((yinp, xinp), dtype=int)
    for t in tiles:
        y0 = yinp // div * t.vindex
        y1 = yinp // div * (t.vindex + 1)
        x0 = xinp // div * t.hindex
        x1 = xinp // div * (t.hindex + 1)
        cover[y0:y1, x0:x1] += 1
    assert (cover == 1).all()


def test_tile_stitch_roundtrip():
    """Cropping each tile's halo and stitching reproduces the original —
    the invariant behind stitched inference (reference visualize.py:125-311)."""
    div, overlap, mag = 2, 2, 2
    yinp, xinp = 16, 32
    yout, xout = yinp * mag, xinp * mag
    rng = np.random.default_rng(0)
    img = rng.normal(size=(yout, xout))
    left, right, top, bottom = halo_lrtb(overlap)
    stitched = np.zeros_like(img)
    for t in tile_slices(div, overlap, yinp, xinp, yout, xout):
        tile = img[t.yo[0]:t.yo[1], t.xo[0]:t.xo[1]]
        # crop the halo back off in output pixels
        ct = (0 if t.vindex == 0 else top * mag)
        cb = tile.shape[0] - (0 if t.vindex == div - 1 else bottom * mag)
        cl = (0 if t.hindex == 0 else left * mag)
        cr = tile.shape[1] - (0 if t.hindex == div - 1 else right * mag)
        core = tile[ct:cb, cl:cr]
        y0 = yout // div * t.vindex
        x0 = xout // div * t.hindex
        # edge tiles borrow halo inward -> their core extends past the grid
        # cell; align by the tile's absolute output origin + crop offset
        stitched[t.yo[0] + ct : t.yo[0] + cb, t.xo[0] + cl : t.xo[0] + cr] = core
    np.testing.assert_allclose(stitched, img)


def test_log_transform_reference_semantics():
    """m -> mm, <=0.25 mm/day -> 0, log1p (reference precipmodule.py:31-40)."""
    lt = LogTransform()
    x = np.array([0.0, 0.0002, 0.00025, 0.0003, 0.01], dtype=np.float32)  # meters
    got = lt(x)
    want = np.log1p(np.where(x * 1000 <= 0.25, 0.0, x * 1000))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # inverse round-trips above threshold
    np.testing.assert_allclose(lt.inverse(got[3:]), x[3:], rtol=1e-5)


def test_normalize():
    n = Normalize(np.array([280.0]), np.array([10.0]))
    np.testing.assert_allclose(n(np.array([290.0])), [1.0])


def _reader(ds, rank=0, size=1, div=1, overlap=0, shuffle=False):
    import glob, os

    inp = sorted(glob.glob(os.path.join(ds["low"], "train", "*.npz")))
    out = sorted(glob.glob(os.path.join(ds["high"], "train", "*.npz")))
    return NpyReader(inp, out, ds["in_vars"], ds["out_vars"],
                     data_par_size=size, data_par_rank=rank,
                     div=div, overlap=overlap, shuffle=shuffle)


def test_reader_yields_expected_shapes(synth_dataset):
    ds = synth_dataset
    r = _reader(ds)
    sample = next(iter(r))
    inp, out, in_vars, out_vars = sample
    assert set(in_vars) == set(ds["in_vars"])
    assert inp[ds["in_vars"][0]].shape == (ds["T"], ds["H"], ds["W"])
    assert out[ds["out_vars"][0]].shape == (ds["T"], ds["H"] * 4, ds["W"] * 4)


def test_reader_sharding_disjoint_and_complete(synth_dataset):
    """Shards across data-par ranks are disjoint and cover all files
    (reference iterdataset.py:52-88, incl. wrap-around when files < shards)."""
    ds = synth_dataset
    seen = []
    for rank in range(4):  # 4 ranks, 2 files -> wrap-around replication
        r = _reader(ds, rank=rank, size=4)
        files = [pair for pair in r._sharded_files()]
        assert len(files) == 1
        seen.extend(f[0] for f in files)
    assert len(set(seen)) == 2  # both files covered


def test_reader_tiling_sample_count(synth_dataset):
    ds = synth_dataset
    r = _reader(ds, div=2, overlap=2)
    samples = list(iter(r))
    assert len(samples) == 2 * 4  # 2 files x div^2 tiles
    (hgt, wid), _ = tile_shapes(2, 2, ds["H"], ds["W"], ds["H"] * 4, ds["W"] * 4)
    assert samples[0][0][ds["in_vars"][0]].shape == (ds["T"], hgt, wid)


def test_itermodule_end_to_end(synth_dataset):
    ds = synth_dataset
    dm = IterDataModule(
        "downscaling", ds["low"], ds["high"], ds["in_vars"], ds["out_vars"],
        batch_size=4, buffer_size=8, subsample=1,
    )
    dm.setup()
    in_size, out_size = dm.get_data_dims()
    assert in_size == (4, len(ds["in_vars"]), ds["H"], ds["W"])
    assert out_size == (4, len(ds["out_vars"]), ds["H"] * 4, ds["W"] * 4)

    batch = next(iter(dm.train_dataloader()))
    x, y, in_vars, out_vars = batch
    assert x.shape == in_size
    assert y.shape == out_size
    assert x.dtype == np.float32
    # normalization applied: temperature fields ~ N(0,1) after (x-280)/10
    t_idx = in_vars.index("2m_temperature_min")
    assert abs(float(x[:, t_idx].mean())) < 1.0
    # precip is log1p(mm) >= 0
    p_idx = in_vars.index("total_precipitation_24hr")
    assert float(x[:, p_idx].min()) >= 0.0

    lat, lon = dm.get_lat_lon()
    assert len(lat) == ds["H"] * 4 and len(lon) == ds["W"] * 4
    clim = dm.get_climatology("val")
    assert set(clim.keys()) == set(ds["out_vars"])
    assert clim[ds["out_vars"][0]].shape == (ds["H"] * 4, ds["W"] * 4)


def test_batchloader_drop_last(synth_dataset):
    ds = synth_dataset
    dm = IterDataModule(
        "downscaling", ds["low"], ds["high"], ds["in_vars"], ds["out_vars"],
        batch_size=5, buffer_size=4, drop_last=True,
    )
    dm.setup()
    sizes = [b[0].shape[0] for b in dm.train_dataloader()]
    assert all(s == 5 for s in sizes)


def test_forecasting_task_wrappers(synth_dataset):
    ds = synth_dataset
    dm = IterDataModule(
        "direct-forecasting", ds["low"], ds["low"], ds["in_vars"], ds["out_vars"],
        src="era5", history=2, window=1, pred_range=2, batch_size=3, buffer_size=4,
    )
    dm.setup()
    x, y, in_vars, out_vars = next(iter(dm.train_dataloader()))
    assert x.shape == (3, 2, len(ds["in_vars"]), ds["H"], ds["W"])
    assert y.shape == (3, len(ds["out_vars"]), ds["H"], ds["W"])


def test_era5_to_prism_module(tmp_path):
    """Single-variable map-style module (reference mapmodule.py:17-106):
    per-split whole-array npz, scalar nan-aware normalization, (2,2,3,3)
    target padding, validity mask."""
    import numpy as np
    from orbit2_tpu.data.mapmodule import ERA5toPRISMDataModule

    rng = np.random.default_rng(0)
    for root, shape in (("in", (10, 26, 59)), ("out", (10, 104, 236))):
        d = tmp_path / root
        d.mkdir()
        for split in ("train", "val", "test"):
            data = rng.normal(300, 8, size=shape).astype(np.float32)
            np.savez(d / f"{split}.npz", data=data,
                     mean=data.mean(0), std=data.std(0))
        np.savez(d / "coords.npz",
                 lat=np.linspace(24, 50, shape[1]).astype(np.float32),
                 lon=np.linspace(235, 293, shape[2]).astype(np.float32))
    np.save(tmp_path / "out" / "mask.npy",
            rng.integers(0, 2, size=(104, 236)).astype(np.float32))

    dm = ERA5toPRISMDataModule(str(tmp_path / "in"), str(tmp_path / "out"),
                               batch_size=4)
    dm.setup()
    in_size, out_size = dm.get_data_dims()
    assert in_size == (4, 1, 26, 59)
    assert out_size == (4, 1, 110, 240)  # padded (3,3),(2,2)
    x, y, in_vars, out_vars = next(iter(dm.train_dataloader()))
    assert x.shape == in_size and y.shape == out_size
    assert in_vars == ["daily_tmax"]
    assert abs(float(x.mean())) < 0.3  # normalized
    assert dm.get_out_mask().shape == (110, 240)
    clim = dm.get_climatology("val")
    # protocol shape: (H, W) per variable, padded like targets/mask so
    # climatology-based metrics broadcast against padded predictions
    assert clim["daily_tmax"].shape == (110, 240)


def test_batchloader_early_break_stops_producer(synth_dataset):
    """Breaking out of a BatchLoader epoch must terminate the producer
    thread (no thread leak across curriculum epochs)."""
    import threading

    ds = synth_dataset
    dm = IterDataModule(
        "downscaling", ds["low"], ds["high"], ds["in_vars"], ds["out_vars"],
        batch_size=2, buffer_size=4,
    )
    dm.setup()
    before = threading.active_count()
    for _ in range(5):
        for batch in dm.train_dataloader():
            break  # early exit every epoch
    import time

    time.sleep(0.5)
    after = threading.active_count()
    assert after <= before + 1


def _many_shard_dataset(tmp_path, n_files=8, T=4, H=8, W=16, mag=2):
    """A split with enough files that 4 data-par ranks get disjoint shards."""
    rng = np.random.default_rng(7)
    in_vars = ["a", "b"]
    roots = {}
    for name, h, w in (("low", H, W), ("high", H * mag, W * mag)):
        root = tmp_path / name
        d = root / "train"
        d.mkdir(parents=True)
        for i in range(n_files):
            np.savez(d / f"s{i}.npz", **{
                v: rng.normal(size=(T, 1, h, w)).astype(np.float32)
                for v in in_vars})
        np.savez(d / "climatology.npz", **{
            v: np.zeros((1, h, w), np.float32) for v in in_vars})
        np.save(root / "lat.npy", np.linspace(-80, 80, h).astype(np.float32))
        np.save(root / "lon.npy", np.linspace(0, 350, w).astype(np.float32))
        np.savez(root / "normalize_mean.npz",
                 **{v: np.zeros(1, np.float32) for v in in_vars})
        np.savez(root / "normalize_std.npz",
                 **{v: np.ones(1, np.float32) for v in in_vars})
        roots[name] = root
    return roots, in_vars


def test_multihost_shuffled_file_sharding_disjoint(tmp_path):
    """With shuffle=True and the SAME seed on every rank (the trainer wires
    config.trainer.seed identically to all processes), the global file
    permutation is consistent: 4 ranks' shards stay disjoint and complete —
    the equivalence contract vs the reference's global DistributedSampler
    (reference dist/distdataset.py:180-192; see docs/multihost_data.md)."""
    import glob as g
    import random as pyrandom

    roots, in_vars = _many_shard_dataset(tmp_path)
    inp = sorted(g.glob(str(roots["low"] / "train" / "*.npz")))
    out = sorted(g.glob(str(roots["high"] / "train" / "*.npz")))

    per_rank = []
    for rank in range(4):
        r = NpyReader(inp, out, in_vars, in_vars, data_par_size=4,
                      data_par_rank=rank, shuffle=True,
                      rng=pyrandom.Random(42))
        per_rank.append([p[0] for p in r._sharded_files()])
    flat = [f for files in per_rank for f in files]
    assert len(flat) == len(set(flat)) == 8  # disjoint AND complete
    assert all(len(files) == 2 for files in per_rank)  # balanced


def test_multihost_epoch_reshuffle_stays_consistent(tmp_path):
    """Epoch 2 re-permutes files; all ranks must agree on the permutation
    even after epoch 1 consumed per-rank buffer-shuffle randomness (the rng
    is NOT shared with the buffer shuffle)."""
    roots, in_vars = _many_shard_dataset(tmp_path)

    def rank_files_by_epoch(rank, epochs=2):
        dm = IterDataModule(
            "downscaling", str(roots["low"]), str(roots["high"]), in_vars,
            out_vars=in_vars, batch_size=2, buffer_size=4,
            data_par_size=4, data_par_rank=rank,
        )
        dm.setup()
        out = []
        for _ in range(epochs):
            # drain one epoch (advances all rngs as training would)
            for _ in dm.train_dataloader():
                pass
            # ShuffleIterableDataset -> IndividualDataIter -> Downscale -> NpyReader
            reader = dm.data_train.dataset.dataset.dataset
            out.append(tuple(p[0] for p in reader._sharded_files()))
        return out

    per_rank = [rank_files_by_epoch(r) for r in range(4)]
    for epoch in range(2):
        flat = [f for r in range(4) for f in per_rank[r][epoch]]
        assert len(flat) == len(set(flat)) == 8, f"epoch {epoch} diverged"


def test_itermodule_multihost_disjoint_batches(tmp_path):
    """IterDataModule at data_par_size=4: the sample streams of different
    ranks are pairwise disjoint (checked by content hash)."""
    roots, in_vars = _many_shard_dataset(tmp_path)
    streams = []
    for rank in range(4):
        dm = IterDataModule(
            "downscaling", str(roots["low"]), str(roots["high"]), in_vars,
            out_vars=in_vars, batch_size=1, buffer_size=2,
            data_par_size=4, data_par_rank=rank,
        )
        dm.setup()
        sums = set()
        for x, y, *_ in dm.train_dataloader():
            sums.add(round(float(np.asarray(x).sum()), 4))
        streams.append(sums)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not (streams[i] & streams[j]), (i, j)


# ---- header-only batch counting (num_batches / num_samples) ----------------


def _actual_batches(loader):
    return sum(1 for _ in loader)


@pytest.mark.parametrize(
    "task,kwargs",
    [
        ("downscaling", {}),
        ("downscaling", {"div": 2, "overlap": 2}),
        ("direct-forecasting", {"src": "era5", "history": 2, "window": 1,
                                "pred_range": 2}),
        ("continuous-forecasting", {"history": 2, "window": 1,
                                    "pred_range": 2, "max_pred_range": 3,
                                    "random_lead_time": True}),
    ],
)
def test_num_batches_matches_loader(synth_dataset, task, kwargs):
    """num_batches must predict the EXACT yield of every dataloader from npz
    headers alone — the multi-process step/round sync is built on it."""
    ds = synth_dataset
    high = ds["low"] if task != "downscaling" else ds["high"]
    dm = IterDataModule(
        task, ds["low"], high, ds["in_vars"], ds["out_vars"],
        batch_size=3, buffer_size=4, subsample=2, drop_last=True, **kwargs,
    )
    dm.setup()
    assert dm.num_batches("train") == _actual_batches(dm.train_dataloader())
    assert dm.num_batches("val") == _actual_batches(dm.val_dataloader())
    assert dm.num_batches("test") == _actual_batches(dm.test_dataloader())


def test_num_batches_counts_the_upcoming_epoch_without_rng_advance(tmp_path):
    """Counting peeks the next epoch's file permutation: interleaving
    num_batches calls must not change which files each epoch reads, and with
    UNEQUAL file lengths the per-epoch count must match that epoch's shard."""
    import os

    var = "2m_temperature_min"
    lens = [4, 10, 6, 8]  # deliberately unequal shard lengths
    for split in ("train", "val", "test"):
        d = tmp_path / "low" / split
        d.mkdir(parents=True)
        for i, t in enumerate(lens):
            np.savez(d / f"s{i}.npz",
                     **{var: np.zeros((t, 1, 8, 16), np.float32)})
        np.savez(d / "climatology.npz", **{var: np.zeros((1, 8, 16), np.float32)})
    np.save(tmp_path / "low" / "lat.npy", np.linspace(-80, 80, 8))
    np.save(tmp_path / "low" / "lon.npy", np.linspace(0, 350, 16))
    np.savez(tmp_path / "low" / "normalize_mean.npz", **{var: np.array([0.0])})
    np.savez(tmp_path / "low" / "normalize_std.npz", **{var: np.array([1.0])})

    def make(rank):
        dm = IterDataModule(
            "downscaling", str(tmp_path / "low"), str(tmp_path / "low"),
            [var], [var], batch_size=3, buffer_size=2, subsample=1,
            drop_last=True, data_par_size=2, data_par_rank=rank, seed=7,
        )
        dm.setup()
        return dm

    # reference order: two epochs, no counting interleaved
    dm_a = make(0)
    orders_plain = [[os.path.basename(p) for p, _ in
                     dm_a.data_train.dataset.dataset.dataset._sharded_files()]
                    for _ in range(2)]

    # counted order: num_batches before each epoch must not perturb the rng
    dm_b = make(0)
    for epoch in range(2):
        n_pred = dm_b.num_batches("train")
        reader = dm_b.data_train.dataset.dataset.dataset
        files = [os.path.basename(p) for p, _ in reader._sharded_files()]
        assert files == orders_plain[epoch]
        t_total = sum(lens[int(f[1])] for f in files)
        assert n_pred == t_total // 3  # drop_last floor of THIS epoch's shard


# ---- worker-interleaved train pipeline (reference num_workers semantics) ----


def _provenance_dataset(tmp_path, n_files=8, T=4, H=8, W=16, mag=2):
    """Shards whose values encode provenance: var 'a' == file index
    (constant per file), var 'b' == timestep index. Normalization stats are
    identity (mean 0 / std 1) so values survive the pipeline."""
    in_vars = ["a", "b"]
    roots = {}
    for name, h, w in (("low", H, W), ("high", H * mag, W * mag)):
        root = tmp_path / name
        d = root / "train"
        d.mkdir(parents=True)
        for f in range(n_files):
            t_idx = np.arange(T, dtype=np.float32).reshape(T, 1, 1, 1)
            np.savez(
                d / f"s{f}.npz",
                a=np.full((T, 1, h, w), float(f), np.float32),
                b=np.broadcast_to(t_idx, (T, 1, h, w)).astype(np.float32),
            )
        np.savez(d / "climatology.npz", **{
            v: np.zeros((1, h, w), np.float32) for v in in_vars})
        np.save(root / "lat.npy", np.linspace(-80, 80, h).astype(np.float32))
        np.save(root / "lon.npy", np.linspace(0, 350, w).astype(np.float32))
        np.savez(root / "normalize_mean.npz",
                 **{v: np.zeros(1, np.float32) for v in in_vars})
        np.savez(root / "normalize_std.npz",
                 **{v: np.ones(1, np.float32) for v in in_vars})
        roots[name] = root
    return roots, in_vars


def _make_dm(roots, in_vars, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("buffer_size", 4)
    dm = IterDataModule("downscaling", str(roots["low"]), str(roots["high"]),
                        in_vars, out_vars=in_vars, **kw)
    dm.setup()
    return dm


def test_interleaved_workers_disjoint_and_complete(tmp_path):
    """num_workers=2 x data_par_size=2: the 4 worker shards are disjoint and
    complete — every (file, timestep) sample appears exactly once per epoch
    across all ranks (reference (rank, worker) file sharding,
    iterdataset.py:52-88)."""
    roots, in_vars = _provenance_dataset(tmp_path)
    seen = []
    for rank in range(2):
        dm = _make_dm(roots, in_vars, num_workers=2,
                      data_par_size=2, data_par_rank=rank)
        n_batches = 0
        for x, y, iv, ov in dm.train_dataloader():
            for s in range(x.shape[0]):
                seen.append((int(x[s, 0, 0, 0]), int(x[s, 1, 0, 0])))
            n_batches += 1
        assert n_batches == dm.num_batches("train")
    assert sorted(seen) == [(f, t) for f in range(8) for t in range(4)]


def test_interleave_mixes_files_sample_by_sample(tmp_path):
    """Under the buffer shuffle sits a round-robin over worker streams:
    consecutive raw samples come from different files (the measured
    shuffle-quality fix, docs/results_shuffle_quality.json)."""
    roots, in_vars = _provenance_dataset(tmp_path)
    dm = _make_dm(roots, in_vars, num_workers=2)
    raw = dm.data_train.dataset  # InterleavedDataIter under the buffer
    first8 = [int(s[0]["a"][0, 0]) for s, _ in zip(
        ((x, None) for x, *_ in raw), range(8))]
    # two workers alternate: even positions one file, odd positions another
    assert len(set(first8[0::2])) == 1 and len(set(first8[1::2])) == 1
    assert first8[0] != first8[1]


def test_interleave_wraparound_replicates_like_reference(tmp_path):
    """files < workers*ranks wraps the file list around (reference
    iterdataset.py:61-66): with 1 file and 2 workers every sample is seen
    exactly twice per epoch, and num_batches counts the replication."""
    roots, in_vars = _provenance_dataset(tmp_path, n_files=1)
    dm = _make_dm(roots, in_vars, num_workers=2)
    seen = []
    n_batches = 0
    for x, *_ in dm.train_dataloader():
        seen.extend(int(x[s, 1, 0, 0]) for s in range(x.shape[0]))
        n_batches += 1
    assert n_batches == dm.num_batches("train")
    assert sorted(seen) == sorted(list(range(4)) * 2)


def test_interleave_remainder_files_are_not_dropped(tmp_path):
    """files % (workers*ranks) != 0: the reference's floor-division sharding
    (iterdataset.py:76-88) silently serves NO worker the trailing files of
    each epoch's permutation. The rebuild wrap-pads the permuted list to the
    next shard multiple instead: with 5 files and 2 workers every file is
    served at least once per epoch (one file twice), shards stay
    equal-length, and num_batches counts the padding."""
    roots, in_vars = _provenance_dataset(tmp_path, n_files=5)
    dm = _make_dm(roots, in_vars, num_workers=2)
    seen_files = []
    n_batches = 0
    for x, *_ in dm.train_dataloader():
        seen_files.extend(int(x[s, 0, 0, 0]) for s in range(x.shape[0]))
        n_batches += 1
    assert n_batches == dm.num_batches("train")
    counts = {f: seen_files.count(f) for f in set(seen_files)}
    assert set(counts) == set(range(5))  # every file served
    T = 4
    assert sorted(counts.values()) == [T, T, T, T, 2 * T]  # one wrap-pad dup


def test_interleave_epoch_permutations_stay_consistent(tmp_path):
    """Every worker rng advances exactly once per epoch, so epoch-2 shards
    are still disjoint+complete across ranks AND workers."""
    roots, in_vars = _provenance_dataset(tmp_path)
    dms = [_make_dm(roots, in_vars, num_workers=2,
                    data_par_size=2, data_par_rank=r) for r in range(2)]
    for epoch in range(2):
        seen = []
        for dm in dms:
            for x, *_ in dm.train_dataloader():
                seen.extend((int(x[s, 0, 0, 0]), int(x[s, 1, 0, 0]))
                            for s in range(x.shape[0]))
        assert sorted(seen) == [(f, t) for f in range(8) for t in range(4)], epoch
