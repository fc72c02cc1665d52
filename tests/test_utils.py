"""Utility subsystem tests: image metrics, profiler, structured logging,
grad debug hooks, extreme-mask math, plateau scheduler, stitched inference."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbit2_tpu.utils.image_metrics import psnr, ssim
from orbit2_tpu.utils.logging import MetricsLogger
from orbit2_tpu.utils.profiler import ProfileTimer
from orbit2_tpu.utils.visualize import rank_histogram, stitched_inference
from orbit2_tpu.training.debug import grad_norms
from orbit2_tpu.training.optim import ReduceLROnPlateau
from orbit2_tpu.data.processing.era5_extreme import (
    extreme_thresholds,
    generate_extreme_masks,
    group_files_by_year,
    process_era5_extreme,
    smoothed_rolling_mean,
)


def test_psnr_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(32, 32))
    assert psnr(img, img) == float("inf")
    noisy = img + 0.1 * rng.normal(size=img.shape)
    p1 = psnr(noisy, img)
    p2 = psnr(img + rng.normal(size=img.shape), img)
    assert p1 > p2  # less noise -> higher PSNR


def test_ssim_bounds():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(32, 32))
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    other = rng.normal(size=(32, 32))
    assert ssim(other, img) < 0.3


def test_profiler_spans():
    t = ProfileTimer()
    with t.span("work"):
        sum(range(1000))
    t.begin("more")
    t.end("more")
    s = t.summary()
    assert s["work"]["count"] == 1
    assert s["more"]["count"] == 1
    assert s["work"]["total_s"] >= 0


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    m = MetricsLogger(path, echo=False)
    m.log("train_epoch", epoch=0, loss=1.5)
    m.log("val", epoch=0, rmse=0.3)
    m.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "train_epoch" and lines[0]["loss"] == 1.5
    assert lines[1]["rmse"] == 0.3


def test_grad_norms_groups():
    grads = {"blocks_0": {"w": jnp.ones((2, 2))}, "head": {"w": 2 * jnp.ones(4)}}
    norms = grad_norms(grads)
    assert norms["blocks_0"] == pytest.approx(2.0)
    assert norms["head"] == pytest.approx(4.0)
    assert norms["global"] == pytest.approx(np.sqrt(4 + 16))


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(base_lr=1.0, factor=0.5, patience=1)
    assert s.step(1.0) == 1.0      # first -> best
    assert s.step(0.9) == 1.0      # improved
    assert s.step(0.95) == 1.0     # bad 1 (within patience)
    assert s.step(0.95) == 0.5     # bad 2 -> reduce
    assert s(99) == 0.5


def test_extreme_mask_pipeline():
    rng = np.random.default_rng(0)
    t, h, w = 400, 6, 8
    x = rng.normal(280, 5, size=(t, h, w))
    g = smoothed_rolling_mean(x, time_horizon=24, window=1)
    assert g.shape == (t - 24, h, w)
    low, high = extreme_thresholds(g)
    assert (low < high).all()
    masks, low2, high2 = generate_extreme_masks(x, time_horizon=24)
    # full-length, time-aligned (reference zeros the first horizon steps)
    assert masks.shape == x.shape
    assert masks[:24].sum() == 0
    frac = masks[24:].mean()
    assert 0.05 < frac < 0.2  # ~10% of samples flagged extreme
    # mask[horizon + j] flags g[j] (reference era5_extreme.py:98-104)
    np.testing.assert_array_equal(masks[24:], ((g < low2) | (g > high2)))


def test_extreme_driver_shard_boundary_invariance(tmp_path):
    """process_era5_extreme concatenates a year's shards before the rolling
    pass (reference era5_extreme.py:116-170), so sharding a year 1-way vs
    3-way must yield identical masks — no per-shard zeroed horizon or
    truncated windows at shard boundaries."""
    rng = np.random.default_rng(3)
    t, h, w = 240, 4, 5
    horizon = 24
    x = rng.normal(280, 5, size=(t, 1, h, w)).astype(np.float32)

    def build(root, n_shards):
        for split in ("train", "val", "test"):
            d = root / split
            d.mkdir(parents=True)
            per = t // n_shards
            for s in range(n_shards):
                np.savez(d / f"2017_{s}.npz",
                         **{"2m_temperature": x[s * per : (s + 1) * per]})

    src1, tgt1 = tmp_path / "one", tmp_path / "one_out"
    src3, tgt3 = tmp_path / "three", tmp_path / "three_out"
    build(src1, 1)
    build(src3, 3)
    lo1, hi1 = process_era5_extreme(str(src1), str(tgt1),
                                    time_horizon=horizon)
    lo3, hi3 = process_era5_extreme(str(src3), str(tgt3),
                                    time_horizon=horizon)
    np.testing.assert_allclose(lo1, lo3)
    np.testing.assert_allclose(hi1, hi3)

    m1 = np.load(tgt1 / "test" / "2017_0.npz")["2m_temperature_extreme_mask"]
    m3 = np.concatenate(
        [np.load(tgt3 / "test" / f"2017_{s}.npz")["2m_temperature_extreme_mask"]
         for s in range(3)], axis=0)
    assert m1.shape == (t, 1, h, w)
    np.testing.assert_array_equal(m1, m3)
    # only the FIRST shard of a year carries the zeroed horizon prefix
    s1 = np.load(tgt3 / "test" / "2017_1.npz")["2m_temperature_extreme_mask"]
    assert s1.sum() > 0
    assert m3[horizon:].sum() == m1[horizon:].sum() > 0


def test_extreme_driver_passes_through_shards_without_variable(tmp_path):
    """A year whose shards have heterogeneous keys: shards carrying the
    variable get masks, shards without it are written through UNCHANGED —
    skipping the whole year would silently shrink the target dataset
    (r3 review finding)."""
    rng = np.random.default_rng(5)
    t, h, w = 120, 4, 5
    x = rng.normal(280, 5, size=(t, 1, h, w)).astype(np.float32)
    other = rng.normal(0, 1, size=(40, 1, h, w)).astype(np.float32)

    src, tgt = tmp_path / "src", tmp_path / "out"
    for split in ("train", "val", "test"):
        d = src / split
        d.mkdir(parents=True)
        np.savez(d / "2017_0.npz", **{"2m_temperature": x[:60]})
        np.savez(d / "2017_1.npz", **{"geopotential": other})  # no temp var
        np.savez(d / "2017_2.npz", **{"2m_temperature": x[60:]})

    process_era5_extreme(str(src), str(tgt), time_horizon=24)

    out = sorted(p.name for p in (tgt / "test").iterdir())
    assert out == ["2017_0.npz", "2017_1.npz", "2017_2.npz"]  # none dropped
    d1 = np.load(tgt / "test" / "2017_1.npz")
    assert "2m_temperature_extreme_mask" not in d1
    np.testing.assert_array_equal(d1["geopotential"], other)
    for name, n in (("2017_0.npz", 60), ("2017_2.npz", 60)):
        m = np.load(tgt / "test" / name)["2m_temperature_extreme_mask"]
        assert m.shape == (n, 1, h, w)


def test_group_files_by_year_ordering():
    files = ["/d/2018_1.npz", "/d/2017_10.npz", "/d/2017_2.npz",
             "/d/2018_0.npz", "/d/climatology.npz", "/d/custom.npz"]
    groups = group_files_by_year(files)
    assert ["/d/2017_2.npz", "/d/2017_10.npz"] in groups
    assert ["/d/2018_0.npz", "/d/2018_1.npz"] in groups
    assert ["/d/custom.npz"] in groups
    assert all("climatology" not in f for g in groups for f in g)


def test_rank_histogram_uniform_for_calibrated():
    rng = np.random.default_rng(0)
    ens = rng.normal(size=(9, 1000))
    obs = rng.normal(size=(1000,))
    counts = rank_histogram(ens, obs)
    assert counts.sum() == 1000
    assert counts.shape == (10,)
    # calibrated ensemble -> roughly flat histogram
    assert counts.max() < 3 * counts.min() + 30


def test_stitched_inference_identity_upsample():
    """With an exact 2x nearest-upsample 'model', stitching reproduces the
    upsampled field regardless of tiling."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 32)).astype(np.float32)

    def fake_forward(tile):  # [1, C, h, w] -> [1, C, 2h, 2w]
        return np.repeat(np.repeat(tile, 2, axis=2), 2, axis=3)

    full = fake_forward(x[None])[0]
    stitched = stitched_inference(fake_forward, x, div=2, overlap=2, mag=2)
    np.testing.assert_allclose(stitched, full)


# ---------------------------------------------------------------- MC-dropout

_MC_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
_MC_OUT = _MC_VARS[4:]


def _mc_model(drop_rate, drop_path):
    from orbit2_tpu.models import ResSlimViT

    # depth=2 so the linspace drop-path schedule has a non-zero tail rate
    return ResSlimViT(default_vars=_MC_VARS, img_size=(8, 16), in_channels=7,
                      out_channels=3, superres_mag=2, patch_size=2,
                      embed_dim=32, depth=2, decoder_depth=1, num_heads=2,
                      learn_pos_emb=True, drop_rate=drop_rate,
                      drop_path=drop_path)


def test_mc_dropout_droppath_inert_dropout_varies():
    """Reference enable_dropout flips ONLY Dropout to train mode
    (mc_dropout.py:4-7); stochastic depth must stay off during ensemble
    inference. With drop_path=0.9 and drop_rate=0 the members are identical;
    with drop_rate=0.5 they differ."""
    from orbit2_tpu.utils.mc_dropout import get_monte_carlo_predictions

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, 8, 16)),
                    dtype=jnp.float32)

    m_dp = _mc_model(drop_rate=0.0, drop_path=0.9)
    params = m_dp.init({"params": jax.random.PRNGKey(0)}, x, _MC_VARS,
                       _MC_OUT)["params"]
    ens = np.asarray(get_monte_carlo_predictions(
        m_dp, params, x, _MC_VARS, _MC_OUT, n_samples=4))
    np.testing.assert_allclose(ens[0], ens[1])
    np.testing.assert_allclose(ens[0], ens[3])

    m_do = _mc_model(drop_rate=0.5, drop_path=0.0)
    params2 = m_do.init({"params": jax.random.PRNGKey(0)}, x, _MC_VARS,
                        _MC_OUT)["params"]
    ens2 = np.asarray(get_monte_carlo_predictions(
        m_do, params2, x, _MC_VARS, _MC_OUT, n_samples=4))
    assert np.abs(ens2[0] - ens2[1]).max() > 1e-6


def test_training_droppath_still_active():
    """The train step supplies the drop_path rng stream, so stochastic depth
    remains live in training even though MC-inference omits it."""
    m = _mc_model(drop_rate=0.0, drop_path=0.9)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 7, 8, 16)),
                    dtype=jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(0)}, x, _MC_VARS,
                    _MC_OUT)["params"]

    def fwd(key):
        return m.apply({"params": params}, x, _MC_VARS, _MC_OUT,
                       deterministic=False,
                       rngs={"dropout": key,
                             "drop_path": jax.random.fold_in(key, 1)})

    a = np.asarray(fwd(jax.random.PRNGKey(2)))
    b = np.asarray(fwd(jax.random.PRNGKey(3)))
    assert np.abs(a - b).max() > 1e-6
