"""Golden-value tests for the loss/metric zoo (SURVEY.md §4: the reference
ships no numeric tests; every metric here is checked against an independent
numpy computation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orbit2_tpu.metrics import functional as F
from orbit2_tpu.metrics.metrics import MetricsMetaInfo
from orbit2_tpu.registry import METRICS_REGISTRY
import orbit2_tpu.metrics.metrics  # noqa: F401

RNG = np.random.default_rng(42)
B, C, H, W = 4, 3, 8, 10
PRED = RNG.normal(size=(B, C, H, W)).astype(np.float32)
TARGET = RNG.normal(size=(B, C, H, W)).astype(np.float32)
VAR_NAMES = ["total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max"]
VAR_WEIGHTS = {"2m_temperature_min": 10.0, "2m_temperature_max": 10.0,
               "total_precipitation_24hr": 1.0}
LAT = np.linspace(-80, 80, H)


def np_channel_weighted(err):
    w = np.array([VAR_WEIGHTS[v] for v in VAR_NAMES], dtype=np.float32)
    return err * w.reshape(1, -1, 1, 1)


def test_mse_golden():
    got = F.mse(jnp.asarray(PRED), jnp.asarray(TARGET), VAR_NAMES, VAR_WEIGHTS)
    err = np_channel_weighted((PRED - TARGET) ** 2)
    want_pc = err.mean(axis=(0, 2, 3))
    want = np.concatenate([want_pc, [err.mean()]])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_mse_aggregate_only_scalar():
    got = F.mse(jnp.asarray(PRED), jnp.asarray(TARGET), aggregate_only=True)
    np.testing.assert_allclose(float(got), ((PRED - TARGET) ** 2).mean(), rtol=1e-5)


def test_bayesian_tv_golden():
    """Independent recomputation of the TV prior with explicit zero-padding
    (reference functional.py:117-167)."""
    p = PRED
    d1 = np.abs(p[:, :, 1:, :] - p[:, :, :-1, :])
    d2 = np.abs(p[:, :, :, 1:] - p[:, :, :, :-1])
    d3 = np.abs(p[:, :, 1:, 1:] - p[:, :, :-1, :-1])
    d4 = np.abs(p[:, :, 1:, :-1] - p[:, :, :-1, 1:])
    d1 = np.pad(d1, ((0, 0), (0, 0), (0, 1), (0, 0)))
    d2 = np.pad(d2, ((0, 0), (0, 0), (0, 0), (0, 1)))
    d3 = np.pad(d3, ((0, 0), (0, 0), (0, 1), (0, 1)))
    d4 = np.pad(d4, ((0, 0), (0, 0), (0, 1), (1, 0)))
    err = (PRED - TARGET) ** 2 + 0.02 * (d1 + d2 + 0.7 * d3 + 0.7 * d4)
    err = np_channel_weighted(err)
    want = np.concatenate([err.mean(axis=(0, 2, 3)), [err.mean()]])
    got = F.bayesian_tv(jnp.asarray(PRED), jnp.asarray(TARGET), VAR_NAMES, VAR_WEIGHTS)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_rmse_golden():
    err = (PRED - TARGET) ** 2
    want_pc = np.sqrt(err.mean(axis=(2, 3))).mean(axis=0)
    got = F.rmse(jnp.asarray(PRED), jnp.asarray(TARGET))
    np.testing.assert_allclose(np.asarray(got)[:C], want_pc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got)[-1], want_pc.mean(), rtol=1e-5)


def test_lat_weighted_mse():
    lw = np.cos(np.deg2rad(LAT))
    lw = (lw / lw.mean()).reshape(1, 1, H, 1)
    err = (PRED - TARGET) ** 2 * lw
    want = err.mean()
    meta = MetricsMetaInfo([], VAR_NAMES, LAT, np.arange(W), np.zeros((C, H, W)))
    metric = METRICS_REGISTRY["lat_mse"](aggregate_only=True, metainfo=meta)
    got = metric(jnp.asarray(PRED), jnp.asarray(TARGET))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_acc_golden():
    clim = RNG.normal(size=(C, H, W)).astype(np.float32)
    p = PRED - clim
    t = TARGET - clim
    accs = []
    for i in range(C):
        pp = p[:, i] - p[:, i].mean()
        tp = t[:, i] - t[:, i].mean()
        accs.append((pp * tp).sum() / np.sqrt((pp**2).sum() * (tp**2).sum()))
    want = np.array(accs)
    got = F.acc(jnp.asarray(PRED), jnp.asarray(TARGET), jnp.asarray(clim)[None],
                lat_weights=jnp.ones((1, 1, 1, 1)))
    np.testing.assert_allclose(np.asarray(got)[:C], want, rtol=1e-4)


def test_pearson_matches_numpy_corrcoef():
    got = F.pearson(jnp.asarray(PRED), jnp.asarray(TARGET))
    for i in range(C):
        want = np.corrcoef(PRED[:, i].ravel(), TARGET[:, i].ravel())[0, 1]
        np.testing.assert_allclose(np.asarray(got)[i], want, rtol=1e-4)


def test_mean_bias_golden():
    got = F.mean_bias(jnp.asarray(PRED), jnp.asarray(TARGET))
    want = TARGET.mean(axis=(0, 2, 3)) - PRED.mean(axis=(0, 2, 3))
    np.testing.assert_allclose(np.asarray(got)[:C], want, rtol=1e-4, atol=1e-6)


def test_image_gradient_scalar():
    got = F.image_gradient(jnp.asarray(PRED), jnp.asarray(TARGET))
    assert np.asarray(got).ndim == 0
    assert float(got) > 0


def test_quantile_pinball():
    got = F.lat_weighted_quantile(jnp.asarray(PRED), jnp.asarray(TARGET))
    assert float(got) > 0


def test_registry_contains_reference_names():
    # every name the reference registers (metrics.py:119-517) plus the
    # climatebench trio the reference forgot to register (loaders.py:241)
    for name in ["mse", "mae", "lat_mse", "rmse", "lat_rmse", "acc", "lat_acc",
                 "pearson", "mean_bias", "bayesian_tv", "imagegradient",
                 "perceptual", "lat_nrmses", "lat_nrmseg", "lat_nrmse"]:
        assert name in METRICS_REGISTRY, name


def test_metrics_work_under_jit():
    import jax

    @jax.jit
    def f(p, t):
        return F.bayesian_tv(p, t, VAR_NAMES, VAR_WEIGHTS, aggregate_only=True)

    got = f(jnp.asarray(PRED), jnp.asarray(TARGET))
    assert np.isfinite(float(got))


def test_lpips_architecture(tmp_path, monkeypatch):
    """LPIPS net with random weights in the real VGG16 layout: d(x,x)=0,
    d(x,y)>0, and the perceptual metric (L1 + 0.5*LPIPS) composes
    (reference functional.py:17-33)."""
    rng = np.random.default_rng(0)
    from orbit2_tpu.metrics.lpips import _VGG_PLAN, _TAPS

    arrays = {}
    for i, (cin, cout) in enumerate(_VGG_PLAN):
        arrays[f"conv{i}_w"] = rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        arrays[f"conv{i}_b"] = np.zeros(cout, np.float32)
    taps_channels = [64, 128, 256, 512, 512]
    for i, c in enumerate(taps_channels):
        arrays[f"lin{i}_w"] = np.abs(rng.normal(0, 0.1, (c,))).astype(np.float32)
    path = str(tmp_path / "lpips.npz")
    np.savez(path, **arrays)

    from orbit2_tpu.metrics.lpips import LPIPS

    net = LPIPS(path)
    x = jnp.asarray(rng.normal(size=(1, 3, 32, 32)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 3, 32, 32)), dtype=jnp.float32)
    d_same = float(net(x, x)[0])
    d_diff = float(net(x, y)[0])
    assert d_same == pytest.approx(0.0, abs=1e-5)
    assert d_diff > 0

    monkeypatch.setenv("ORBIT2_LPIPS_WEIGHTS", path)
    metric = METRICS_REGISTRY["perceptual"](aggregate_only=True)
    loss = float(metric(x, y))
    assert loss > 0


def test_lpips_missing_weights_raises(monkeypatch):
    monkeypatch.delenv("ORBIT2_LPIPS_WEIGHTS", raising=False)
    with pytest.raises(FileNotFoundError):
        METRICS_REGISTRY["perceptual"](aggregate_only=True)


def test_masked_mse():
    """masked_mse (fixes the reference's unregistered-loss gap,
    era5_daymet_downscaling.py:214): masked-out pixels contribute nothing;
    the mask-mean renormalization keeps the scale of plain MSE."""
    rng = np.random.default_rng(5)
    pred = rng.normal(size=(2, 1, 4, 4)).astype(np.float32)
    target = rng.normal(size=(2, 1, 4, 4)).astype(np.float32)
    mask = np.zeros((4, 4), np.float32)
    mask[:2] = 1.0  # only top half valid

    m = METRICS_REGISTRY["masked_mse"](aggregate_only=True).set_mask(mask)
    got = float(m(jnp.asarray(pred), jnp.asarray(target)))
    want = (((pred - target) ** 2) * mask).mean() / mask.mean()
    assert got == pytest.approx(want, rel=1e-5)
    # corrupting masked-out pixels changes nothing
    pred2 = pred.copy()
    pred2[:, :, 2:] += 100.0
    got2 = float(m(jnp.asarray(pred2), jnp.asarray(target)))
    assert got2 == pytest.approx(got, rel=1e-5)


def test_masked_mse_crops_full_grid_mask_to_prediction():
    """The train/eval steps top-left-crop targets to the model output when
    out_lat/out_lon is not an exact superres multiple (train._crop_to_match);
    a full-grid [H, W] mask must be cropped the same way, not shape-error."""
    rng = np.random.default_rng(7)
    pred = rng.normal(size=(2, 1, 4, 6)).astype(np.float32)  # cropped grid
    target = rng.normal(size=(2, 1, 4, 6)).astype(np.float32)
    mask = np.zeros((5, 7), np.float32)  # full dataset grid, one row/col more
    mask[:3, :4] = 1.0

    m = METRICS_REGISTRY["masked_mse"](aggregate_only=True).set_mask(mask)
    got = float(m(jnp.asarray(pred), jnp.asarray(target)))
    mc = mask[:4, :6]
    want = (((pred - target) ** 2) * mc).mean() / mc.mean()
    assert got == pytest.approx(want, rel=1e-5)


def test_gaussian_crps_properties():
    """CRPS of a sharp correct forecast ~0; grows with error/spread
    (reference functional.py:340-360)."""
    target = jnp.zeros((2, 1, 4, 4))
    sharp = F.gaussian_crps(jnp.zeros_like(target), jnp.full_like(target, 1e-3),
                            target, aggregate_only=True)
    wide = F.gaussian_crps(jnp.zeros_like(target), jnp.full_like(target, 1.0),
                           target, aggregate_only=True)
    biased = F.gaussian_crps(jnp.full_like(target, 2.0),
                             jnp.full_like(target, 1.0), target,
                             aggregate_only=True)
    assert float(sharp) < float(wide) < float(biased)


def test_gaussian_spread_and_ratio():
    std = jnp.full((2, 1, 4, 4), 0.5)
    spread = F.gaussian_spread(std, aggregate_only=True)
    assert float(spread) == pytest.approx(0.25, rel=1e-5)  # variance mean
    mean = jnp.zeros((2, 1, 4, 4))
    target = jnp.ones((2, 1, 4, 4))
    ratio = F.gaussian_spread_skill_ratio(mean, std, target, aggregate_only=True)
    assert float(ratio) == pytest.approx(0.25 / 1.0, rel=1e-4)


def test_msess_perfect_forecast_is_one():
    clim = jnp.zeros((1, C, H, W))
    got = F.msess(jnp.asarray(TARGET), jnp.asarray(TARGET), clim,
                  aggregate_only=True)
    assert float(got) == pytest.approx(1.0)


def test_nrmses_nrmseg_scale_with_climatology():
    clim = jnp.asarray([2.0, 2.0, 2.0])
    s1 = F.nrmses(jnp.asarray(PRED), jnp.asarray(TARGET), clim, aggregate_only=True)
    s2 = F.nrmses(jnp.asarray(PRED), jnp.asarray(TARGET), clim * 2, aggregate_only=True)
    assert float(s1) == pytest.approx(2 * float(s2), rel=1e-5)
    g1 = F.nrmseg(jnp.asarray(PRED), jnp.asarray(TARGET), clim, aggregate_only=True)
    assert float(g1) > 0


def test_handles_probabilistic_unwraps_tuple():
    @F.handles_probabilistic
    def first_mean(pred):
        return pred.mean()

    x = jnp.ones((2, 2))
    assert float(first_mean((x, x * 9))) == 1.0  # uses mean, ignores std
    assert float(first_mean(x)) == 1.0


def test_transformed_metric_composes():
    from orbit2_tpu.metrics.metrics import TransformedMetric

    base = METRICS_REGISTRY["mse"](aggregate_only=True)
    doubled = TransformedMetric(lambda x: 2 * x, base)
    p, t = jnp.zeros((1, 1, 2, 2)), jnp.ones((1, 1, 2, 2))
    assert float(doubled(p, t)) == pytest.approx(4 * float(base(p, t)))
    assert doubled.name == "mse"
