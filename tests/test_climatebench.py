"""ClimateBench module tests (reference climatebench_dataset/module) with
synthetic arrays via the `_arrays` hook."""

import numpy as np
import pytest

from orbit2_tpu.data.climatebench import (
    ClimateBenchDataModule,
    input_for_training,
    output_for_training,
    split_train_val,
)


def test_windowing_skip_historical():
    t, c, h, w = 200, 4, 8, 16
    x = np.arange(t)[:, None, None, None] * np.ones((t, c, h, w), np.float32)
    hist = 10
    # skip_historical: first window's LAST element is the first scenario point
    xw = input_for_training(x, skip_historical=True, history=hist, len_historical=165)
    assert xw.shape == (t - 165, hist, c, h, w)
    assert xw[0, -1, 0, 0, 0] == 165  # first scenario index
    yw = output_for_training(x[:, :1], skip_historical=True, history=hist,
                             len_historical=165)
    assert yw[0, 0, 0, 0] == 165
    # full pass
    xw2 = input_for_training(x, skip_historical=False, history=hist)
    assert xw2.shape == (t - hist + 1, hist, c, h, w)


def test_split_train_val_partition():
    x = np.arange(100, dtype=np.float32).reshape(100, 1, 1, 1, 1)
    y = x[:, 0]
    xt, yt, xv, yv = split_train_val(x, y, 0.8, np.random.default_rng(0))
    assert len(xt) == 80 and len(xv) == 20
    joined = sorted(np.concatenate([xt, xv]).ravel().tolist())
    assert joined == list(range(100))


@pytest.fixture
def cb_module():
    rng = np.random.default_rng(0)
    t, c, h, w = 200, 4, 8, 16  # 200-165 scenario years -> >21 test windows
    dict_x = {"ssp245": rng.normal(size=(t, c, h, w)).astype(np.float32)}
    dict_y = {"ssp245": rng.normal(15, 3, size=(t, 1, h, w)).astype(np.float32)}
    lat = np.linspace(-88, 88, h)
    lon = np.linspace(0, 358, w)
    return ClimateBenchDataModule(
        history=10, batch_size=8, _arrays=(dict_x, dict_y, lat, lon),
        list_train_simu=("ssp245",), list_test_simu=("ssp245",),
    )


def test_module_protocol(cb_module):
    dm = cb_module
    in_vars, out_vars = dm.get_data_variables()
    assert in_vars == ["CO2", "SO2", "CH4", "BC"]
    assert out_vars == ["tas"]
    in_size, out_size = dm.get_data_dims()
    assert in_size == (8, 10, 4, 8, 16)
    assert out_size == (8, 1, 8, 16)
    clim = dm.get_climatology()
    assert clim["tas"].shape == (1,)
    assert clim["tas"][0] > 0


def test_train_batches_normalized(cb_module):
    x, y, in_vars, out_vars = next(iter(cb_module.train_dataloader()))
    assert x.shape[1:] == (10, 4, 8, 16)
    # train-stat normalization: per-channel ~N(0,1)
    assert abs(float(x.mean())) < 0.5
    assert 0.5 < float(x.std()) < 2.0


def test_test_split_is_last_21(cb_module):
    assert len(cb_module.dataset_test) == 21


def test_loader_integration_with_registry(cb_module):
    """load_climatebench_module wires the (fixed) lat_nrmse* metrics."""
    import orbit2_tpu as cl

    out = cl.load_climatebench_module(
        data_module=cb_module, architecture="rasp-theurey-2020")
    model, train_loss, val_losses, test_losses, *_ = out
    assert [m.name for m in test_losses] == ["lat_nrmses", "lat_nrmseg", "lat_nrmse"]


def test_climatebench_trains_end_to_end(cb_module):
    """ClimateBench trains end-to-end by composition: the (B, history, C, H, W)
    forcing windows from ClimateBenchDataModule drive the rasp-theurey-2020
    ResNet (BatchNorm aux state threaded through make_train_step) and the
    lat_nrmses/lat_nrmseg/lat_nrmse test metrics evaluate finite — the same
    capability the reference reaches through its legacy Lightning
    climatebench_module.py:31-171 training path."""
    import jax
    import jax.numpy as jnp
    import orbit2_tpu as cl
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import (
        evaluate_batch,
        make_eval_step,
        make_train_step,
    )

    model, train_loss, _val, test_losses, _tt, _vt, test_transforms = (
        cl.load_climatebench_module(
            data_module=cb_module, architecture="rasp-theurey-2020"))
    in_vars, out_vars = cb_module.get_data_variables()

    x0, y0, *_ = next(iter(cb_module.train_dataloader()))
    x0 = jnp.asarray(x0)
    y0 = jnp.asarray(y0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x0[:1], in_vars, out_vars,
        deterministic=True)
    params = variables["params"]
    aux = {"batch_stats": variables["batch_stats"]}
    tx = make_optimizer("adam", {"lr": 1e-3})
    opt_state = tx.init(params)

    step = make_train_step(model, train_loss, None, tx, in_vars, out_vars,
                           aux_collections=("batch_stats",))
    losses = []
    rng = jax.random.PRNGKey(1)
    for i, (x, y, *_rest) in enumerate(cb_module.train_dataloader()):
        params, aux, opt_state, loss = step(
            params, aux, opt_state, jnp.asarray(x), jnp.asarray(y),
            jax.random.fold_in(rng, i))
        losses.append(float(loss))
        if i == 2:
            break
    assert len(losses) == 3 and all(np.isfinite(losses))
    # BatchNorm running stats moved off their init values
    bn_means = jax.tree.leaves(
        jax.tree.map(lambda a: float(jnp.abs(a).sum()),
                     aux["batch_stats"]))
    assert any(m > 0 for m in bn_means)

    eval_step = make_eval_step(model, in_vars, out_vars,
                               aux_collections=("batch_stats",))
    xt, yt, *_ = next(iter(cb_module.test_dataloader()))
    yhat = eval_step(params, aux, jnp.asarray(xt), jnp.asarray(yt))
    metrics = evaluate_batch(yhat, jnp.asarray(yt), "test", test_losses,
                             test_transforms, out_vars)
    assert metrics and all(np.isfinite(float(v)) for v in metrics.values())


def test_climatebench_driver_runs(cb_module):
    """examples/climatebench.py `run` (reference
    experiments/climate_projection/climatebench.py:80-134): two epochs on a
    small resnet, early-stop bookkeeping, best-params test eval with the
    ClimateBench NRMSE trio."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "examples_climatebench", os.path.join(root, "examples",
                                              "climatebench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    best_val, test = mod.run(
        cb_module, "resnet", max_epochs=2, patience=1,
        model_overrides={"n_blocks": 2, "hidden_channels": 32})
    assert np.isfinite(best_val)
    for name in ("lat_nrmses", "lat_nrmseg", "lat_nrmse"):
        assert np.isfinite(test[f"test/{name}:aggregate"])
