"""Round-5 on-chip task runs: forecasting + ClimateBench (VERDICT r4 #6).

Both task families were CPU-test-covered only; this script executes them on
the TPU with learnable synthetic data and records convergence + throughput:

  A. Direct forecasting (reference iterdataset.py:194-240 semantics) via
     the SHIPPED config+Trainer path: an advection world (each step rolls
     the field 2 px east plus light noise) that persistence must get wrong
     by exactly the roll and climatology by the field variance. The
     rasp-theurey-2020 ResNet (periodic convs — exactly the right
     inductive bias for a lon-roll) must beat both baselines' test RMSE.
  B. ClimateBench (reference experiments/climate_projection) via
     load_climatebench_module + rasp-theurey ResNet: forcing windows with a
     learnable linear response, trained on-chip, NRMSE-trio eval
     (lat_nrmses / lat_nrmseg / lat_nrmse) finite and loss decreasing.

One chip claim; exit 7 on claim failure:
  until PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/run_r5_tasks_onchip.py; do sleep 60; done
Results: /tmp/r5_tasks.json (recorded into docs/performance.md).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


def record(r):
    RESULTS.append(r)
    print(json.dumps(r), flush=True)
    with open("/tmp/r5_tasks.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def write_forecast_dataset(root, h=32, w=64, t_per=64, n_files=2):
    """Advection world in the reference npz-shard layout: a[t+1] =
    roll(a[t], 2, lon) + eps. One dynamic variable + nothing else; in/out
    on the same grid (forecasting)."""
    rng = np.random.default_rng(0)
    var = "2m_temperature"
    for split, nf in (("train", n_files), ("val", 1), ("test", 1)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(nf):
            base = rng.normal(280, 10, size=(h, w)).astype(np.float32)
            # smooth it so persistence is a non-trivial baseline
            for ax in (0, 1):
                base = (np.roll(base, 1, ax) + base + np.roll(base, -1, ax)) / 3
            frames = [base]
            for _ in range(t_per - 1):
                nxt = np.roll(frames[-1], 2, axis=1) + rng.normal(
                    0, 0.05, size=(h, w)).astype(np.float32)
                frames.append(nxt.astype(np.float32))
            arr = np.stack(frames)[:, None]  # [T, 1, H, W]
            np.savez(os.path.join(d, f"shard_{i}.npz"),
                     **{var: arr.astype(np.float32)})
        np.savez(os.path.join(d, "climatology.npz"),
                 **{var: np.full((1, h, w), 280.0, np.float32)})
    np.save(os.path.join(root, "lat.npy"),
            np.linspace(-88, 88, h).astype(np.float32))
    np.save(os.path.join(root, "lon.npy"),
            np.linspace(0, 358, w).astype(np.float32))
    np.savez(os.path.join(root, "normalize_mean.npz"),
             **{var: np.array([280.0], np.float32)})
    np.savez(os.path.join(root, "normalize_std.npz"),
             **{var: np.array([10.0], np.float32)})
    return [var]


QUICK = bool(os.environ.get("ORBIT2_R5_QUICK"))


def forecasting_run():
    import jax
    import jax.numpy as jnp

    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.train import make_eval_step
    from orbit2_tpu.training.trainer import Trainer
    from orbit2_tpu.utils.loaders import load_architecture

    root = tempfile.mkdtemp(prefix="fc_")
    ckdir = tempfile.mkdtemp(prefix="fc_ck_")
    in_vars = write_forecast_dataset(root, t_per=16 if QUICK else 64)
    cfg = load_config({
        "trainer": {"max_epochs": 2 if QUICK else 12, "batch_size": 16, "buffer_size": 64,
                    "num_workers": 0, "data_type": "float32",
                    "train_loss": "lat_mse", "remat": False,
                    "task": "forecasting"},
        "model": {"preset": "rasp-theurey-2020", "lr": 3e-3,
                  "warmup_epochs": 1, "drop_rate": 0.0},
        "data": {
            "low_res_dir": {"ERA5": root},
            "high_res_dir": {"ERA5": root},
            "spatial_resolution": {"ERA5": 625},
            "default_vars": in_vars,
            "dict_in_variables": {"ERA5": in_vars},
            "dict_out_variables": {"ERA5": in_vars},
            "var_weights": {},
            "history": 2, "window": 1, "pred_range": 1,
        },
    })
    t = Trainer(cfg, checkpoint_dir=ckdir)
    t0 = time.perf_counter()
    hist = t.fit()
    wall = time.perf_counter() - t0
    losses = [h["loss"] for h in hist]
    n_samples = sum(h["batches"] for h in hist) * cfg.trainer.batch_size
    # steady-state epoch rate (skip epoch 0 = compile)
    steady = [h for h in hist[1:]]
    sps = (sum(h["batches"] for h in steady) * cfg.trainer.batch_size /
           max(1e-9, sum(h["seconds"] for h in steady))) if steady else 0.0

    # test RMSE: model vs persistence vs climatology, all on normalized
    # fields through the same eval path
    dm = t._data_modules["ERA5"]
    in_v, out_v = dm.get_data_variables()
    eval_step = make_eval_step(t.model, in_v, out_v, mesh=t.mesh,
                              aux_collections=tuple(sorted(t.aux)))
    pers = load_architecture("forecasting", dm, "persistence")
    clim = load_architecture("forecasting", dm, "climatology")
    # compare in DENORMALIZED (physical) space, matching the reference's
    # eval target-transform semantics: model/persistence emit normalized
    # fields, the climatology baseline emits raw climatology
    from orbit2_tpu.transforms.transforms import Denormalize

    denorm = Denormalize(dm)
    se = {"model": 0.0, "persistence": 0.0, "climatology": 0.0}
    n = 0
    for (x, y, *_rest) in dm.test_dataloader():
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        with t.mesh:
            if t.aux:
                yhat = eval_step(t.params, t.aux, xj, yj)
            else:
                yhat = eval_step(t.params, xj, yj)
        yd = denorm(yj)
        se["model"] += float(jnp.sum((denorm(yhat) - yd) ** 2))
        se["persistence"] += float(jnp.sum((denorm(pers(xj)) - yd) ** 2))
        se["climatology"] += float(jnp.sum((clim(xj) - yd) ** 2))
        n += int(np.prod(y.shape))
    rmse = {k: round(float(np.sqrt(v / n)), 4) for k, v in se.items()}
    record(dict(case="forecasting_onchip", epochs=len(hist),
                loss_first=round(losses[0], 4), loss_last=round(losses[-1], 4),
                samples_per_s=round(sps, 1), wall_s=round(wall, 1),
                n_train_samples=n_samples, test_rmse=rmse,
                beats_persistence=rmse["model"] < rmse["persistence"],
                beats_climatology=rmse["model"] < rmse["climatology"]))


def climatebench_run():
    import jax
    import jax.numpy as jnp

    import orbit2_tpu as cl
    from orbit2_tpu.data.climatebench import ClimateBenchDataModule
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import (
        evaluate_batch,
        make_eval_step,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    t_len, c, h, w = (200, 4, 8, 16) if QUICK else (200, 4, 32, 64)
    forcing = rng.normal(size=(t_len, c, h, w)).astype(np.float32)
    # learnable response: temperature anomaly = smoothed cumulative forcing
    kernel = rng.normal(size=(c,)).astype(np.float32) / np.sqrt(c)
    resp = np.einsum("tchw,c->thw", forcing, kernel)
    resp = (np.roll(resp, 1, 1) + resp + np.roll(resp, -1, 1)) / 3
    y = (15.0 + 2.0 * resp[:, None] + rng.normal(
        0, 0.05, size=(t_len, 1, h, w))).astype(np.float32)
    lat = np.linspace(-88, 88, h)
    lon = np.linspace(0, 358, w)
    dm = ClimateBenchDataModule(
        history=10, batch_size=16,
        _arrays=({"ssp245": forcing}, {"ssp245": y}, lat, lon),
        list_train_simu=("ssp245",), list_test_simu=("ssp245",))

    model, train_loss, _val, test_losses, _tt, _vt, test_transforms = (
        cl.load_climatebench_module(data_module=dm,
                                    architecture="rasp-theurey-2020"))
    in_vars, out_vars = dm.get_data_variables()
    x0, y0, *_ = next(iter(dm.train_dataloader()))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x0[:1]), in_vars, out_vars,
                           deterministic=True)
    params, aux = variables["params"], {"batch_stats":
                                        variables["batch_stats"]}
    tx = make_optimizer("adam", {"lr": 2e-3})
    opt_state = tx.init(params)
    step = make_train_step(model, train_loss, None, tx, in_vars, out_vars,
                           aux_collections=("batch_stats",))
    key = jax.random.PRNGKey(1)
    losses, n_steps, t_steady = [], 0, None
    t0 = time.perf_counter()
    for epoch in range(2 if QUICK else 8):
        for (x, yb, *_r) in dm.train_dataloader():
            params, aux, opt_state, loss = step(
                params, aux, opt_state, jnp.asarray(x), jnp.asarray(yb),
                jax.random.fold_in(key, n_steps))
            n_steps += 1
        losses.append(float(loss))
        if epoch == 0:
            float(loss)
            t_steady = time.perf_counter()
            steps_at_steady = n_steps
    float(loss)
    wall = time.perf_counter() - t0
    sps = ((n_steps - steps_at_steady) * 16 /
           max(1e-9, time.perf_counter() - t_steady))

    eval_step = make_eval_step(model, in_vars, out_vars,
                               aux_collections=("batch_stats",))
    agg = {}
    nb = 0
    for (xt, yt, *_r) in dm.test_dataloader():
        yhat = eval_step(params, aux, jnp.asarray(xt), jnp.asarray(yt))
        m = evaluate_batch(yhat, jnp.asarray(yt), "test", test_losses,
                           test_transforms, out_vars)
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + float(v)
        nb += 1
    metrics = {k: round(v / nb, 4) for k, v in agg.items()}
    record(dict(case="climatebench_onchip", epochs=len(losses),
                loss_first=round(losses[0], 4), loss_last=round(losses[-1], 4),
                samples_per_s=round(sps, 1), wall_s=round(wall, 1),
                test_metrics=metrics,
                all_finite=all(np.isfinite(v) for v in metrics.values())))


def main():
    import jax

    if not QUICK:
        try:
            assert jax.default_backend() == "tpu", jax.default_backend()
        except Exception as e:
            print(f"backend claim failed: {e}", flush=True)
            raise SystemExit(7)
    forecasting_run()
    climatebench_run()
    print("TASKS BATCH COMPLETE", flush=True)


if __name__ == "__main__":
    main()
