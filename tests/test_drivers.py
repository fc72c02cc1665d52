"""Driver-level tests for the example entry points.

The reference's inference driver builds TWO data modules — tiled for the
model, UNTILED (div=1, overlap=0) for locating and stitching the full
sample (reference examples/visualize.py:341-378). These tests run our
actual `examples/visualize.py` main() on the synthetic dataset and assert
the output is a full stitched globe, not an SR of one halo tile.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_example(name):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(ROOT, "examples", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def tiled_inference_cfg(synth_dataset, tmp_path):
    ds = synth_dataset
    return {
        "trainer": {"max_epochs": 1, "batch_size": 2, "buffer_size": 4,
                    "num_workers": 0, "data_type": "float32",
                    "train_loss": "bayesian_tv", "remat": False},
        "parallelism": {"fsdp": 2},
        "tiling": {"do_tiling": True, "div": 2, "overlap": 2},
        "model": {"preset": "res_slimvit", "lr": 1e-3, "warmup_epochs": 1,
                  "superres_mag": 4, "patch_size": 2, "embed_dim": 32,
                  "depth": 1, "decoder_depth": 1, "num_heads": 2,
                  "drop_path": 0.0, "drop_rate": 0.0,
                  "attention_impl": "xla"},
        "data": {
            "low_res_dir": {"S": ds["low"]},
            "high_res_dir": {"S": ds["high"]},
            "spatial_resolution": {"S": 625},
            "default_vars": list(ds["in_vars"]),
            "dict_in_variables": {"S": list(ds["in_vars"])},
            "dict_out_variables": {"S": list(ds["out_vars"])},
            "var_weights": {},
        },
    }


def test_visualize_driver_emits_full_stitched_globe(
        tiled_inference_cfg, tmp_path, monkeypatch):
    """With do_tiling (div=2) the driver must stitch the FULL field: the
    located sample is untiled [C, 16, 32] and the prediction covers the
    whole [C_out, 64, 128] globe — the round-2 bug treated one 12x20 halo
    tile as the full field and re-tiled it."""
    cfg_path = tmp_path / "vis.yaml"
    cfg_path.write_text(yaml.safe_dump(tiled_inference_cfg))
    out_dir = tmp_path / "viz"

    mod = load_example("visualize")
    monkeypatch.setattr(sys, "argv", [
        "visualize.py", str(cfg_path), "--index", "1",
        "--out-dir", str(out_dir)])
    res = mod.main()

    assert res["inputs"].shape == (7, 16, 32)        # full field, not a tile
    assert res["preds"].shape == (3, 64, 128)        # stitched globe
    assert res["groundtruth"].shape == (3, 64, 128)
    for var, m in res["metrics"].items():
        assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"])
    dumped = np.load(out_dir / "pred_total_precipitation_24hr_1.npy")
    assert dumped.shape == (64, 128)


def test_visualize_driver_w8a8_stitches_close_to_fp(
        tiled_inference_cfg, tmp_path, monkeypatch):
    """`visualize.py --quant w8a8` stitches through the int8 trunk: same
    output geometry, prediction within a few percent of the fp stitch."""
    cfg_path = tmp_path / "vis_q.yaml"
    cfg_path.write_text(yaml.safe_dump(tiled_inference_cfg))

    mod = load_example("visualize")
    monkeypatch.setattr(sys, "argv", [
        "visualize.py", str(cfg_path), "--index", "1",
        "--out-dir", str(tmp_path / "viz_fp")])
    fp = mod.main()
    monkeypatch.setattr(sys, "argv", [
        "visualize.py", str(cfg_path), "--index", "1",
        "--out-dir", str(tmp_path / "viz_q8"), "--quant", "w8a8"])
    q8 = mod.main()

    assert q8["preds"].shape == fp["preds"].shape == (3, 64, 128)
    a, b = np.asarray(fp["preds"]), np.asarray(q8["preds"])
    rel = float(np.sqrt(np.mean((a - b) ** 2)) / (np.std(a) + 1e-9))
    assert rel < 0.05, rel
    assert not np.allclose(a, b)  # int8 actually ran


@pytest.fixture
def driver_cfg(synth_dataset):
    """Untiled tiny config dict for the train/evaluate/finetune drivers —
    world_size 8 matches the virtual CPU mesh."""
    ds = synth_dataset
    return {
        "trainer": {"max_epochs": 1, "batch_size": 4, "buffer_size": 8,
                    "num_workers": 0, "data_type": "float32",
                    "train_loss": "bayesian_tv", "remat": False},
        "parallelism": {"fsdp": 2, "simple_ddp": 2, "tensor_par": 2},
        "tiling": {"do_tiling": False},
        "model": {"preset": "res_slimvit", "lr": 1e-3, "warmup_epochs": 1,
                  "superres_mag": 4, "patch_size": 2, "embed_dim": 32,
                  "depth": 1, "decoder_depth": 1, "num_heads": 2,
                  "drop_path": 0.0, "drop_rate": 0.0,
                  "attention_impl": "xla"},
        "data": {
            "low_res_dir": {"S": ds["low"]},
            "high_res_dir": {"S": ds["high"]},
            "spatial_resolution": {"S": 625},
            "default_vars": list(ds["in_vars"]),
            "dict_in_variables": {"S": list(ds["in_vars"])},
            "dict_out_variables": {"S": list(ds["out_vars"])},
            "var_weights": {},
        },
    }


def test_train_driver_end_to_end(driver_cfg, tmp_path, monkeypatch):
    """examples/train.py main(): config -> Trainer.fit -> checkpoint on disk.
    The checkpoint dir is cwd-relative (reference checkpoints/climate), so
    the driver runs chdir'd into tmp."""
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_path)])

    load_example("train").main()

    assert os.path.isdir(tmp_path / "checkpoints" / "climate" / "epoch_0")


def test_train_driver_scales_down_parallelism(driver_cfg, tmp_path,
                                              monkeypatch):
    """A config sized for 16 devices on an 8-device host: the driver shrinks
    the axes (tensor first preserved by gcd, fsdp-first like HYBRID_SHARD)
    while keeping the data axes dividing the batch, and still trains."""
    driver_cfg["parallelism"] = {"fsdp": 4, "simple_ddp": 2, "tensor_par": 2}
    cfg_path = tmp_path / "train16.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_path)])

    load_example("train").main()

    assert os.path.isdir(tmp_path / "checkpoints" / "climate" / "epoch_0")


def test_evaluate_driver_reports_test_metrics(driver_cfg, tmp_path,
                                              monkeypatch, capsys):
    """examples/evaluate.py main(): restores the latest checkpoint written
    by the train driver (cwd-relative) and prints a JSON dict of finite
    per-variable test metrics (rmse/pearson/mean_bias)."""
    cfg_path = tmp_path / "eval.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_path)])
    load_example("train").main()

    monkeypatch.setattr(sys, "argv",
                        ["evaluate.py", str(cfg_path), "--max-batches", "2"])
    import json

    capsys.readouterr()
    load_example("evaluate").main()
    means = json.loads(capsys.readouterr().out)
    assert any("rmse" in k for k in means)
    assert all(np.isfinite(v) for v in means.values())


def test_finetune_driver_imports_pretrain(driver_cfg, tmp_path, monkeypatch,
                                          caplog):
    """examples/finetune.py main(): loads an Orbax pretrain checkpoint with
    the reference's key-filter semantics, then trains."""
    import logging

    cfg_path = tmp_path / "ft.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_path)])
    load_example("train").main()
    pretrain = str(tmp_path / "checkpoints" / "climate" / "epoch_0")

    ft_dir = tmp_path / "ft_run"
    ft_dir.mkdir()
    monkeypatch.chdir(ft_dir)
    monkeypatch.setattr(sys, "argv", [
        "finetune.py", str(cfg_path), "--pretrain", pretrain,
        "--loss", "mse", "--max-epochs", "1"])
    with caplog.at_level(logging.INFO):
        load_example("finetune").main()

    assert os.path.isdir(ft_dir / "checkpoints" / "climate" / "epoch_0")
    imports = [r for r in caplog.records if "pretrain import" in r.getMessage()]
    assert imports and imports[0].args[0] > 0  # used > 0 keys


def _write_masked_high_res(base, out_vars, h, w, t=8, border=4):
    """PRISM-like high-res target set: -9999 nodata outside an interior
    window (the conterminous-US analogue), reference prism NODATA."""
    rng = np.random.default_rng(7)
    for split in ("train", "val", "test"):
        d = base / split
        d.mkdir(parents=True, exist_ok=True)
        for i in range(2):
            arrays = {}
            for v in out_vars:
                a = rng.normal(280, 10, size=(t, 1, h, w)).astype(np.float32)
                a[..., :border, :] = -9999.0
                a[..., -border:, :] = -9999.0
                a[..., :, :border] = -9999.0
                a[..., :, -border:] = -9999.0
                arrays[v] = a
            np.savez(d / f"shard_{i}.npz", **arrays)
        clim = {v: rng.normal(280, 1, size=(1, h, w)).astype(np.float32)
                for v in out_vars}
        np.savez(d / "climatology.npz", **clim)
    np.save(base / "lat.npy", np.linspace(24, 50, h).astype(np.float32))
    np.save(base / "lon.npy", np.linspace(235, 294, w).astype(np.float32))
    np.savez(base / "normalize_mean.npz",
             **{v: np.array([280.0], dtype=np.float32) for v in out_vars})
    np.savez(base / "normalize_std.npz",
             **{v: np.array([10.0], dtype=np.float32) for v in out_vars})


def test_finetune_driver_masked_mse_end_to_end(driver_cfg, tmp_path,
                                               monkeypatch, caplog):
    """Masked fine-tune (reference era5_daymet_downscaling.py:204-216 offers
    masked_mse; its experiments wire Mask(dm.get_out_mask())): targets carry
    a -9999 PRISM-style border, the driver derives the validity mask, wires
    it into the loss, and trains end-to-end."""
    import logging

    high = tmp_path / "high_masked"
    _write_masked_high_res(high, driver_cfg["data"]["dict_out_variables"]["S"],
                           64, 128)
    driver_cfg["data"]["high_res_dir"] = {"S": str(high)}
    cfg_path = tmp_path / "ft_masked.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "finetune.py", str(cfg_path), "--loss", "masked_mse",
        "--max-epochs", "1"])
    with caplog.at_level(logging.INFO):
        load_example("finetune").main()

    assert os.path.isdir(tmp_path / "checkpoints" / "climate" / "epoch_0")
    wired = [r for r in caplog.records
             if "wired validity mask" in r.getMessage()]
    assert wired
    valid_pct = wired[0].args[0]
    expected = 100.0 * (64 - 8) * (128 - 8) / (64 * 128)
    assert valid_pct == pytest.approx(expected, abs=0.1)


def test_visualize_driver_resizes_checkpoint_pos_embed(
        tiled_inference_cfg, tmp_path, monkeypatch, caplog):
    """The reference trains at one tile geometry and infers at another
    (interm_1b: div4/ov3 -> inference.yaml: div4/ov2), interpolating the
    learned pos_embed on checkpoint load (its visualize.py:94-97). Train at
    overlap=2, visualize at overlap=0: the driver must resize pos_embed and
    still emit the full stitched globe."""
    import logging

    train_cfg = dict(tiled_inference_cfg)
    cfg_path = tmp_path / "train_tiled.yaml"
    cfg_path.write_text(yaml.safe_dump(train_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_path)])
    load_example("train").main()
    ckpt = tmp_path / "checkpoints" / "climate" / "epoch_0"
    assert ckpt.is_dir()

    vis_cfg = yaml.safe_load(yaml.safe_dump(tiled_inference_cfg))
    vis_cfg["tiling"]["overlap"] = 0  # different tile size -> pos_embed resize
    vis_path = tmp_path / "vis_ov0.yaml"
    vis_path.write_text(yaml.safe_dump(vis_cfg))
    monkeypatch.setattr(sys, "argv", [
        "visualize.py", str(vis_path), "--index", "0",
        "--checkpoint", str(ckpt), "--out-dir", str(tmp_path / "viz2")])
    with caplog.at_level(logging.INFO):
        res = load_example("visualize").main()

    assert res["preds"].shape == (3, 64, 128)
    loaded = [r for r in caplog.records
              if "loaded checkpoint" in r.getMessage()]
    assert loaded
    n_used, n_dropped, n_resized = loaded[0].args[2:5]
    assert n_used > 0 and n_resized >= 1 and n_dropped == 0


def test_visualize_driver_resnet_batch_stats(driver_cfg, tmp_path,
                                             monkeypatch):
    """Conv presets carry BatchNorm running stats in aux collections; the
    visualize driver's jitted forward must thread them (a params-only apply
    crashes with a missing-collection error)."""
    driver_cfg["model"]["preset"] = "resnet"
    driver_cfg["parallelism"] = {"fsdp": 2}
    cfg_path = tmp_path / "vis_resnet.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "visualize.py", str(cfg_path), "--index", "0",
        "--out-dir", str(tmp_path / "viz_rn")])
    res = load_example("visualize").main()
    assert res["preds"].shape == (3, 64, 128)
    for m in res["metrics"].values():
        assert np.isfinite(m["psnr"])


def test_evaluate_driver_resnet_uses_trained_batch_stats(
        driver_cfg, tmp_path, monkeypatch, capsys):
    """A conv checkpoint carries trained BatchNorm stats; evaluate must
    restore them (not re-init fresh) and produce finite metrics."""
    import json

    driver_cfg["model"]["preset"] = "resnet"
    driver_cfg["parallelism"] = {"fsdp": 2}
    cfg_path = tmp_path / "eval_rn.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_path)])
    load_example("train").main()

    monkeypatch.setattr(sys, "argv",
                        ["evaluate.py", str(cfg_path), "--max-batches", "2"])
    capsys.readouterr()
    load_example("evaluate").main()
    means = json.loads(capsys.readouterr().out)
    assert means and all(np.isfinite(v) for v in means.values())


def test_evaluate_restores_on_different_mesh_shape(
        driver_cfg, tmp_path, monkeypatch, capsys):
    """Save on a 4-device mesh, evaluate on a 2-device mesh: test() must
    re-shard the restored params/aux onto ITS mesh (reference resume
    semantics, intermediate_downscaling.py:659-672) instead of jitting
    over mismatched device sets — the round-3 shipped bug."""
    import json

    driver_cfg["model"]["preset"] = "resnet"
    driver_cfg["parallelism"] = {"fsdp": 4}
    cfg_a = tmp_path / "save4.yaml"
    cfg_a.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_a)])
    load_example("train").main()

    driver_cfg["parallelism"] = {"fsdp": 2}
    cfg_b = tmp_path / "load2.yaml"
    cfg_b.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.setattr(sys, "argv",
                        ["evaluate.py", str(cfg_b), "--max-batches", "2"])
    capsys.readouterr()
    load_example("evaluate").main()
    means = json.loads(capsys.readouterr().out)
    assert means and all(np.isfinite(v) for v in means.values())


def test_evaluate_driver_w8a8_quantized_serving(
        driver_cfg, tmp_path, monkeypatch, capsys):
    """`evaluate.py --quant w8a8` serves the trained checkpoint through the
    int8 trunk (Trainer.test(quant=...) -> utils/quantize.py): metrics stay
    finite and within a few percent of the fp eval of the SAME checkpoint."""
    import json

    cfg_path = tmp_path / "eval_q.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_path)])
    load_example("train").main()

    monkeypatch.setattr(sys, "argv",
                        ["evaluate.py", str(cfg_path), "--max-batches", "2"])
    capsys.readouterr()
    load_example("evaluate").main()
    fp = json.loads(capsys.readouterr().out)

    monkeypatch.setattr(sys, "argv",
                        ["evaluate.py", str(cfg_path), "--max-batches", "2",
                         "--quant", "w8a8"])
    load_example("evaluate").main()
    q8 = json.loads(capsys.readouterr().out)

    assert set(q8) == set(fp)
    for k in fp:
        assert np.isfinite(q8[k]), k
    rmse_keys = [k for k in fp if "rmse" in k]
    assert rmse_keys
    for k in rmse_keys:
        assert abs(q8[k] - fp[k]) <= 0.05 * abs(fp[k]) + 1e-3, (k, fp[k], q8[k])


def test_trainer_quant_eval_does_not_poison_fp_state(driver_cfg, tmp_path,
                                                     monkeypatch):
    """Trainer.test(quant="w8a8") must leave trainer.params in fp: a later
    fp test()/visualize on the SAME trainer would otherwise apply the fp
    model to int8 kernels (the verify-drive regression)."""
    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.trainer import Trainer

    import jax
    import jax.numpy as jnp

    monkeypatch.chdir(tmp_path)
    t = Trainer(load_config(driver_cfg))
    t.fit(max_epochs=1, max_steps_per_epoch=2)
    fp1 = t.test(max_batches=1)
    q8 = t.test(max_batches=1, quant="w8a8")
    assert all(np.isfinite(v) for v in q8.values())
    # params are still the fp tree and fp eval still works, bit-identically
    assert jax.tree.all(jax.tree.map(
        lambda l: l.dtype != jnp.int8, t.params))
    fp2 = t.test(max_batches=1)
    assert fp1 == fp2


def test_visualize_untiled_module_matches_direct_forward(synth_dataset):
    """Equality check behind the driver fix: with an untiled module and a
    geometry-agnostic forward, the stitched prediction is EXACTLY the
    forward applied to the full sample — no seams, no tile-sized output."""
    from orbit2_tpu.data.itermodule import IterDataModule
    from orbit2_tpu.utils.visualize import visualize_at_index

    ds = synth_dataset
    dm_vis = IterDataModule(
        "downscaling", ds["low"], ds["high"], list(ds["in_vars"]),
        out_vars=list(ds["out_vars"]), batch_size=1, buffer_size=4,
        num_workers=0, div=1, overlap=0)
    dm_vis.setup()

    def fake_forward(x):  # [1, C, h, w] -> [1, 3, 4h, 4w]
        up = np.repeat(np.repeat(np.asarray(x), 4, axis=2), 4, axis=3)
        return up[:, :3]

    res = visualize_at_index(fake_forward, dm_vis, index=0,
                             div=2, overlap=2, mag=4)
    full = fake_forward(res["inputs"][None])[0]
    # denormalized equality: stitched == direct (both pass through the same
    # Denormalize), so compare pre-metric predictions to the denormalized
    # direct forward via the stitching identity on normalized fields
    from orbit2_tpu.utils.visualize import stitched_inference
    stitched = stitched_inference(fake_forward, res["inputs"], 2, 2, 4)
    np.testing.assert_allclose(stitched, full, rtol=1e-6)
    assert res["preds"].shape == full.shape


def test_visualize_dataset_derived_flip(synth_dataset):
    """Reference visualize flips ERA5/PRISM/DAYMET north-up, gated on the
    src name (visualize.py:263,285,303). Here the gate is dataset-derived:
    ascending-latitude storage (the synth set: linspace(-88, 88)) flips by
    default; an explicit flip=False override returns storage order; both
    keep pred/gt aligned."""
    from orbit2_tpu.data.itermodule import IterDataModule
    from orbit2_tpu.utils.visualize import dataset_flips, visualize_at_index

    ds = synth_dataset
    dm = IterDataModule(
        "downscaling", ds["low"], ds["high"], list(ds["in_vars"]),
        out_vars=list(ds["out_vars"]), batch_size=1, buffer_size=4,
        num_workers=0, div=1, overlap=0)
    dm.setup()
    assert dataset_flips(dm)  # lat ascending -> ERA5-style flip

    def fake_forward(x):
        return np.repeat(np.repeat(np.asarray(x), 4, axis=2), 4, axis=3)[:, :3]

    auto = visualize_at_index(fake_forward, dm, index=0, div=1, overlap=0,
                              mag=4)
    raw = visualize_at_index(fake_forward, dm, index=0, div=1, overlap=0,
                             mag=4, flip=False)
    np.testing.assert_allclose(auto["preds"], raw["preds"][:, ::-1])
    np.testing.assert_allclose(auto["groundtruth"],
                               raw["groundtruth"][:, ::-1])

    class DescendingLat:
        """A module whose storage is already north-up (descending lat)."""

        def get_lat_lon(self):
            return np.linspace(88, -88, 16), np.linspace(0, 358, 32)

    assert not dataset_flips(DescendingLat())


def test_data_seed_decouples_data_order_from_model_seed(driver_cfg, tmp_path):
    """trainer.data_seed varies data order without touching model init
    (docs/multihost_data.md): the data module's shuffle seed follows
    data_seed when set, else trainer.seed."""
    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.trainer import Trainer

    cfg_path = tmp_path / "ds.yaml"
    cfg_path.write_text(yaml.safe_dump(driver_cfg))
    t = Trainer(load_config(str(cfg_path)))
    assert t._make_data_module("S").seed == t.cfg.trainer.seed

    driver_cfg["trainer"]["data_seed"] = 1234
    cfg_path2 = tmp_path / "ds2.yaml"
    cfg_path2.write_text(yaml.safe_dump(driver_cfg))
    t2 = Trainer(load_config(str(cfg_path2)))
    dm2 = t2._make_data_module("S")
    assert dm2.seed == 1234
    # the shuffled train stream actually differs between the two seeds
    dm1 = t._make_data_module("S")
    dm1.setup()
    dm2.setup()
    b1 = np.asarray(next(iter(dm1.train_dataloader()))[0])
    b2 = np.asarray(next(iter(dm2.train_dataloader()))[0])
    assert b1.shape == b2.shape
    assert np.abs(b1 - b2).max() > 0


def test_parallelism_auto_resolves_mesh_and_trains(driver_cfg, tmp_path):
    """parallelism: auto — the Trainer runs the scaling planner at startup,
    picks the least-traffic HBM-fitting mesh for the live device count
    (8 virtual), writes it back into cfg.parallelism, logs the candidate
    table, and trains (VERDICT r4 next #7)."""
    import json

    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.trainer import Trainer

    driver_cfg["parallelism"] = {"auto": True}
    metrics_path = tmp_path / "metrics.jsonl"
    t = Trainer(load_config(driver_cfg),
                checkpoint_dir=str(tmp_path / "ck"),
                metrics_path=str(metrics_path))
    shape = dict(t.mesh.shape)
    assert int(np.prod(list(shape.values()))) == 8
    p = t.cfg.parallelism
    assert (p.fsdp, p.simple_ddp, p.tensor_par, p.seq_par, p.pipeline,
            p.expert_par) == (shape["fsdp"], shape["replica"],
                              shape["tensor"], shape["seq"], shape["stage"],
                              shape["expert"])
    assert not p.auto  # resolved to a concrete config
    hist = t.fit(max_epochs=1, max_steps_per_epoch=2)
    assert hist and np.isfinite(hist[-1]["loss"])
    # the decision is auditable: chosen + candidate rows in the JSONL
    recs = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    auto = [r for r in recs if r.get("event") == "auto_mesh"]
    assert auto and auto[0]["chosen"] == shape
    assert len(auto[0]["candidates"]) >= 2


def test_parallelism_auto_rejects_explicit_sizes():
    from orbit2_tpu.config import Config, ConfigError, ParallelismConfig

    with pytest.raises(ConfigError, match="auto"):
        Config(parallelism=ParallelismConfig(auto=True, fsdp=2)).validate()
