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
