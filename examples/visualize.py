#!/usr/bin/env python
"""Stitched-inference visualization entry point (reference
examples/visualize.py): load a checkpoint, run tile-stitched inference on a
test sample, dump PNG/npy + PSNR/SSIM.

Usage: python examples/visualize.py configs/inference.yaml [--index N]
"""

import argparse
import logging

import jax
import jax.numpy as jnp


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out-dir", default="visualizations")
    p.add_argument("--quant", default="none", choices=["none", "w8a8"],
                   help="w8a8: stitch through the int8 serving trunk "
                        "(1.9x at 1B shapes — docs/performance.md)")
    args = p.parse_args()

    from orbit2_tpu.config import load_config
    from orbit2_tpu.training import checkpoint as ck
    from orbit2_tpu.training.trainer import Trainer
    from orbit2_tpu.utils.visualize import visualize_at_index

    cfg = load_config(args.config)
    trainer = Trainer(cfg)
    data_key = next(iter(cfg.data.low_res_dir))
    # tiled module: defines the model's per-tile geometry (what it trained on)
    dm = trainer._make_data_module(data_key)
    dm.setup()
    trainer._build_model(dm, data_key)
    model = trainer._phase_model(dm, data_key)
    trainer.params = trainer._init_params(model, dm)
    # UNTILED module: locates the full test sample for stitched inference —
    # the reference builds a second dm_vis with div=1/overlap=0
    # (visualize.py:360-378); feeding the tiled module here would treat one
    # halo tile as the whole field and re-tile it
    if cfg.tiling.effective_div > 1:
        dm_vis = trainer._make_data_module(data_key, div=1, overlap=0)
        dm_vis.setup()
    else:
        dm_vis = dm

    path = args.checkpoint or cfg.trainer.checkpoint or ck.latest_checkpoint(
        trainer.checkpoint_dir)
    if path:
        state = ck.restore_checkpoint(path)
        # merge with the reference's filtering semantics: a checkpoint from a
        # different tiling/resolution gets its learned pos_embed bicubically
        # resized instead of crashing (reference visualize.py:94-97); an
        # exact-match checkpoint passes through unchanged
        in_shape, _ = dm.get_data_dims()
        trainer.params, report = ck.load_pretrained_params(
            trainer.params, state["params"], patch_size=cfg.model.patch_size,
            img_size=in_shape[2:])
        logging.info("loaded checkpoint %s (epoch %s): %d used / %d dropped"
                     " / %d resized", path, state.get("epoch"),
                     len(report["used"]), len(report["dropped"]),
                     len(report["resized"]))
    else:
        logging.warning("no checkpoint found — visualizing untrained weights")

    in_vars, out_vars = dm.get_data_variables()
    # conv presets (unet/resnet) carry BatchNorm running stats in aux
    # collections — the restored checkpoint's if present, else init values
    aux = state.get("aux", trainer.aux) if path else trainer.aux
    params = trainer.params
    if args.quant != "none":
        model, params = trainer._quantize_for_serving(args.quant, model, dm,
                                                      params)
    fwd = jax.jit(lambda x: model.apply(
        {"params": params, **aux}, jnp.asarray(x), tuple(in_vars),
        tuple(out_vars), deterministic=True))

    res = visualize_at_index(
        fwd, dm_vis, index=args.index, div=cfg.tiling.effective_div,
        overlap=cfg.tiling.effective_overlap, mag=cfg.model.superres_mag,
        out_dir=args.out_dir,
    )
    for var, m in res["metrics"].items():
        logging.info("%s: PSNR=%.2f SSIM=%.4f", var, m["psnr"], m["ssim"])
    return res


if __name__ == "__main__":
    main()
