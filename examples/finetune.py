#!/usr/bin/env python
"""ERA5 -> PRISM/DAYMET fine-tuning entry point (reference
examples/era5_daymet_downscaling.py:201-572): argparse-style CLI, choice of
architecture and loss, pretrained-weight import with key filtering +
pos-embed resize (reference :56-81).
"""

import argparse
import logging

import jax
import numpy as np


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--pretrain", required=False,
                   help="Orbax checkpoint dir or converted-torch .npz")
    p.add_argument("--arch", default="res_slimvit",
                   choices=["resnet", "unet", "vit", "res_slimvit"])
    p.add_argument("--loss", default="mse",
                   choices=["mse", "perceptual", "quantile", "imagegradient",
                            "masked_mse", "bayesian_tv"])
    p.add_argument("--max-epochs", type=int, default=None)
    args = p.parse_args()

    from orbit2_tpu.config import load_config
    from orbit2_tpu.training import checkpoint as ck
    from orbit2_tpu.training.trainer import Trainer

    cfg = load_config(args.config)
    cfg.model.preset = args.arch
    cfg.trainer.train_loss = args.loss

    trainer = Trainer(cfg)

    if args.pretrain:
        # initialize, then merge pretrained weights with the reference's
        # filtering semantics before training starts
        data_key = next(iter(cfg.data.low_res_dir))
        dm = trainer._make_data_module(data_key)
        dm.setup()
        trainer._build_model(dm, data_key)
        model = trainer._phase_model(dm, data_key)
        params = trainer._init_params(model, dm)
        if args.pretrain.endswith(".npz"):
            raw = dict(np.load(args.pretrain, allow_pickle=True))
            pre = ck.import_torch_state_dict(
                raw, depth=cfg.model.depth,
                decoder_depth=cfg.model.decoder_depth)
        else:
            pre_state = ck.restore_checkpoint(args.pretrain)
            pre = pre_state["params"]
            if "aux" in pre_state:  # start conv fine-tunes from the
                trainer.aux = pre_state["aux"]  # pretrained BatchNorm stats
        in_shape, _ = dm.get_data_dims()
        merged, report = ck.load_pretrained_params(
            params, pre, patch_size=cfg.model.patch_size,
            img_size=in_shape[2:])
        logging.info("pretrain import: %d used, %d dropped, %d resized",
                     len(report["used"]), len(report["dropped"]),
                     len(report["resized"]))
        trainer.params = merged

    trainer.fit(max_epochs=args.max_epochs)


if __name__ == "__main__":
    main()
