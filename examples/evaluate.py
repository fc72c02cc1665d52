#!/usr/bin/env python
"""Test-split evaluation: per-variable RMSE / Pearson / mean-bias from a
checkpoint — the RMSE-parity harness (SURVEY.md §7 M6). Accepts native Orbax
checkpoints or reference PyTorch state_dicts exported to .npz (imported via
training.checkpoint.import_torch_state_dict).

Usage: python examples/evaluate.py configs/interm_117m.yaml \
           [--checkpoint PATH | --torch-npz PATH] [--max-batches N]
"""

import argparse
import json
import logging

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--torch-npz", default=None,
                   help="reference state_dict exported as npz of numpy arrays")
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--data-key", default=None)
    p.add_argument("--quant", default="none", choices=["none", "w8a8"],
                   help="w8a8: serve the trunk on the int8 MXU path "
                        "(1.9x vs bf16 at 1B shapes, ~1%% rel RMSE — "
                        "docs/performance.md)")
    args = p.parse_args()

    from orbit2_tpu.config import load_config
    from orbit2_tpu.training import checkpoint as ck
    from orbit2_tpu.training.trainer import Trainer

    cfg = load_config(args.config)
    trainer = Trainer(cfg)
    data_key = args.data_key or next(iter(cfg.data.low_res_dir))

    if args.torch_npz:
        dm = trainer._make_data_module(data_key)
        dm.setup()
        trainer._build_model(dm, data_key)
        model = trainer._phase_model(dm, data_key)
        params = trainer._init_params(model, dm)
        raw = dict(np.load(args.torch_npz, allow_pickle=True))
        pre = ck.import_torch_state_dict(raw, depth=cfg.model.depth,
                                         decoder_depth=cfg.model.decoder_depth)
        in_shape, _ = dm.get_data_dims()
        merged, report = ck.load_pretrained_params(
            params, pre, patch_size=cfg.model.patch_size, img_size=in_shape[2:])
        logging.info("torch import: %d used / %d dropped / %d resized",
                     len(report["used"]), len(report["dropped"]),
                     len(report["resized"]))
        trainer.params = merged
    elif args.checkpoint or ck.latest_checkpoint(trainer.checkpoint_dir):
        path = args.checkpoint or ck.latest_checkpoint(trainer.checkpoint_dir)
        state = ck.restore_checkpoint(path)
        trainer.params = state["params"]
        if "aux" in state:  # conv presets: evaluate with the TRAINED
            trainer.aux = state["aux"]  # BatchNorm stats, not fresh inits
        logging.info("loaded %s (epoch %s)", path, state.get("epoch"))
    else:
        logging.warning("no checkpoint — evaluating untrained weights")

    means = trainer.test(data_key=data_key, max_batches=args.max_batches,
                         quant=args.quant)
    print(json.dumps({k: round(float(v), 6) for k, v in means.items()},
                     indent=2))


if __name__ == "__main__":
    main()
