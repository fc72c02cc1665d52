#!/usr/bin/env python
"""Side-by-side RMSE parity vs the PyTorch reference (BASELINE.json: "val
RMSE within 1% of the reference").

Loads a reference checkpoint (single `.ckpt`, or any `.ckpt_rank_R` of a
tensor-parallel family — siblings are auto-consolidated), instantiates BOTH
the torch reference Res_Slim_ViT (CPU, gloo, FusedAttn.NONE — via
orbit2_tpu.utils.torch_reference) and this framework's ResSlimViT with the
SAME imported weights, runs both over the config's val split, and reports:

  * per-variable RMSE of each model vs ground truth, and the relative delta
  * max |torch_out - jax_out| over all evaluated batches

With --random-init (no checkpoint), the torch model's fresh initialization
is exported and imported — parity of the forward graph is still fully
exercised, only the weights aren't trained.

Usage:
  python examples/parity_eval.py configs/interm_117m.yaml \
      [--checkpoint /path/interm_epoch_09.ckpt[_rank_0]] [--max-batches N]
"""

import argparse
import json
import logging

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None,
                   help=".ckpt or .ckpt_rank_R reference checkpoint")
    p.add_argument("--random-init", action="store_true",
                   help="no checkpoint: compare with the torch init weights")
    p.add_argument("--max-batches", type=int, default=8)
    p.add_argument("--data-key", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="run the JAX side on CPU (the torch side always is)")
    args = p.parse_args()

    import torch

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        try:  # the axon plugin's chip claim can transiently fail
            jax.devices()
        except RuntimeError as e:
            logging.warning("accelerator unavailable (%s); falling back to CPU", e)
            jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.checkpoint import import_torch_state_dict
    from orbit2_tpu.training.trainer import Trainer
    from orbit2_tpu.utils.torch_reference import (
        load_reference_model,
        load_reference_state_dict,
        reference_available,
    )

    if not reference_available():
        raise SystemExit("reference source or torch unavailable")
    if not (args.checkpoint or args.random_init):
        raise SystemExit("pass --checkpoint PATH or --random-init")

    cfg = load_config(args.config)
    trainer = Trainer(cfg)
    data_key = args.data_key or next(iter(cfg.data.low_res_dir))
    dm = trainer._make_data_module(data_key)
    dm.setup()
    in_vars, out_vars = dm.get_data_variables()
    in_shape, _ = dm.get_data_dims()
    img = tuple(in_shape[2:])

    ref = load_reference_model(
        default_vars=cfg.data.default_vars, img_size=img,
        in_channels=len(in_vars), out_channels=len(out_vars),
        spatial_resolution=cfg.data.spatial_resolution[data_key],
        superres_mag=cfg.model.superres_mag, cnn_ratio=cfg.model.cnn_ratio,
        patch_size=cfg.model.patch_size, embed_dim=cfg.model.embed_dim,
        depth=cfg.model.depth, decoder_depth=cfg.model.decoder_depth,
        num_heads=cfg.model.num_heads, mlp_ratio=cfg.model.mlp_ratio)

    if args.checkpoint:
        sd = load_reference_state_dict(args.checkpoint, cfg.model.num_heads)
        ref.load_state_dict({k: torch.from_numpy(np.asarray(v))
                             for k, v in sd.items()})
    else:
        sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    trainer._build_model(dm, data_key)
    model = trainer._phase_model(dm, data_key)
    params = jax.tree.map(
        jnp.asarray,
        import_torch_state_dict(sd, depth=cfg.model.depth,
                                decoder_depth=cfg.model.decoder_depth))

    fwd = jax.jit(lambda p, xb: model.apply(
        {"params": p}, xb, tuple(in_vars), tuple(out_vars),
        deterministic=True))

    sq_ref = {v: 0.0 for v in out_vars}
    sq_jax = {v: 0.0 for v in out_vars}
    count = {v: 0 for v in out_vars}
    max_delta = 0.0
    n_batches = 0
    for batch in dm.val_dataloader():
        if n_batches >= args.max_batches:
            break
        x, y = np.asarray(batch[0]), np.asarray(batch[1])
        with torch.no_grad():
            o_ref = ref(torch.from_numpy(x), list(in_vars),
                        list(out_vars)).numpy()
        o_jax = np.asarray(fwd(params, jnp.asarray(x)), np.float32)
        max_delta = max(max_delta, float(np.abs(o_ref - o_jax).max()))
        yc = y[:, :, :o_ref.shape[2], :o_ref.shape[3]]
        for i, v in enumerate(out_vars):
            sq_ref[v] += float(((o_ref[:, i] - yc[:, i]) ** 2).sum())
            sq_jax[v] += float(((o_jax[:, i] - yc[:, i]) ** 2).sum())
            count[v] += yc[:, i].size
        n_batches += 1

    rows = {}
    worst = 0.0
    for v in out_vars:
        r_ref = (sq_ref[v] / max(count[v], 1)) ** 0.5
        r_jax = (sq_jax[v] / max(count[v], 1)) ** 0.5
        rel = abs(r_jax - r_ref) / max(abs(r_ref), 1e-12)
        worst = max(worst, rel)
        rows[v] = {"rmse_torch": round(r_ref, 6), "rmse_jax": round(r_jax, 6),
                   "rel_delta": round(rel, 6)}
        logging.info("%-32s torch %.6f  jax %.6f  delta %.4f%%",
                     v, r_ref, r_jax, 100 * rel)

    result = {"batches": n_batches, "max_abs_output_delta": max_delta,
              "worst_rel_rmse_delta": worst, "within_1pct": worst < 0.01,
              "per_variable": rows}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
