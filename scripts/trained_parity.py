"""Trained-weights RMSE parity vs the PyTorch reference (BASELINE.json
acceptance: "val RMSE within 1% of the reference") — closes the loop that
random-init parity (examples/parity_eval.py --random-init) left open.

Three stages, all CPU:

1. Generate a LEARNABLE synthetic shard dataset in the reference npz layout
   (high-res = band-limited smooth fields, low-res inputs = their 4x
   down-mean), so the trained model encodes real structure.
2. Train the ACTUAL torch reference Res_Slim_ViT (reference train step:
   examples/intermediate_downscaling.py:281-306, plain fp32 AdamW at
   :726-742) for --steps steps through OUR IterDataModule loader, save a
   reference-format `interm_epoch_0.ckpt`, and run examples/parity_eval.py
   against it: per-variable RMSE delta must be < 1%.
3. 100-step training-trajectory parity from the SAME init on the SAME
   batches (extends tests/test_reference_model_parity.py's 5-step version);
   the per-step loss curves of both frameworks are written to
   docs/parity_trajectory.json for the overlay record.

Run: PYTHONPATH=/root/repo python scripts/trained_parity.py \
         [--steps 300] [--traj-steps 100] [--out /tmp/trained_parity]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_VARS = (
    "land_sea_mask", "orography", "lattitude", "landcover",
    "total_precipitation_24hr", "2m_temperature_min", "2m_temperature_max",
)
OUT_VARS = DEFAULT_VARS[4:]
H, W, MAG, T_PER_SHARD, N_SHARDS = 16, 32, 4, 16, 4
# "8m-scale": the reference's interm_8m geometry at CPU-feasible img size
EMBED, DEPTH, DEC_DEPTH, HEADS, P = 256, 6, 4, 4, 2
LR, BETAS, WD = 2e-3, (0.9, 0.99), 1e-5


def smooth_field(rng, n, h, w):
    """Band-limited random fields: the low-res down-mean fully determines
    the high-res target, so downscaling is learnable."""
    import jax
    import jax.numpy as jnp

    k = rng.normal(size=(n, h // 8, w // 8)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(k), (n, h, w), "bicubic"))


def write_dataset(root, rng):
    """Reference npz shard layout (conftest synth_dataset format), with
    learnable structure: out channels are smooth fields, the matching input
    channels are their MAG x down-mean."""
    low, high = os.path.join(root, "low"), os.path.join(root, "high")
    stats = {}
    for split, nsh in (("train", N_SHARDS), ("val", 2), ("test", 2)):
        os.makedirs(os.path.join(low, split), exist_ok=True)
        os.makedirs(os.path.join(high, split), exist_ok=True)
        for i in range(nsh):
            hi = {v: smooth_field(rng, T_PER_SHARD, H * MAG, W * MAG) * 10 + 280
                  for v in OUT_VARS}
            hi["total_precipitation_24hr"] = np.abs(
                hi["total_precipitation_24hr"] - 280) * 1e-4  # plausible tp
            lo_arrays, hi_arrays = {}, {}
            for v in DEFAULT_VARS:
                if v in OUT_VARS:
                    a = hi[v]
                    lo = a.reshape(T_PER_SHARD, H, MAG, W, MAG).mean((2, 4))
                    lo_arrays[v] = lo[:, None].astype(np.float32)
                    hi_arrays[v] = a[:, None].astype(np.float32)
                elif v == "lattitude":
                    lo_arrays[v] = np.tile(
                        np.linspace(-88, 88, H, dtype=np.float32)[None, None, :, None],
                        (T_PER_SHARD, 1, 1, W))
                else:
                    lo_arrays[v] = rng.normal(
                        0.5, 0.1, size=(T_PER_SHARD, 1, H, W)).astype(np.float32)
            np.savez(os.path.join(low, split, f"shard_{i}.npz"), **lo_arrays)
            np.savez(os.path.join(high, split, f"shard_{i}.npz"), **hi_arrays)
        for base, h, w, variables in ((low, H, W, DEFAULT_VARS),
                                      (high, H * MAG, W * MAG, OUT_VARS)):
            np.savez(os.path.join(base, split, "climatology.npz"),
                     **{v: np.full((1, h, w), 280.0, np.float32)
                        for v in variables})
    for base, h, w, variables in ((low, H, W, DEFAULT_VARS),
                                  (high, H * MAG, W * MAG, OUT_VARS)):
        np.save(os.path.join(base, "lat.npy"),
                np.linspace(-88, 88, h).astype(np.float32))
        np.save(os.path.join(base, "lon.npy"),
                np.linspace(0, 358, w).astype(np.float32))
        np.savez(os.path.join(base, "normalize_mean.npz"),
                 **{v: np.array([280.0 if v != "total_precipitation_24hr"
                                 else 0.0], np.float32) for v in variables})
        np.savez(os.path.join(base, "normalize_std.npz"),
                 **{v: np.array([10.0 if v != "total_precipitation_24hr"
                                 else 1.0], np.float32) for v in variables})
    return low, high


def write_config(root, low, high, batch_size=8):
    import yaml

    cfg = {
        "trainer": {"max_epochs": 1, "batch_size": batch_size,
                    "buffer_size": 32, "num_workers": 0,
                    "data_type": "float32", "train_loss": "mse",
                    "remat": False, "seed": 0},
        "parallelism": {},
        "tiling": {"do_tiling": False},
        "model": {"preset": "res_slimvit", "lr": LR, "weight_decay": WD,
                  "beta_1": BETAS[0], "beta_2": BETAS[1],
                  "warmup_epochs": 1, "superres_mag": MAG, "cnn_ratio": 4,
                  "patch_size": P, "embed_dim": EMBED, "depth": DEPTH,
                  "decoder_depth": DEC_DEPTH, "num_heads": HEADS,
                  "mlp_ratio": 4, "drop_path": 0.1, "drop_rate": 0.1,
                  "attention_impl": "xla"},
        "data": {"low_res_dir": {"S": low}, "high_res_dir": {"S": high},
                 "spatial_resolution": {"S": 625},
                 "default_vars": list(DEFAULT_VARS),
                 "dict_in_variables": {"S": list(DEFAULT_VARS)},
                 "dict_out_variables": {"S": list(OUT_VARS)},
                 "var_weights": {}},
    }
    path = os.path.join(root, "parity.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def batches_from_module(cfg_path, n, split="train"):
    """Materialize n training batches through OUR data layer (normalized,
    collated) as numpy — the torch side trains on the byte-identical stream
    the jax side evaluates with."""
    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.trainer import Trainer

    t = Trainer(load_config(cfg_path))
    dm = t._make_data_module("S")
    dm.setup()
    out = []
    loader = dm.train_dataloader if split == "train" else dm.val_dataloader
    while len(out) < n:
        for batch in loader():
            out.append((np.asarray(batch[0]), np.asarray(batch[1])))
            if len(out) >= n:
                break
    return out, dm


def torch_model(drop=0.1):
    from orbit2_tpu.utils.torch_reference import load_reference_model

    return load_reference_model(
        default_vars=DEFAULT_VARS, img_size=(H, W),
        in_channels=len(DEFAULT_VARS), out_channels=len(OUT_VARS),
        spatial_resolution=625.0, superres_mag=MAG, cnn_ratio=4,
        patch_size=P, embed_dim=EMBED, depth=DEPTH, decoder_depth=DEC_DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, drop_path=drop, drop_rate=drop,
        learn_pos_emb=True, ref_src="/root/reference/src")


def train_torch(batches, steps, drop=0.1):
    import torch

    m = torch_model(drop)
    m.train()
    opt = torch.optim.AdamW(m.parameters(), lr=LR, betas=BETAS,
                            weight_decay=WD)
    t0, losses = time.time(), []
    for k in range(steps):
        x, y = batches[k % len(batches)]
        yhat = m(torch.from_numpy(x), list(DEFAULT_VARS), list(OUT_VARS))
        loss = torch.mean((yhat - torch.from_numpy(y)) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        if k % 25 == 0:
            print(f"  torch step {k}: loss {losses[-1]:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return m, losses


def stage_trained_rmse(root, cfg_path, steps):
    import torch

    print(f"== stage 1: train torch reference {steps} steps ==", flush=True)
    batches, _ = batches_from_module(cfg_path, 32)
    m, losses = train_torch(batches, steps)
    assert losses[-1] < losses[0], "torch reference failed to learn"
    ckpt = os.path.join(root, "interm_epoch_0.ckpt")
    torch.save({"model_state_dict": m.state_dict()}, ckpt)
    print(f"  trained loss {losses[0]:.4f} -> {losses[-1]:.4f}; saved {ckpt}",
          flush=True)

    print("== stage 2: parity_eval on the trained checkpoint ==", flush=True)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "parity_eval.py"),
         cfg_path, "--checkpoint", ckpt, "--cpu", "--max-batches", "4"],
        capture_output=True, text=True, env=env, cwd=REPO)
    print(res.stdout[-2000:], flush=True)
    if res.returncode != 0:
        print(res.stderr[-3000:], flush=True)
        raise SystemExit("parity_eval failed")
    report = json.loads(res.stdout.strip().splitlines()[-1])
    return {"torch_train_loss": [losses[0], losses[-1]],
            "parity_eval": report}


def stage_trajectory(cfg_path, steps):
    """Same init, same batches, K fp32 AdamW steps on both frameworks
    (dropout off: trajectory identity is a numerics check, reference
    train step intermediate_downscaling.py:281-306)."""
    import torch

    import jax
    import jax.numpy as jnp

    from orbit2_tpu.models import ResSlimViT
    from orbit2_tpu.training.checkpoint import import_torch_state_dict
    from orbit2_tpu.training.optim import make_optimizer
    from orbit2_tpu.training.train import clip_replace_constant

    print(f"== stage 3: {steps}-step trajectory parity ==", flush=True)
    batches, _ = batches_from_module(cfg_path, 16)
    ref = torch_model(drop=0.0)
    ref.train()
    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in ref.state_dict().items()}

    opt_t = torch.optim.AdamW(ref.parameters(), lr=LR, betas=BETAS,
                              weight_decay=WD)
    prcp = list(OUT_VARS).index("total_precipitation_24hr")
    losses_t = []
    t0 = time.time()
    for k in range(steps):
        x, y = batches[k % len(batches)]
        yhat = ref(torch.from_numpy(x), list(DEFAULT_VARS), list(OUT_VARS))
        yhat = torch.where(
            torch.arange(yhat.shape[1])[None, :, None, None] == prcp,
            torch.clamp(yhat, min=0.0), yhat)
        loss = torch.mean((yhat - torch.from_numpy(y)) ** 2)
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss.detach()))
    print(f"  torch {steps} steps in {time.time() - t0:.0f}s", flush=True)

    model = ResSlimViT(
        default_vars=DEFAULT_VARS, img_size=(H, W),
        in_channels=len(DEFAULT_VARS), out_channels=len(OUT_VARS),
        superres_mag=MAG, cnn_ratio=4, patch_size=P, embed_dim=EMBED,
        depth=DEPTH, decoder_depth=DEC_DEPTH, num_heads=HEADS, mlp_ratio=4.0,
        drop_path=0.0, drop_rate=0.0, learn_pos_emb=True,
        spatial_resolution=625.0, attention_impl="xla")
    params = jax.tree.map(
        jnp.asarray, import_torch_state_dict(sd, depth=DEPTH,
                                             decoder_depth=DEC_DEPTH))

    def loss_fn(p, x, y):
        yhat = model.apply({"params": p}, x, DEFAULT_VARS, OUT_VARS,
                           deterministic=True)
        yhat = clip_replace_constant(y, yhat, OUT_VARS)
        return jnp.mean((yhat - y) ** 2)

    opt_j = make_optimizer("adamw", {"lr": LR, "betas": BETAS,
                                     "weight_decay": WD})
    state = opt_j.init(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses_j = []
    t0 = time.time()
    for k in range(steps):
        x, y = batches[k % len(batches)]
        loss, grads = grad_fn(params, jnp.asarray(x), jnp.asarray(y))
        updates, state = opt_j.update(grads, state, params)
        import optax

        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss))
    print(f"  jax {steps} steps in {time.time() - t0:.0f}s", flush=True)

    lt, lj = np.asarray(losses_t), np.asarray(losses_j)
    rel = np.abs(lt - lj) / np.maximum(np.abs(lt), 1e-8)
    print(f"  max rel loss delta over {steps} steps: {rel.max():.2e} "
          f"(final: torch {lt[-1]:.6f} jax {lj[-1]:.6f})", flush=True)
    return {"steps": steps, "torch_losses": losses_t, "jax_losses": losses_j,
            "max_rel_delta": float(rel.max()),
            "final_rel_delta": float(rel[-1])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--traj-steps", type=int, default=100)
    ap.add_argument("--out", default="/tmp/trained_parity")
    ap.add_argument("--skip-trained", action="store_true")
    ap.add_argument("--skip-traj", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)
    low, high = write_dataset(args.out, rng)
    cfg_path = write_config(args.out, low, high)

    record = {}
    if not args.skip_trained:
        record["trained_rmse_parity"] = stage_trained_rmse(
            args.out, cfg_path, args.steps)
    if not args.skip_traj:
        record["trajectory_parity"] = stage_trajectory(cfg_path,
                                                       args.traj_steps)
        with open(os.path.join(REPO, "docs", "parity_trajectory.json"),
                  "w") as f:
            json.dump(record["trajectory_parity"], f)
    with open(os.path.join(args.out, "record.json"), "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk not in ("torch_losses", "jax_losses")}
                      for k, v in record.items()}, indent=2))


if __name__ == "__main__":
    main()
