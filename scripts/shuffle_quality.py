"""Measure shuffle quality: shipped (global file permutation x per-host
reservoir) vs an exact global per-sample permutation.

VERDICT r3 (missing #5): docs/multihost_data.md ARGUES that the rebuild's
two-level shuffle is equivalent in training quality to the reference's
DDStore + DistributedSampler exact global permutation
(reference dist/distdataset.py:180-192) — this script MEASURES it.

Adversarial setup: the dataset is deliberately non-IID across shard files
(a "seasonal" regime drift keyed to file index, the year-sharded-ERA5
failure mode for block shuffling). A tiny ResSlimViT trains under four
data-order regimes fed by the REAL data stack (NpyReader -> Downscale ->
IndividualDataIter -> ShuffleIterableDataset -> collate):

  * global   — exact global per-sample permutation each epoch (the
               reference's semantics; upper bound)
  * shipped1 — the shipped pipeline, 1 host, num_workers=2 worker
               interleave (the shipped configs' value; the round-4 fix
               measured here motivated InterleavedDataIter)
  * shipped1_noilv — 1 host WITHOUT worker interleave (the pre-fix
               pipeline; kept to document the measured delta)
  * shipped2 — the shipped pipeline emulating 2 hosts (x2 workers each):
               two rank-sharded streams, each contributing half of every
               global batch — exactly what a 2-process run computes
  * seq      — NO shuffling at all (lower bound / sanity: the regime drift
               must actually hurt an order-sensitive learner, otherwise
               the comparison has no teeth)

Same model seed set per regime (6 seeds); "final" val MSE averages the
last two eval points of each curve to damp single-eval jitter.
PASS criteria:
  * seq must sit above the global band (mean + 3 sigma) — the dataset's
    regime drift actually hurts an order-sensitive learner, so the
    comparison has teeth;
  * shipped{1,2} recover >= 75% of the (seq - global) quality gap:
    gap_fraction = (mean_shipped - mean_global) / (mean_seq - mean_global)
    must be < 0.25. This is an effect-size criterion: with a handful of
    seeds, "inside the global 3-sigma band" is dominated by the noise of
    estimating sigma from n seeds, while the recovered-gap fraction is
    anchored to the measured harm of not shuffling at all.

Run (claim-free CPU):
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo python scripts/shuffle_quality.py
"""

import json
import os
import random
import sys
import tempfile

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orbit2_tpu.data.loader import collate
from orbit2_tpu.data.reader import (
    Downscale, IndividualDataIter, InterleavedDataIter, NpyReader,
    ShuffleIterableDataset,
)
from orbit2_tpu.models import ResSlimViT

N_FILES = 16
T_PER_FILE = 64
H, W, MAG = 8, 16, 2
BATCH = 4
EPOCHS = 2
VAR = "field"
# the flagship model's residual path requires the static surface channels
# (res_slimvit.py RESIDUAL_STATIC_VARS)
STATIC_VARS = ("land_sea_mask", "orography", "lattitude", "landcover")
IN_VARS = STATIC_VARS + (VAR,)
DATA_SEED = 1234


def make_dataset(root: str) -> tuple:
    """Non-IID shards: file f's inputs drift around sin(2*pi*f/N) (seasonal
    regime), targets are a fixed smooth function of the input. Returns
    (train_in_files, train_out_files, val_x, val_y)."""
    rng = np.random.default_rng(7)
    xs_hi = np.linspace(0, 2 * np.pi, W * MAG)
    base_hi = np.sin(xs_hi)[None, :] * np.ones((H * MAG, 1))

    def sample_file(f_idx, t_len, rng):
        regime = np.sin(2 * np.pi * f_idx / N_FILES)
        lo = rng.normal(regime, 0.5, size=(t_len, 1, H, W)).astype(np.float32)
        # target: bicubic-like upsample of a smooth transform of the input
        up = np.repeat(np.repeat(lo, MAG, axis=2), MAG, axis=3)
        hi = (np.tanh(up) + 0.1 * base_hi[None, None]).astype(np.float32)
        return lo, hi

    statics = {v: rng.normal(0, 1, size=(1, 1, H, W)).astype(np.float32)
               for v in STATIC_VARS}

    in_files, out_files = [], []
    for f in range(N_FILES):
        lo, hi = sample_file(f, T_PER_FILE, rng)
        pi = os.path.join(root, f"in_{f:02d}.npz")
        po = os.path.join(root, f"out_{f:02d}.npz")
        np.savez(pi, **{VAR: lo},
                 **{v: np.broadcast_to(a, (T_PER_FILE, 1, H, W))
                    for v, a in statics.items()})
        np.savez(po, **{VAR: hi})
        in_files.append(pi)
        out_files.append(po)

    # held-out val: same generator, fresh draws spanning all regimes
    val_lo, val_hi = [], []
    for f in range(N_FILES):
        lo, hi = sample_file(f, 8, rng)
        val_lo.append(lo)
        val_hi.append(hi)
    field = np.concatenate(val_lo)  # [N,1,H,W]
    n = field.shape[0]
    chans = [np.broadcast_to(statics[v], (n, 1, H, W)) for v in STATIC_VARS]
    val_x = np.concatenate(chans + [field], axis=1)  # [N,5,H,W], IN_VARS order
    val_y = np.concatenate(val_hi)  # [N,1,H,W]
    return in_files, out_files, val_x, val_y


def shipped_stream(in_files, out_files, n_hosts: int, n_workers: int,
                   epoch_rngs, buf_rngs):
    """One epoch of global batches as a multi-host run composes them: each
    host feeds batch/n_hosts samples from its worker-interleaved file shard
    (IterDataModule._pipeline wiring)."""
    per_rank = []
    for r in range(n_hosts):
        children = []
        for w in range(n_workers):
            reader = NpyReader(
                in_files, out_files, list(IN_VARS), [VAR],
                data_par_size=n_hosts, data_par_rank=r,
                num_workers=n_workers, worker_id=w, shuffle=True,
                rng=epoch_rngs[r][w],
            )
            children.append(
                IndividualDataIter(Downscale(reader), None, None, subsample=1))
        it = children[0] if n_workers == 1 else InterleavedDataIter(children)
        per_rank.append(iter(ShuffleIterableDataset(it, 64, rng=buf_rngs[r])))
    sub = BATCH // n_hosts
    while True:
        samples = []
        try:
            for r in range(n_hosts):
                for _ in range(sub):
                    samples.append(next(per_rank[r]))
        except StopIteration:
            return
        x, y, _, _ = collate(samples)
        yield x, y


def global_stream(all_x, all_y, perm_rng):
    idx = perm_rng.permutation(len(all_x))
    for s in range(0, len(idx) - BATCH + 1, BATCH):
        j = idx[s : s + BATCH]
        yield all_x[j], all_y[j]


def sequential_stream(all_x, all_y):
    for s in range(0, len(all_x) - BATCH + 1, BATCH):
        yield all_x[s : s + BATCH], all_y[s : s + BATCH]


def load_all(in_files, out_files):
    """Materialize the full sample set (for the global/seq regimes) in
    file order, via the same reader stack (shuffle off, 1 host)."""
    reader = NpyReader(in_files, out_files, list(IN_VARS), [VAR], shuffle=False)
    it = IndividualDataIter(Downscale(reader), None, None, subsample=1)
    xs, ys = [], []
    for s in it:
        xs.append(np.stack([s[0][v] for v in IN_VARS]))
        ys.append(s[1][VAR][None])
    return np.stack(xs), np.stack(ys)


def train_one(regime: str, model_seed: int, in_files, out_files,
              all_x, all_y, val_x, val_y):
    model = ResSlimViT(
        default_vars=IN_VARS, img_size=(H, W),
        in_channels=len(IN_VARS), out_channels=1,
        superres_mag=MAG, patch_size=2, embed_dim=32, depth=1,
        decoder_depth=1, num_heads=2, learn_pos_emb=True,
        spatial_resolution=111.0, attention_impl="xla",
        dtype=jnp.float32, drop_rate=0.0, drop_path=0.0,
    )
    params = model.init({"params": jax.random.PRNGKey(model_seed)},
                        jnp.zeros((1, len(IN_VARS), H, W)), IN_VARS, (VAR,),
                        deterministic=True)["params"]
    tx = optax.adamw(1e-3, weight_decay=1e-5)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x, IN_VARS, (VAR,),
                               deterministic=True)
            return jnp.mean((pred - y) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    @jax.jit
    def val_mse(params, x, y):
        pred = model.apply({"params": params}, x, IN_VARS, (VAR,),
                           deterministic=True)
        return jnp.mean((pred - y) ** 2)

    vx, vy = jnp.asarray(val_x), jnp.asarray(val_y)
    curve = []
    # data-order rngs derive from DATA_SEED only (decoupled from model_seed,
    # as in the shipped trainer): each SEED gets its own data order draw so
    # the across-seed band includes data-order variance for every regime.
    salt = DATA_SEED + 1000003 * model_seed
    if regime.startswith("shipped"):
        n_hosts = int(regime[7])
        n_workers = 1 if regime.endswith("noilv") else 2
        # every worker rng starts from the same seed so all (rank, worker)
        # slots agree on each epoch's file permutation (itermodule wiring)
        epoch_rngs = [[random.Random(salt) for _ in range(n_workers)]
                      for _ in range(n_hosts)]
        buf_rngs = [random.Random(salt * 1000003 ^ 7919 * (r + 1))
                    for r in range(n_hosts)]
    else:
        perm_rng = np.random.default_rng(salt)

    steps = 0
    for _ in range(EPOCHS):
        if regime.startswith("shipped"):
            stream = shipped_stream(in_files, out_files, n_hosts, n_workers,
                                    epoch_rngs, buf_rngs)
        elif regime == "global":
            stream = global_stream(all_x, all_y, perm_rng)
        else:
            stream = sequential_stream(all_x, all_y)
        for x, y in stream:
            params, opt, _ = step(params, opt, jnp.asarray(x), jnp.asarray(y))
            steps += 1
            if steps % 64 == 0:
                curve.append((steps, float(val_mse(params, vx, vy))))
    return curve


def main():
    tmp = tempfile.mkdtemp(prefix="shufq_")
    in_files, out_files, val_x, val_y = make_dataset(tmp)
    all_x, all_y = load_all(in_files, out_files)
    assert len(all_x) == N_FILES * T_PER_FILE

    results = {}
    for regime in ("global", "shipped1", "shipped1_noilv", "shipped2", "seq"):
        curves = []
        for seed in range(6):
            c = train_one(regime, seed, in_files, out_files,
                          all_x, all_y, val_x, val_y)
            curves.append(c)
            print(f"{regime} seed{seed}: final val mse {c[-1][1]:.6f}",
                  flush=True)
        # damp single-eval jitter: average the last two eval points
        finals = [float(np.mean([c[-2][1], c[-1][1]])) for c in curves]
        results[regime] = {
            "final_val_mse": finals,
            "mean": float(np.mean(finals)),
            "std": float(np.std(finals)),
            "curves": curves,
        }

    g = results["global"]
    band = (g["mean"] - 3 * g["std"], g["mean"] + 3 * g["std"])
    gap = results["seq"]["mean"] - g["mean"]
    verdict = {
        "global_band_3sigma": band,
        "seq_degraded": results["seq"]["mean"] > band[1],
        "gap_seq_minus_global": gap,
    }
    for name in ("shipped1", "shipped1_noilv", "shipped2"):
        frac = (results[name]["mean"] - g["mean"]) / gap
        verdict[name + "_gap_fraction"] = frac
        verdict[name + "_pass"] = bool(frac < 0.25)
    print(json.dumps({"results": {k: {kk: vv for kk, vv in v.items()
                                      if kk != "curves"}
                                  for k, v in results.items()},
                      "verdict": verdict}, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "docs", "results_shuffle_quality.json")
    with open(out, "w") as f:
        json.dump({"results": results, "verdict": verdict}, f, indent=1)


if __name__ == "__main__":
    main()
