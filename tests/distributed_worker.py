"""Worker process for the two-process distributed smoke test
(tests/test_distributed.py). Not collected by pytest (no test_ prefix).

Each process: 4 virtual CPU devices -> 8 global, mesh replica=2 x fsdp=4,
jax.distributed over a local coordinator — the seam the reference exercises
on every Slurm multi-rank launch (intermediate_downscaling.py:836-849).
Trains 1 epoch (2 steps), checkpoints, resumes with a fresh Trainer for a
second epoch, and dumps per-rank evidence as JSON.
"""

import json
import os
import sys


def main():
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    data_low = sys.argv[4]
    data_high = sys.argv[5]
    ckdir = sys.argv[6]
    out_json = sys.argv[7]

    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=proc_id)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from orbit2_tpu.config import load_config
    from orbit2_tpu.data.reader import NpyReader
    from orbit2_tpu.training.trainer import Trainer

    in_vars = ["land_sea_mask", "orography", "lattitude", "landcover",
               "total_precipitation_24hr", "2m_temperature_min",
               "2m_temperature_max"]
    out_vars = in_vars[4:]
    raw = {
        # batch_size 6 with 8 val samples per rank forces a partial TAIL
        # batch (6 + 2) through the multi-process eval path: every rank
        # pads its local slice, the prediction is replicated, and the
        # padding rows stripped — the reference drops these batches
        "trainer": {"max_epochs": 2, "batch_size": 6, "buffer_size": 8,
                    "num_workers": 0, "data_type": "float32",
                    "train_loss": "bayesian_tv", "remat": False,
                    "interval_epochs": 1},
        "parallelism": {"simple_ddp": 2, "fsdp": 2, "tensor_par": 2},
        "model": {"preset": "res_slimvit", "lr": 1e-3, "warmup_epochs": 1,
                  "embed_dim": 32, "depth": 1, "decoder_depth": 1,
                  "num_heads": 2, "patch_size": 2, "drop_path": 0.0,
                  "drop_rate": 0.0, "attention_impl": "xla"},
        "data": {
            "low_res_dir": {"S": data_low},
            "high_res_dir": {"S": data_high},
            "spatial_resolution": {"S": 625},
            "default_vars": in_vars,
            "dict_in_variables": {"S": in_vars},
            "dict_out_variables": {"S": out_vars},
            "var_weights": {},
        },
    }

    # run_validation exercises the multi-process EVAL path INCLUDING the
    # partial tail batch (8 local val samples at batch_size 6 -> a 2-sample
    # tail per rank that is padded + replicated + stripped; asserted via
    # val_samples == 16 in test_distributed.py)
    t = Trainer(load_config(raw), checkpoint_dir=ckdir, run_validation=True)
    hist = t.fit(max_epochs=1, max_steps_per_epoch=2)
    val = t.last_validation  # set by validate(); includes the tail batch

    # the file shard this rank's training reader sees (same params the data
    # module passes: data_par_size=process_count, data_par_rank=index)
    dm = t._data_modules["S"]
    reader = NpyReader(dm.inp_lister_train, dm.out_lister_train, in_vars,
                       out_vars, data_par_size=nprocs, data_par_rank=proc_id,
                       shuffle=False)
    shard = [os.path.basename(p) for p, _ in reader._sharded_files()]

    # resume from the checkpoint with a fresh Trainer (multi-process Orbax
    # restore), one more epoch
    t2 = Trainer(load_config(raw), checkpoint_dir=ckdir)
    hist2 = t2.fit(max_epochs=2, max_steps_per_epoch=2)

    # UNEQUAL per-rank batch counts (shard_0: 8 samples, shard_1: 20): the
    # train loop must clamp every rank to the global-min step count and the
    # eval loop must pad the short rank with zero-real rounds — without the
    # sync this configuration deadlocks in the first epoch's collectives
    uneven_low = sys.argv[8]
    uneven_high = sys.argv[9]
    raw_u = json.loads(json.dumps(raw))  # deep copy
    raw_u["data"]["low_res_dir"] = {"S": uneven_low}
    raw_u["data"]["high_res_dir"] = {"S": uneven_high}
    t3 = Trainer(load_config(raw_u), checkpoint_dir=os.path.join(ckdir, "u"),
                 run_validation=True)
    hist3 = t3.fit(max_epochs=1)  # NO max_steps clamp: exercises the sync
    val_u = t3.last_validation

    with open(out_json, "w") as f:
        json.dump({
            "process_index": jax.process_index(),
            "losses": [h["loss"] for h in hist],
            "resume_epochs": [h["epoch"] for h in hist2],
            "resume_losses": [h["loss"] for h in hist2],
            "train_shard": shard,
            "finite": bool(np.isfinite([h["loss"] for h in hist]).all()),
            "val_means": {k: float(v) for k, v in val["means"].items()},
            "val_samples": int(val["samples"]),
            "uneven_batches": [h["batches"] for h in hist3],
            "uneven_loss": [h["loss"] for h in hist3],
            "uneven_val_means": {k: float(v) for k, v in val_u["means"].items()},
            "uneven_val_samples": int(val_u["samples"]),
        }, f)
    print(f"worker {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
