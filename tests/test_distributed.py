"""Two-process distributed execution smoke test.

Spawns 2 real processes, each with 4 virtual CPU devices, joined via
jax.distributed over a local coordinator (gloo collectives) — the only
reference seam (Slurm multi-rank, intermediate_downscaling.py:836-849)
that single-process mesh tests cannot cover: process-sharded input files
(data_par_rank=jax.process_index()), make_array_from_process_local_data
batch assembly, cross-process collectives in the train step, and
multi-process Orbax checkpoint save/restore.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_uneven_dataset(root, in_vars, out_vars, lens=(8, 20),
                          h=16, w=32, mag=4):
    """Two shards with UNEQUAL sample counts -> unequal per-rank batch
    counts across 2 processes (the train-clamp / eval-pad sync seam)."""
    rng = np.random.default_rng(3)

    def write(base, hh, ww, variables):
        for split in ("train", "val", "test"):
            d = base / split
            d.mkdir(parents=True, exist_ok=True)
            for i, t in enumerate(lens):
                arrays = {}
                for v in variables:
                    if v == "total_precipitation_24hr":
                        a = rng.gamma(0.3, 0.004, size=(t, 1, hh, ww))
                    else:
                        a = rng.normal(280, 10, size=(t, 1, hh, ww))
                    arrays[v] = a.astype(np.float32)
                np.savez(d / f"shard_{i}.npz", **arrays)
            np.savez(d / "climatology.npz",
                     **{v: rng.normal(280, 1, size=(1, hh, ww)).astype(np.float32)
                        for v in variables})
        np.save(base / "lat.npy", np.linspace(-88, 88, hh).astype(np.float32))
        np.save(base / "lon.npy", np.linspace(0, 358, ww).astype(np.float32))
        np.savez(base / "normalize_mean.npz",
                 **{v: np.array([280.0], dtype=np.float32) for v in variables})
        np.savez(base / "normalize_std.npz",
                 **{v: np.array([10.0], dtype=np.float32) for v in variables})

    write(root / "low", h, w, in_vars)
    write(root / "high", h * mag, w * mag, out_vars)
    return str(root / "low"), str(root / "high")


def test_two_process_training(synth_dataset, tmp_path):
    ds = synth_dataset
    port = _free_port()
    ckdir = str(tmp_path / "ck")
    outs = [str(tmp_path / f"out_{i}.json") for i in range(2)]
    ulow, uhigh = _write_uneven_dataset(tmp_path / "uneven", ds["in_vars"],
                                        ds["out_vars"])

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port),
             ds["low"], ds["high"], ckdir, outs[i], ulow, uhigh],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        # 257s alone on this host, but CPU contention from the rest of the
        # suite (pytest runs it alongside compile-heavy tests) has pushed it
        # past 570s; give it real headroom before declaring a hang
        out, _ = p.communicate(timeout=1140)
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    res = [json.load(open(o)) for o in outs]
    assert [r["process_index"] for r in res] == [0, 1]
    for r in res:
        assert r["finite"]

    # both processes compute the SAME global loss (the step is one sharded
    # program over the global batch)
    np.testing.assert_allclose(res[0]["losses"], res[1]["losses"],
                               rtol=1e-5)
    np.testing.assert_allclose(res[0]["resume_losses"],
                               res[1]["resume_losses"], rtol=1e-5)

    # resume picked up after the checkpointed epoch on both ranks
    assert res[0]["resume_epochs"] == res[1]["resume_epochs"]
    assert res[0]["resume_epochs"][0] == 1

    # process-sharded input files are disjoint and cover the split
    s0, s1 = set(res[0]["train_shard"]), set(res[1]["train_shard"])
    assert s0 and s1 and not (s0 & s1)

    # multi-process eval: the partial TAIL batch (8 local samples, batch 6)
    # is padded + replicated + stripped, not dropped — every rank counts
    # ALL 16 global val samples and computes the same means
    assert res[0]["val_samples"] == res[1]["val_samples"] == 16
    assert res[0]["val_means"].keys() == res[1]["val_means"].keys()
    for k in res[0]["val_means"]:
        np.testing.assert_allclose(res[0]["val_means"][k],
                                   res[1]["val_means"][k], rtol=1e-5)

    # UNEQUAL shard lengths (8 vs 20 samples, batch 6): training clamps both
    # ranks to the global-min step count (floor(8/6)=1) instead of hanging,
    # and eval pads the short rank so ALL 2*(8+20)=56... val counts every
    # global sample: 8+20=28 (each rank loads one shard)
    assert res[0]["uneven_batches"] == res[1]["uneven_batches"] == [1]
    np.testing.assert_allclose(res[0]["uneven_loss"], res[1]["uneven_loss"],
                               rtol=1e-5)
    assert (res[0]["uneven_val_samples"] == res[1]["uneven_val_samples"]
            == 28)
    for k in res[0]["uneven_val_means"]:
        np.testing.assert_allclose(res[0]["uneven_val_means"][k],
                                   res[1]["uneven_val_means"][k], rtol=1e-5)
