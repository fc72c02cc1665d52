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


def test_two_process_training(synth_dataset, tmp_path):
    ds = synth_dataset
    port = _free_port()
    ckdir = str(tmp_path / "ck")
    outs = [str(tmp_path / f"out_{i}.json") for i in range(2)]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port),
             ds["low"], ds["high"], ckdir, outs[i]],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
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
