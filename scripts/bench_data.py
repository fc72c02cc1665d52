"""Host data-pipeline throughput: streaming BatchLoader vs native SampleStore.

Measures what the DDStore replacement actually buys: epoch-1 is the fill
cost (both paths read npz once), epoch-2+ is where the store's RAM gathers
beat re-reading + re-transforming.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_data.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import os
import tempfile
import time

import numpy as np


def make_dataset(root, n_files=4, T=32, H=64, W=128, mag=4):
    in_vars = ["land_sea_mask", "orography", "lattitude", "landcover",
               "total_precipitation_24hr", "2m_temperature_min",
               "2m_temperature_max"]
    out_vars = in_vars[4:]
    rng = np.random.default_rng(0)
    for base, h, w, vs in ((os.path.join(root, "low"), H, W, in_vars),
                            (os.path.join(root, "high"), H * mag, W * mag, out_vars)):
        for split in ("train", "val", "test"):
            d = os.path.join(base, split)
            os.makedirs(d, exist_ok=True)
            n = n_files if split == "train" else 1
            for i in range(n):
                np.savez(os.path.join(d, f"s{i}.npz"),
                         **{v: rng.normal(280, 10, (T, 1, h, w)).astype(np.float32)
                            for v in vs})
            np.savez(os.path.join(d, "climatology.npz"),
                     **{v: np.zeros((1, h, w), np.float32) for v in vs})
        np.save(os.path.join(base, "lat.npy"), np.linspace(-88, 88, h))
        np.save(os.path.join(base, "lon.npy"), np.linspace(0, 358, w))
        np.savez(os.path.join(base, "normalize_mean.npz"),
                 **{v: np.array([280.0], np.float32) for v in vs})
        np.savez(os.path.join(base, "normalize_std.npz"),
                 **{v: np.array([10.0], np.float32) for v in vs})
    return in_vars, out_vars


def run(root, use_store: bool, batch_size=16, epochs=3):
    from orbit2_tpu.data import IterDataModule

    os.environ["ORBIT2_USE_SAMPLESTORE"] = "1" if use_store else "0"
    dm = IterDataModule("downscaling", os.path.join(root, "low"),
                        os.path.join(root, "high"),
                        *make_vars(), batch_size=batch_size, buffer_size=64,
                        drop_last=True)
    dm.setup()
    label = "samplestore" if use_store else "streaming"
    for epoch in range(epochs):
        t0 = time.perf_counter()
        n_samples, nbytes = 0, 0
        for batch in dm.train_dataloader():
            x, y = batch[0], batch[1]
            n_samples += x.shape[0]
            nbytes += x.nbytes + y.nbytes
        dt = time.perf_counter() - t0
        print(f"{label:12s} epoch {epoch}: {n_samples / dt:8.1f} samples/s, "
              f"{nbytes / dt / 1e9:6.2f} GB/s", flush=True)


_VARS = None


def make_vars():
    return _VARS


if __name__ == "__main__":
    with tempfile.TemporaryDirectory() as root:
        _VARS = make_dataset(root)
        globals()["_VARS"] = _VARS
        run(root, use_store=False)
        run(root, use_store=True)
