#!/usr/bin/env python
"""Plan a config's per-device memory on a mesh BEFORE burning pod time.

The reference sizes configs by running them and watching
``torch.cuda.memory_reserved`` prints (intermediate_downscaling.py:746-747);
here the train step AOT-compiles abstractly for any config x mesh and XLA's
own memory analysis is read back — no buffers, no chips. The 10B config
plans on a CPU host:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/memory_plan.py configs/interm_10b.yaml \
        --img 16 32 --batch 8 --fsdp 4 --tensor 2

On a real TPU the output adds the device's HBM limit and a fits/doesn't
verdict. Mesh flags override the config's parallelism so a pod-sized config
can be planned on however many (virtual) devices are present.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS=cpu even where a sitecustomize pins another plugin at
# interpreter start (env alone is too late there — see tests/conftest.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from orbit2_tpu.config import load_config
from orbit2_tpu.parallel.mesh import make_mesh
from orbit2_tpu.utils.memory import plan_train_memory


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--img", type=int, nargs=2, required=True,
                    metavar=("H", "W"),
                    help="low-res TILE shape fed to the model (post-tiling)")
    ap.add_argument("--batch", type=int, default=None,
                    help="global batch (default: config trainer.batch_size)")
    ap.add_argument("--in-channels", type=int, default=7,
                    help="only for configs without data.dict_in_variables "
                         "(those plan their first phase's real lists)")
    ap.add_argument("--out-channels", type=int, default=3)
    ap.add_argument("--replica", type=int, default=None)
    ap.add_argument("--fsdp", type=int, default=None)
    ap.add_argument("--tensor", type=int, default=None)
    ap.add_argument("--seq", type=int, default=None)
    args = ap.parse_args()

    cfg = load_config(args.config)
    mesh = None
    if any(v is not None for v in
           (args.replica, args.fsdp, args.tensor, args.seq)):
        mesh = make_mesh(replica=args.replica or 1, fsdp=args.fsdp or 1,
                         tensor=args.tensor or 1, seq=args.seq or 1)
    plan = plan_train_memory(
        cfg, img=tuple(args.img), in_channels=args.in_channels,
        out_channels=args.out_channels,
        batch=args.batch or cfg.trainer.batch_size, mesh=mesh)
    plan["gb_per_device"] = round(plan["total_bytes_per_device"] / 2**30, 3)
    print(json.dumps(plan, indent=2))


if __name__ == "__main__":
    main()
