#!/usr/bin/env python
"""Sweep mesh shapes for a config and report per-device memory + collective
traffic per train step — computed ahead of time on virtual CPU devices, no
pod required. The TPU-idiomatic replacement for the reference's
launch-and-bisect mesh sizing (Slurm jobs + NCCL timings).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/scaling_plan.py configs/interm_1b.yaml \
        --img 32 64 --batch 8 \
        --mesh fsdp=8 --mesh fsdp=4,tensor=2 --mesh fsdp=2,tensor=2,seq=2 \
        --ici-gbps 45

Prints one JSON row per mesh: params/opt/batch/temp bytes per device, the
collective inventory (op -> count, result bytes), and a naive ICI
lower-bound when --ici-gbps is given (v5e: ~45 GB/s per link direction).
Recorded sweeps live in docs/scaling.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

from orbit2_tpu.config import load_config
from orbit2_tpu.utils.scaling import plan_mesh_scaling


def parse_mesh(spec: str):
    out = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if k not in ("stage", "replica", "fsdp", "expert", "tensor", "seq"):
            raise SystemExit(f"unknown mesh axis {k!r} in --mesh {spec!r}")
        out[k] = int(v)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--img", type=int, nargs=2, required=True,
                    metavar=("H", "W"),
                    help="low-res TILE shape fed to the model (post-tiling)")
    ap.add_argument("--batch", type=int, default=None,
                    help="global batch (default: config trainer.batch_size)")
    ap.add_argument("--mesh", action="append", default=[],
                    metavar="AXIS=N[,AXIS=N...]",
                    help="mesh shape to sweep; repeatable "
                         "(axes: stage replica fsdp tensor seq)")
    ap.add_argument("--max-stage", type=int, default=1,
                    help="with --choose: also enumerate pipeline-parallel "
                         "shapes up to this many stages (default 1 = none)")
    ap.add_argument("--choose", type=int, default=None, metavar="N_DEVICES",
                    help="instead of --mesh, enumerate every valid shape "
                         "for N devices, plan all, and print the winner "
                         "(least collective bytes among HBM-fitting shapes)")
    ap.add_argument("--hbm-gb", type=float, default=None,
                    help="per-device HBM budget for --choose (e.g. 16 for "
                         "v5e); shapes that exceed it are dropped")
    ap.add_argument("--in-channels", type=int, default=7)
    ap.add_argument("--out-channels", type=int, default=3)
    ap.add_argument("--ici-gbps", type=float, default=None,
                    help="ICI GB/s per device for the naive time bound")
    ap.add_argument("--topology", default=None, metavar="NAME",
                    help="AOT-compile against an offline TPU topology "
                         "(e.g. v5e:2x4) instead of local/virtual devices "
                         "— real collective dtypes (bf16 param gathers) "
                         "and HBM temp sizes; needs libtpu, not chips")
    args = ap.parse_args()

    cfg = load_config(args.config)
    batch = args.batch or cfg.trainer.batch_size
    if args.choose:
        from orbit2_tpu.utils.scaling import choose_mesh

        res = choose_mesh(
            cfg, img=tuple(args.img), batch=batch, n_devices=args.choose,
            in_channels=args.in_channels, out_channels=args.out_channels,
            hbm_bytes=int(args.hbm_gb * 2**30) if args.hbm_gb else None,
            ici_gbytes_per_sec=args.ici_gbps, max_stage=args.max_stage,
            topology=args.topology)
        rows = res["rows"]
    elif args.mesh:
        rows = plan_mesh_scaling(
            cfg, img=tuple(args.img), batch=batch,
            mesh_shapes=[parse_mesh(m) for m in args.mesh],
            in_channels=args.in_channels, out_channels=args.out_channels,
            ici_gbytes_per_sec=args.ici_gbps, topology=args.topology)
    else:
        raise SystemExit("pass --mesh (repeatable) or --choose N_DEVICES")
    for row in rows:
        if "total_bytes_per_device" in row:
            row["gb_per_device"] = round(row["total_bytes_per_device"] / 2**30, 3)
        print(json.dumps(row))
    if args.choose:
        chosen = res["chosen"]
        print(json.dumps({"chosen": chosen["mesh"] if chosen else None}))


if __name__ == "__main__":
    main()
