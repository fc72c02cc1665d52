#!/usr/bin/env python
"""Training entry point (reference examples/intermediate_downscaling.py, but
librarified): `python examples/train.py configs/interm_8m.yaml`.

No Slurm rank plumbing: multi-host topology comes from
`jax.distributed.initialize()` (TPU pods autodetect), the mesh from the
config's parallelism section.
"""

import logging
import sys

import jax


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    config_path = sys.argv[1]

    if jax.process_count() > 1 or "--distributed" in sys.argv:
        jax.distributed.initialize()

    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.trainer import Trainer

    cfg = load_config(config_path)
    world = cfg.parallelism.world_size
    have = jax.device_count()
    if world != have:
        logging.warning(
            "config wants %d devices, found %d — scaling parallelism down",
            world, have)
        # shrink axes toward what exists (fsdp first, like HYBRID_SHARD)
        import math

        cfg.parallelism.tensor_par = math.gcd(cfg.parallelism.tensor_par, have)
        rest = have // cfg.parallelism.tensor_par
        cfg.parallelism.fsdp = math.gcd(cfg.parallelism.fsdp, rest)
        cfg.parallelism.simple_ddp = rest // cfg.parallelism.fsdp
        cfg.parallelism.seq_par = 1
        # the data axes shard the batch — shrink until they divide it
        while (cfg.parallelism.simple_ddp > 1 and
               cfg.trainer.batch_size % cfg.parallelism.data_par):
            cfg.parallelism.simple_ddp //= 2
        while (cfg.parallelism.fsdp > 1 and
               cfg.trainer.batch_size % cfg.parallelism.data_par):
            cfg.parallelism.fsdp //= 2

    trainer = Trainer(cfg, run_validation="--validate" in sys.argv)
    trainer.fit()


if __name__ == "__main__":
    main()
