"""Pipeline memory story, measured with the AOT memory planner (VERDICT r4
next #5): per-device XLA memory analysis of the 1B trunk on a pipelined
stage=2 x fsdp=2 x tensor=2 mesh, with and without per-tick remat, vs the
unpipelined fsdp=4 x tensor=2 baseline, and the interleaved V=2 schedule.

Under jax.grad the GPipe scan saves every tick's stage residuals, so the
no-remat pipeline holds O(M x full layer intermediates); `trainer.remat`
wraps block_fn in jax.checkpoint, dropping that to O(M x microbatch INPUT)
— the 1F1B-class activation footprint expressible in XLA's dataflow model
(parallel/pipeline.py module docstring). This script turns that analysis
into XLA's own numbers.

Plans are compiled against the OFFLINE TPU compiler (topology
"v5e:2x4") — the CPU backend's memory analysis does NOT model
rematerialization (measured: 1B unpipelined remat on/off both ~26.8 GB
temp on CPU), so only the real TPU compiler's numbers are meaningful
here.

JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/pipeline_memory_plan.py
Results: /tmp/r5_pipeline_memory.json (recorded into docs/scaling.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from orbit2_tpu.config import Config, ModelConfig, ParallelismConfig, \
        TrainerConfig
    from orbit2_tpu.parallel.mesh import make_mesh
    from orbit2_tpu.utils.memory import plan_train_memory

    def cfg(remat, pipeline=1, interleave=1, fsdp=2, tensor=2):
        return Config(
            trainer=TrainerConfig(batch_size=8, remat=remat,
                                  data_type="bfloat16",
                                  adam_mu_dtype="bfloat16",
                                  adam_nu_dtype="bfloat16"),
            parallelism=ParallelismConfig(
                fsdp=fsdp, tensor_par=tensor, pipeline=pipeline,
                pipeline_microbatches=8 if pipeline > 1 else 0,
                pipeline_interleave=interleave),
            model=ModelConfig(embed_dim=3072, depth=8, decoder_depth=4,
                              num_heads=24),
        ).validate()

    from orbit2_tpu.utils.scaling import topology_devices

    topo = topology_devices("v5e:2x4")
    cases = [
        ("unpipelined fsdp=4xtensor=2 remat=off",
         cfg(False, fsdp=4), dict(fsdp=4, tensor=2)),
        ("pipeline stage=2 M=8 remat=off",
         cfg(False, pipeline=2), dict(stage=2, fsdp=2, tensor=2)),
        ("pipeline stage=2 M=8 remat=on",
         cfg(True, pipeline=2), dict(stage=2, fsdp=2, tensor=2)),
        ("pipeline stage=2 V=2 M=8 remat=on",
         cfg(True, pipeline=2, interleave=2),
         dict(stage=2, fsdp=2, tensor=2)),
    ]
    out = []
    for name, c, mesh_kw in cases:
        mesh = make_mesh(**mesh_kw, devices=topo)
        try:
            plan = plan_train_memory(c, img=(32, 64), in_channels=7,
                                     out_channels=3, batch=8, mesh=mesh)
            row = dict(case=name,
                       total_gb=round(plan["total_bytes_per_device"] / 2**30, 3),
                       param_gb=round(plan["param_bytes_per_device"] / 2**30, 3),
                       opt_gb=round(plan["opt_bytes_per_device"] / 2**30, 3),
                       temp_gb=round(plan.get("temp_bytes", 0) / 2**30, 3))
        except Exception as e:
            row = dict(case=name, error=f"{type(e).__name__}: {str(e)[:200]}")
        out.append(row)
        print(json.dumps(row), flush=True)
    with open("/tmp/r5_pipeline_memory.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
