"""Mesh-scaling planner (orbit2_tpu/utils/scaling.py).

The reference sizes meshes by launching Slurm jobs and watching NCCL
timings; here the compiler's own collective choices are read back from an
abstract AOT compile — per mesh shape, on virtual CPU devices.
"""

from orbit2_tpu.config import (Config, ModelConfig, ParallelismConfig,
                               TrainerConfig)
from orbit2_tpu.utils.scaling import (candidate_meshes, choose_mesh,
                                      collective_inventory,
                                      plan_mesh_scaling)

FAKE_HLO = """
HloModule train_step

ENTRY %main (p0: bf16[4,8]) -> bf16[8,8] {
  %p0 = bf16[4,8]{1,0} parameter(0)
  %ar = bf16[4,8]{1,0} all-reduce(%p0), replica_groups={{0,1}}, to_apply=%add
  %ags = (bf16[4,8]{1,0}, bf16[8,8]{1,0}) all-gather-start(%ar), dimensions={0}
  %agd = bf16[8,8]{1,0} all-gather-done(%ags)
  %tup = (f32[2,2]{1,0}, f32[2,2]{1,0}) all-reduce(%c0, %c1), to_apply=%add
  %grads = (f32[4]{0}, f32[4]{0}, f32[4]{0}, f32[4]{0}, f32[4]{0}, /*index=5*/f32[4]{0}, f32[4]{0}) all-reduce(%g0, %g1, %g2, %g3, %g4, /*index=5*/%g5, %g6), replica_groups=[2,4]<=[8], to_apply=%add
  %cp = bf16[4,8]{1,0} collective-permute(%p0), source_target_pairs={{0,1},{1,0}}
  ROOT %out = bf16[8,8]{1,0} add(%agd, %agd)
}
"""


def test_collective_inventory_counts_and_bytes():
    inv = collective_inventory(FAKE_HLO)
    ops = inv["ops"]
    # the sync all-reduce (4*8*2=64B), the tuple one (2 x 2*2*4=32B), and
    # the fused gradient-sync tuple whose >5 elements embed /*index=N*/
    # comments (7 x 4*4=112B) — XLA emits the DP grad all-reduce exactly
    # like that, so dropping it would zero the tool's headline number
    assert ops["all-reduce"] == {
        "count": 3, "bytes": 64 + 32 + 112,
        "bytes_by_dtype": {"bf16": 64, "f32": 32 + 112}}
    # async pair counts ONCE, at the -done result (8*8*2=128B), not the
    # -start tuple (which would double-count the operand buffer)
    assert ops["all-gather"] == {
        "count": 1, "bytes": 128, "bytes_by_dtype": {"bf16": 128}}
    assert ops["collective-permute"] == {
        "count": 1, "bytes": 64, "bytes_by_dtype": {"bf16": 64}}
    assert inv["total_count"] == 5
    assert inv["total_bytes"] == 64 + 32 + 112 + 128 + 64
    # the dtype split is the mixed-precision-collectives tell: TPU gathers
    # fp32 masters in bf16; large f32 buckets flag a CPU-backend compile
    assert inv["total_bytes_by_dtype"] == {"bf16": 64 + 128 + 64,
                                           "f32": 32 + 112}


def test_collective_inventory_empty_on_collective_free_hlo():
    inv = collective_inventory("ENTRY %main { ROOT %x = f32[2] parameter(0) }")
    assert inv == {"ops": {}, "total_count": 0, "total_bytes": 0,
                   "total_bytes_by_dtype": {}}


def _tiny_cfg():
    return Config(
        trainer=TrainerConfig(batch_size=8, remat=False),
        parallelism=ParallelismConfig(),
        model=ModelConfig(embed_dim=64, depth=1, decoder_depth=1,
                          num_heads=2),
    )


def test_plan_mesh_scaling_sweeps_and_reports_collectives():
    rows = plan_mesh_scaling(
        _tiny_cfg(), img=(8, 16), batch=8,
        mesh_shapes=[{"fsdp": 2, "tensor": 2}, {"fsdp": 4}],
        ici_gbytes_per_sec=45.0)
    assert len(rows) == 2
    for row in rows:
        assert "error" not in row, row
        coll = row["collectives"]
        # fsdp param gathers / grad reduce-scatters and (for tp) activation
        # all-reduces MUST appear in a sharded train step
        assert coll["total_count"] > 0 and coll["total_bytes"] > 0
        assert row["ici_seconds_lower_bound"] > 0
        assert row["param_bytes_per_device"] > 0
    # tp=2 pays activation collectives fsdp-only doesn't: strictly more ops
    assert (rows[0]["collectives"]["total_count"]
            > rows[1]["collectives"]["total_count"])


def test_candidate_meshes_respect_divisibility():
    shapes = candidate_meshes(8, batch=8, num_heads=2)
    assert shapes, "8 devices must admit at least fsdp=8"
    for s in shapes:
        assert s["replica"] * s["fsdp"] * s["seq"] * s["tensor"] == 8
        assert 8 % (s["replica"] * s["fsdp"] * s["seq"]) == 0  # batch
        assert 2 % s["tensor"] == 0                            # heads
        # plain DDP (replica>1, fsdp=1) is dominated by fsdp and excluded
        assert not (s["replica"] > 1 and s["fsdp"] == 1)
    assert {"replica": 1, "fsdp": 8, "seq": 1, "tensor": 1} in shapes
    # tensor=4 would not divide num_heads=2
    assert all(s["tensor"] <= 2 for s in shapes)


def test_candidate_meshes_enumerate_pipeline_stages():
    shapes = candidate_meshes(8, batch=8, num_heads=2, depth=4, max_stage=4)
    staged = [s for s in shapes if s.get("stage", 1) > 1]
    assert staged, "max_stage=4 with depth=4 must admit pipelined shapes"
    for s in staged:
        assert s["stage"] * s["replica"] * s["fsdp"] * s["seq"] \
            * s["tensor"] == 8
        assert 4 % s["stage"] == 0   # depth divisibility
        assert 8 % s["stage"] == 0   # default microbatches (=stage) | batch
        assert s["seq"] == 1         # seq inside a pipelined trunk rejected
    # without max_stage (default 1) no pipelined shapes appear
    assert all("stage" not in s
               for s in candidate_meshes(8, batch=8, num_heads=2, depth=4))
    # depth=3 kills stage=2/4 even when requested
    assert all(s.get("stage", 1) == 1
               for s in candidate_meshes(8, batch=8, num_heads=2, depth=3,
                                         max_stage=4))


def test_plan_mesh_scaling_plans_pipelined_shape():
    """A stage=2 mesh plans through the pipelined trunk: ppermute activation
    hops show up as collective-permute next to the fsdp gathers."""
    import dataclasses

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, depth=2))
    rows = plan_mesh_scaling(cfg, img=(8, 16), batch=8,
                             mesh_shapes=[{"stage": 2, "fsdp": 2}])
    row = rows[0]
    assert "error" not in row, row
    assert row["mesh"]["stage"] == 2
    assert "collective-permute" in row["collectives"]["ops"]
    assert row["param_bytes_per_device"] > 0


def test_choose_mesh_picks_min_traffic_fitting_shape():
    res = choose_mesh(_tiny_cfg(), img=(8, 16), batch=8, n_devices=4)
    chosen, rows = res["chosen"], res["rows"]
    assert chosen is not None and "error" not in chosen
    viable = [r for r in rows if "error" not in r]
    assert chosen["collectives"]["total_bytes"] == min(
        r["collectives"]["total_bytes"] for r in viable)
    # an impossible HBM budget leaves no survivor instead of a bad pick
    res2 = choose_mesh(_tiny_cfg(), img=(8, 16), batch=8, n_devices=4,
                       hbm_bytes=1)
    assert res2["chosen"] is None and res2["rows"]


def test_plan_mesh_scaling_survives_impossible_shapes():
    rows = plan_mesh_scaling(
        _tiny_cfg(), img=(8, 16), batch=8,
        mesh_shapes=[{"fsdp": 512}, {"fsdp": 2}])
    assert "error" in rows[0] and "mesh" in rows[0]
    assert "error" not in rows[1]  # the sweep continues past failures


def test_plan_mesh_scaling_on_tpu_topology():
    """Offline-topology mode: compile against the real TPU compiler (no
    chips). The TPU pipeline sinks dtype converts into collectives, so a
    bf16-compute config must show its param all-gathers in bf16 — the
    number CPU-virtual planning gets wrong (module docstring)."""
    import pytest

    from orbit2_tpu.utils.scaling import topology_devices

    try:
        topology_devices("v5e:2x4")
    except RuntimeError as e:
        pytest.skip(f"no TPU topology support on this host: {e}")
    rows = plan_mesh_scaling(
        _tiny_cfg(), img=(8, 16), batch=8,
        mesh_shapes=[{"fsdp": 4, "tensor": 2}], topology="v5e:2x4")
    (row,) = rows
    assert "error" not in row, row
    assert row["topology"] == "v5e:2x4"
    by_dtype = row["collectives"]["total_bytes_by_dtype"]
    assert by_dtype.get("bf16", 0) > by_dtype.get("f32", 0)


def test_candidate_meshes_enumerate_expert_shapes_only_for_moe():
    moe = candidate_meshes(8, batch=8, num_heads=2, num_experts=4)
    ep = [s for s in moe if s.get("expert", 1) > 1]
    assert ep, "a 4-expert config on 8 devices must admit expert-parallel shapes"
    for s in ep:
        assert 4 % s["expert"] == 0
        assert (s["expert"] * s["replica"] * s["fsdp"] * s["seq"]
                * s["tensor"]) == 8
    # expert=8 would not divide 4 experts; dense configs get none at all
    assert all(s.get("expert", 1) <= 4 for s in moe)
    assert all("expert" not in s
               for s in candidate_meshes(8, batch=8, num_heads=2))
