"""Mesh-scaling planner: per-step collective traffic for any config × mesh.

The reference scales by launching Slurm jobs and watching NCCL timings
(reference examples/intermediate_downscaling.py:449-476 picks DP/TP sizes,
the collectives themselves are buried in FSDP/NCCL). On TPU the whole train
step is one XLA program, so the compiler's OWN choice of collectives can be
read back ahead of time: AOT-compile the step for each candidate mesh, parse
the optimized HLO for collective ops, and report bytes-on-the-wire per step
next to the per-device memory plan. That turns "which mesh shape should this
config train on?" into a table computed on a laptop instead of a pod-hours
bisection.

Two compile targets:

  * ``topology="v5e:2x4"`` (any PJRT topology string) — AOT-compile against
    the REAL TPU compiler via :func:`topology_devices`, no chips needed.
    This is the accurate mode: the TPU pipeline sinks dtype converts into
    collectives (fp32 master params are all-gathered/grad-synced in bf16),
    and ``memory_analysis()`` reports true HBM temp sizes. Measured at 117M
    fsdp4×tp2: CPU-virtual HLO shows 1.12 GB/step ALL-fp32 collectives; the
    v5e pipeline shows 0.93 GB bf16 all-gather + 0.23 GB bf16 all-reduce —
    the fp32 numbers are a CPU-backend artifact (its bf16 math is emulated
    in fp32, so converts hoist OUT of collectives).
  * default — virtual CPU devices (``--xla_force_host_platform_device_count``).
    Portable to any host, but byte totals run ~2x high for bf16-compute
    configs per the above; collective COUNTS and op mix remain right.

Composes with :func:`orbit2_tpu.utils.memory.plan_train_memory` (which
does the abstract compile and memory analysis); this module adds the
collective inventory, the sweep driver, and :func:`choose_mesh` (enumerate
every valid shape for a device count, plan all, pick the least-traffic
HBM-fitting one). See scripts/scaling_plan.py for the CLI and
docs/scaling.md for recorded 1B sweeps.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}

COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                  "all-to-all", "collective-permute", "collective-broadcast")

# HLO instructions are `%name = TYPE opcode(...)`, one per line. Async
# pairs count at the -done (its result is the transferred buffer; the
# -start tuple double-counts the operand). The op name is located first
# and the TYPE taken as everything between the ` = ` and the op — tuple
# types with >5 elements embed `/*index=N*/` comments (whose `=` breaks
# any "no-equals-in-type" shortcut), and XLA's grad sync is exactly such
# a many-element fused tuple all-reduce.
_OP_RE = re.compile(
    r"\s(?P<op>%s)(?P<suffix>-start|-done)?\(" % "|".join(COLLECTIVE_OPS))
_SHAPE_RE = re.compile(r"([a-z][a-z0-9]*)\[([0-9,]*)\]")


def _type_bytes(type_str: str) -> Dict[str, int]:
    """Bytes per dtype in an HLO type string (empty dict for token/opaque)."""
    by_dtype: Dict[str, int] = {}
    for dtype, dims in _SHAPE_RE.findall(type_str):
        size = _DTYPE_BYTES.get(dtype)
        if size is None:  # token/opaque types carry no payload
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        by_dtype[dtype] = by_dtype.get(dtype, 0) + n * size
    return by_dtype


def collective_inventory(hlo_text: str) -> Dict[str, Any]:
    """Count collective ops and their result bytes in optimized HLO text.

    Returns ``{"ops": {op: {"count": n, "bytes": b, "bytes_by_dtype":
    {dt: b}}}, "total_bytes": B, "total_count": N, "total_bytes_by_dtype":
    {dt: B}}``. Bytes are the per-device RESULT buffer of each
    collective — the tensor XLA materializes on every participant, a
    mesh-size-independent proxy for wire traffic (ring algorithms move
    ~2x(n-1)/n of it for all-reduce). The dtype breakdown is the tell for
    mixed-precision collectives: on the TPU pipeline fp32 master params
    all-gather in bf16 (see module docstring); a planner run that shows
    large f32 buckets for a bf16-compute config is compiling on the CPU
    backend. Ops inside while-loop bodies (e.g. grad-accum microbatch
    scans) are counted once per static occurrence; they run once per
    iteration at execution time."""
    ops: Dict[str, Dict[str, Any]] = {}
    for line in hlo_text.splitlines():
        head, sep, rest = line.partition(" = ")
        if not sep:
            continue
        m = _OP_RE.search(rest)
        if m is None or m.group("suffix") == "-start":
            continue
        entry = ops.setdefault(
            m.group("op"), {"count": 0, "bytes": 0, "bytes_by_dtype": {}})
        entry["count"] += 1
        # type = result shape(s): everything between the `=` and the op
        # name; operands after the op are %refs and never carry shapes
        for dt, b in _type_bytes(rest[:m.start()]).items():
            entry["bytes"] += b
            entry["bytes_by_dtype"][dt] = entry["bytes_by_dtype"].get(dt, 0) + b
    total_by_dtype: Dict[str, int] = {}
    for e in ops.values():
        for dt, b in e["bytes_by_dtype"].items():
            total_by_dtype[dt] = total_by_dtype.get(dt, 0) + b
    return {
        "ops": ops,
        "total_count": sum(e["count"] for e in ops.values()),
        "total_bytes": sum(e["bytes"] for e in ops.values()),
        "total_bytes_by_dtype": total_by_dtype,
    }


def topology_devices(topology_name: str):
    """Devices of an offline PJRT TPU topology (e.g. ``"v5e:2x4"``,
    ``"v5e:4x4"``) for AOT compilation — the real TPU compiler, no chips
    attached. Raises RuntimeError with the underlying cause when libtpu or
    the topology API is unavailable (callers/tests gate on this)."""
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name=topology_name)
        return list(topo.devices)
    except Exception as e:
        raise RuntimeError(
            f"TPU topology {topology_name!r} unavailable: {e}") from e


def plan_mesh_scaling(cfg, *, img, batch: int,
                      mesh_shapes: Iterable[Dict[str, int]],
                      in_channels: int = 7, out_channels: int = 3,
                      ici_gbytes_per_sec: Optional[float] = None,
                      topology: Optional[str] = None,
                      ) -> List[Dict[str, Any]]:
    """AOT-compile ``cfg``'s train step for each mesh shape in
    ``mesh_shapes`` (dicts with replica/fsdp/tensor/seq keys, default 1)
    and return one row per shape: the memory plan from
    :func:`plan_train_memory` plus the collective inventory and — when
    ``ici_gbytes_per_sec`` is given — a naive lower-bound estimate of
    per-step ICI seconds (total collective bytes / bandwidth; overlap and
    ring-efficiency not modeled). Shapes whose device product exceeds the
    available (virtual) devices, or that don't divide ``batch``/heads,
    yield a row with an "error" field instead of aborting the sweep.

    ``topology`` (e.g. ``"v5e:2x4"``) compiles against an offline TPU
    topology instead of the local devices — accurate collective dtypes and
    HBM temp sizes (see module docstring)."""
    from orbit2_tpu.parallel.mesh import make_mesh
    from orbit2_tpu.utils.memory import plan_train_memory

    topo_devices = topology_devices(topology) if topology else None
    rows: List[Dict[str, Any]] = []
    for shape in mesh_shapes:
        spec = {"stage": 1, "replica": 1, "fsdp": 1, "expert": 1,
                "tensor": 1, "seq": 1}
        spec.update(shape)
        row: Dict[str, Any] = {"mesh": dict(spec)}
        if topology:
            row["topology"] = topology
        try:
            mesh = make_mesh(**spec, devices=topo_devices)
            plan = plan_train_memory(
                cfg, img=img, in_channels=in_channels,
                out_channels=out_channels, batch=batch, mesh=mesh,
                include_collectives=True)
        except Exception as e:  # undividable batch/heads, too few devices...
            row["error"] = f"{type(e).__name__}: {e}"
            rows.append(row)
            continue
        row.update(plan)
        coll = row.get("collectives", {})
        if ici_gbytes_per_sec and coll.get("total_bytes"):
            row["ici_seconds_lower_bound"] = (
                coll["total_bytes"] / (ici_gbytes_per_sec * 2**30))
        rows.append(row)
    return rows


def candidate_meshes(n_devices: int, *, batch: int, num_heads: int,
                     max_tensor: int = 8, max_seq: int = 8,
                     depth: Optional[int] = None, max_stage: int = 1,
                     num_experts: int = 0,
                     ) -> List[Dict[str, int]]:
    """Enumerate mesh shapes with stage·replica·fsdp·expert·seq·tensor ==
    ``n_devices`` that pass the framework's static divisibility rules: the
    data axes (replica·fsdp·seq) divide ``batch``, tensor divides
    ``num_heads``, and — when pipeline shapes are requested via
    ``max_stage > 1`` — stage divides ``depth`` and the default microbatch
    count (= stage) divides ``batch``. seq and stage are mutually
    exclusive (config.py rejects seq_par inside a pipelined trunk).
    expert>1 shapes appear only for MoE configs (``num_experts > 0``,
    expert | num_experts; stage and expert are mutually exclusive, matching
    config.py). replica>1 (HSDP) is included only with fsdp>1 —
    replica=N,fsdp=1 is plain DDP, identical traffic to fsdp=N but with
    replicated optimizer state, never preferable on one slice."""
    shapes: List[Dict[str, int]] = []
    for stage in _divisors(n_devices):
        if stage > max_stage:
            continue
        if stage > 1 and (depth is None or depth % stage or batch % stage):
            continue
        for expert in _divisors(n_devices // stage):
            if expert > 1 and (not num_experts or num_experts % expert
                               or stage > 1):
                continue
            for tensor in _divisors(n_devices // stage // expert):
                if tensor > max_tensor or num_heads % tensor:
                    continue
                rest = n_devices // stage // expert // tensor
                for seq in _divisors(rest):
                    if seq > max_seq or (stage > 1 and seq > 1):
                        continue
                    dp = rest // seq
                    for fsdp in _divisors(dp):
                        replica = dp // fsdp
                        if replica > 1 and fsdp == 1:
                            continue
                        if batch % (replica * fsdp * seq):
                            continue
                        shape = {"replica": replica, "fsdp": fsdp,
                                 "seq": seq, "tensor": tensor}
                        if stage > 1:
                            shape["stage"] = stage
                        if expert > 1:
                            shape["expert"] = expert
                        shapes.append(shape)
    return shapes


def choose_mesh(cfg, *, img, batch: int, n_devices: int,
                in_channels: int = 7, out_channels: int = 3,
                hbm_bytes: Optional[int] = None,
                ici_gbytes_per_sec: Optional[float] = None,
                max_stage: int = 1,
                topology: Optional[str] = None,
                ) -> Dict[str, Any]:
    """Pick a mesh shape for ``cfg`` on ``n_devices`` chips: enumerate
    candidates (:func:`candidate_meshes`), plan each, drop shapes that
    error or exceed ``hbm_bytes`` per device, and return the survivor with
    the least collective traffic per step (ties: least memory). Returns
    ``{"chosen": row_or_None, "rows": all_rows}`` so callers can show the
    table behind the decision. This replaces the reference's pod-hours
    launch-and-bisect (intermediate_downscaling.py:449-476) with one
    CPU-host sweep; confirm the winner with a real profile on hardware."""
    m = cfg.model
    rows = plan_mesh_scaling(
        cfg, img=img, batch=batch,
        mesh_shapes=candidate_meshes(n_devices, batch=batch,
                                     num_heads=m.num_heads, depth=m.depth,
                                     max_stage=max_stage,
                                     num_experts=m.moe_experts),
        in_channels=in_channels, out_channels=out_channels,
        ici_gbytes_per_sec=ici_gbytes_per_sec, topology=topology)
    viable = [r for r in rows if "error" not in r]
    if hbm_bytes is not None:
        viable = [r for r in viable
                  if r.get("total_bytes_per_device", 0) <= hbm_bytes]
    viable.sort(key=lambda r: (r["collectives"]["total_bytes"],
                               r.get("total_bytes_per_device", 0)))
    return {"chosen": viable[0] if viable else None, "rows": rows}


def _divisors(n: int) -> List[int]:
    return [d for d in range(1, n + 1) if n % d == 0]
