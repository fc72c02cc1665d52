"""Trainer — the librarified equivalent of the reference's main() loop
(examples/intermediate_downscaling.py:379-832): multi-dataset curriculum,
one jit specialization per data phase, per-epoch warmup-cosine LR, Orbax
checkpointing every epoch, optional validation.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbit2_tpu.config import Config
from orbit2_tpu.data.itermodule import IterDataModule
from orbit2_tpu.parallel.mesh import batch_sharding, mesh_from_config
from orbit2_tpu.parallel.sharding import param_shardings
from orbit2_tpu.training import checkpoint as ckpt
from orbit2_tpu.training.optim import make_lr_scheduler, make_optimizer, set_learning_rate
from orbit2_tpu.training.train import evaluate_batch, make_eval_step, make_train_step

log = logging.getLogger("orbit2_tpu")


class Trainer:
    def __init__(self, config: Config, mesh=None, checkpoint_dir: str = "checkpoints/climate",
                 run_validation: bool = False, metrics_path: Optional[str] = None,
                 async_checkpoints: bool = False, keep_last_checkpoints: int = 0,
                 debug_grad_norms: bool = False):
        from orbit2_tpu.utils.logging import MetricsLogger

        self.async_checkpoints = async_checkpoints
        self.debug_grad_norms = debug_grad_norms
        self.keep_last_checkpoints = keep_last_checkpoints
        self.cfg = config.validate()
        from orbit2_tpu.utils.compile_cache import maybe_enable_from_config

        maybe_enable_from_config(self.cfg.trainer)
        if self.cfg.parallelism.seq_par > 1:
            from orbit2_tpu.ops.seq_attention import set_seq_impl

            set_seq_impl(self.cfg.parallelism.seq_impl)
        self.checkpoint_dir = checkpoint_dir
        self.run_validation = run_validation
        self.metrics = MetricsLogger(metrics_path)
        self.model = None
        self.params = None
        # extra mutable variable collections (BatchNorm running stats for the
        # conv models); empty for ResSlimViT/ViT
        self.aux: Dict[str, Any] = {}
        self.opt_state = None
        self.tx = None
        self.lr_schedule = None
        self.history: list = []
        self._data_modules: Dict[str, Any] = {}
        if mesh is not None:
            self.mesh = mesh
        elif self.cfg.parallelism.auto:
            self.mesh = self._auto_mesh()
        else:
            self.mesh = mesh_from_config(config.parallelism)

    def _auto_mesh(self):
        """parallelism: auto — resolve the mesh with the scaling planner.

        Enumerates every valid axis factorization for the live device count
        (utils/scaling.py::candidate_meshes), AOT-plans each (per-device
        memory + the partitioner's own collective choices), drops shapes
        that exceed the device HBM, and takes the least-traffic survivor.
        The chosen shape is written back into cfg.parallelism, and the full
        candidate table is logged so the decision is auditable. Replaces
        the reference's hand-tuned per-config rank layouts
        (reference configs/interm_10b.yaml:15-17)."""
        from orbit2_tpu.utils.scaling import choose_mesh

        c = self.cfg
        key = next(iter(c.data.low_res_dir))
        dm = self._data_modules.get(key)
        if dm is None:
            dm = self._make_data_module(key)
            dm.setup()
            self._data_modules[key] = dm
        in_shape, out_shape = dm.get_data_dims()
        hbm = None
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            hbm = stats.get("bytes_limit")
        except Exception:
            pass
        res = choose_mesh(
            c, img=tuple(in_shape[-2:]), batch=c.trainer.batch_size,
            n_devices=jax.device_count(), in_channels=int(in_shape[1]),
            out_channels=int(out_shape[1]), hbm_bytes=hbm)
        chosen = res["chosen"]
        if chosen is None:
            raise ValueError(
                f"parallelism: auto found no viable mesh for "
                f"{jax.device_count()} devices (batch {c.trainer.batch_size}"
                f", hbm {hbm}); candidates: "
                f"{[r.get('mesh') for r in res['rows']]}")
        shape = chosen["mesh"]
        p = c.parallelism
        p.fsdp = int(shape.get("fsdp", 1))
        p.simple_ddp = int(shape.get("replica", 1))
        p.tensor_par = int(shape.get("tensor", 1))
        p.seq_par = int(shape.get("seq", 1))
        p.pipeline = int(shape.get("stage", 1))
        p.expert_par = int(shape.get("expert", 1))
        p.auto = False  # resolved: the config is concrete from here on
        log.info("parallelism auto chose mesh %s (of %d candidates)",
                 shape, len(res["rows"]))
        self.metrics.log(
            "auto_mesh", chosen=shape,
            candidates=[{
                "mesh": r.get("mesh"),
                "total_bytes_per_device": r.get("total_bytes_per_device"),
                "collective_bytes": (r.get("collectives") or {}).get(
                    "total_bytes"),
                "error": r.get("error"),
            } for r in res["rows"]])
        return mesh_from_config(p)

    # -- construction ---------------------------------------------------------

    def _make_data_module(self, data_key: str, div: int = None,
                          overlap: int = None) -> IterDataModule:
        """div/overlap default to the config's tiling; inference drivers pass
        div=1, overlap=0 for the UNTILED module that locates/stitches full
        samples (the reference's dm_vis, visualize.py:360-378)."""
        c = self.cfg
        # config task -> IterDataModule task string (reference examples pass
        # "downscaling" / "direct-forecasting" / "continuous-forecasting")
        dm_task = {"downscaling": "downscaling",
                   "forecasting": "direct-forecasting"}.get(
                       c.trainer.task, c.trainer.task)
        kwargs = {}
        if dm_task != "downscaling":
            kwargs = dict(src=c.data.src, history=c.data.history,
                          window=c.data.window, pred_range=c.data.pred_range,
                          random_lead_time=c.data.random_lead_time,
                          max_pred_range=c.data.max_pred_range,
                          hrs_each_step=c.data.hrs_each_step)
        return IterDataModule(
            dm_task,
            c.data.low_res_dir[data_key],
            c.data.high_res_dir[data_key],
            c.data.dict_in_variables[data_key],
            out_vars=c.data.dict_out_variables[data_key],
            data_par_size=jax.process_count(),
            data_par_rank=jax.process_index(),
            subsample=1,
            batch_size=c.trainer.batch_size,
            buffer_size=c.trainer.buffer_size,
            num_workers=c.trainer.num_workers,
            drop_last=True,  # keep train-step shapes static for XLA
            div=c.tiling.effective_div if div is None else div,
            overlap=c.tiling.effective_overlap if overlap is None else overlap,
            seed=(c.trainer.data_seed if c.trainer.data_seed is not None
                  else c.trainer.seed),
            **kwargs,
        )

    def _check_tiling(self, data_module):
        """Tile dims must divide by patch_size (reference aborts with an
        increase-the-overlap instruction, intermediate_downscaling.py:535-543)."""
        c = self.cfg
        if c.tiling.effective_div <= 1:
            return
        if c.trainer.task != "downscaling":
            raise ValueError(
                "TILES tiling is a downscaling-only feature (reference "
                "iterdataset.py:90-177); disable tiling.do_tiling for "
                f"task={c.trainer.task}")
        in_shape, _ = data_module.get_data_dims()
        _, h, w = in_shape[1:]
        p = c.model.patch_size
        if h % p or w % p:
            raise ValueError(
                f"tile shape ({h}, {w}) is not divisible by patch_size {p}; "
                f"increase tiling.overlap by {h % p or w % p} "
                "(see reference TILES divisibility rule)"
            )

    def _build_model(self, data_module, data_key: str):
        # circular-safe import; loader choice mirrors the reference's
        # per-task module factories (its loaders.py:225-257)
        from orbit2_tpu.utils.loaders import (
            load_downscaling_module,
            load_forecasting_module,
        )

        loader = (load_downscaling_module if self.cfg.trainer.task ==
                  "downscaling" else load_forecasting_module)
        c = self.cfg
        self._check_tiling(data_module)
        model_kwargs = dict(
            default_vars=c.data.default_vars,
            superres_mag=c.model.superres_mag,
            cnn_ratio=c.model.cnn_ratio,
            patch_size=c.model.patch_size,
            embed_dim=c.model.embed_dim,
            depth=c.model.depth,
            decoder_depth=c.model.decoder_depth,
            num_heads=c.model.num_heads,
            mlp_ratio=c.model.mlp_ratio,
            drop_path=c.model.drop_path,
            drop_rate=c.model.drop_rate,
            attention_impl=c.model.attention_impl,
            gelu_approx=c.model.gelu_approx,
            data_type=c.trainer.data_type,
            remat=c.trainer.remat,
            remat_policy=c.trainer.remat_policy,
            pipeline_stages=c.parallelism.pipeline,
            pipeline_microbatches=c.parallelism.pipeline_microbatches,
            pipeline_interleave=c.parallelism.pipeline_interleave,
            moe_experts=c.model.moe_experts,
            moe_every=c.model.moe_every,
            moe_capacity_factor=c.model.moe_capacity_factor,
            moe_top_k=c.model.moe_top_k,
        )
        (model, train_loss, val_losses, test_losses, _, val_transforms,
         test_transforms) = loader(
            data_module=data_module, architecture=c.model.preset,
            train_loss=c.trainer.train_loss, model_kwargs=model_kwargs,
        )
        self.model = model
        self.train_loss = train_loss
        self.val_losses = val_losses
        self.val_transforms = val_transforms
        self.test_losses = test_losses
        self.test_transforms = test_transforms
        self._wire_out_mask(data_module)

    def _wire_out_mask(self, data_module):
        """Plumb the dataset validity mask into mask-aware losses — the
        reference wires Mask(dm.get_out_mask()) through its module
        (era5_prism_deep_learning.py:39-42,76-78); here any loss exposing
        set_mask (masked_mse) receives it. Masked losses are full-grid:
        TILES tiling would hand them grid-sized masks against tile-sized
        targets, so the combination is rejected."""
        losses = [self.train_loss] + list(self.val_losses or []) \
            + list(self.test_losses or [])
        maskable = [l for l in losses if hasattr(l, "set_mask")]
        if not maskable:
            return
        getm = getattr(data_module, "get_out_mask", None)
        mask = getm() if getm is not None else None
        if mask is None:
            log.warning("mask-aware loss requested but the data module "
                        "derives no validity mask — running unmasked")
            for l in maskable:  # clear a previous dataset's mask
                l.mask = None
            return
        if self.cfg.tiling.effective_div > 1:
            raise ValueError(
                "masked losses need full-grid targets; disable "
                "tiling.do_tiling for masked fine-tuning")
        for l in maskable:
            l.set_mask(mask)
        log.info("wired validity mask (%.1f%% valid) into %d losses",
                 100.0 * float(np.asarray(mask).mean()), len(maskable))

    def _phase_model(self, data_module, data_key: str):
        c = self.cfg
        in_shape, _ = data_module.get_data_dims()
        # forecasting in_shape carries a history dim ([B,T,C,H,W]); the
        # spatial dims are always the trailing two
        in_h, in_w = in_shape[-2:]
        in_vars, out_vars = data_module.get_data_variables()
        if not hasattr(self.model, "for_phase"):
            # geometry-agnostic models (the forecasting ResNet preset)
            return self.model
        m = self.model.for_phase(
            spatial_resolution=c.data.spatial_resolution[data_key],
            img_size=(in_h, in_w),
            in_channels=len(in_vars),
            out_channels=len(out_vars),
        )
        if c.parallelism.seq_par > 1 and hasattr(m, "seq_shard"):
            import dataclasses

            m = dataclasses.replace(m, seq_shard=True)
        return m

    def _init_params(self, phase_model, data_module):
        """Initialize params directly sharded onto the mesh. Non-param
        collections (BatchNorm batch_stats in the conv models) land in
        self.aux, replicated (they are small and updated data-parallel)."""
        from orbit2_tpu.parallel.mesh import replicated

        in_shape, _ = data_module.get_data_dims()
        in_vars, out_vars = data_module.get_data_variables()
        dummy = jnp.zeros((2,) + tuple(in_shape[1:]), dtype=jnp.float32)
        rng = jax.random.PRNGKey(self.cfg.trainer.seed)

        def init_fn(r):
            return phase_model.init(
                {"params": r}, dummy, tuple(in_vars), tuple(out_vars),
                deterministic=True,
            )

        abstract = jax.eval_shape(init_fn, rng)
        out_sh = {
            k: (param_shardings(v, self.mesh) if k == "params"
                else jax.tree.map(lambda _: replicated(self.mesh), v))
            for k, v in abstract.items()
        }
        with self.mesh:
            variables = jax.jit(init_fn, out_shardings=out_sh)(rng)
        params = variables["params"]
        # "moe_loss" is sown per-step (models/components/moe.py), not
        # threaded training state — keep it out of the aux tree
        self.aux = {k: v for k, v in variables.items()
                    if k not in ("params", "moe_loss")}
        n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
        log.info("initialized %.2fM params on mesh %s%s", n / 1e6,
                 dict(self.mesh.shape),
                 f" (+aux: {sorted(self.aux)})" if self.aux else "")
        return params

    def _ensure_aux(self, phase_model, data_module):
        """Pre-seeded param trees (fine-tune imports) carry only params; a
        BatchNorm model still needs fresh aux collections (running stats at
        init values). Initializes ONLY the non-param collections — XLA
        dead-code-eliminates the unused param buffers."""
        if self.aux:
            return
        in_shape, _ = data_module.get_data_dims()
        in_vars, out_vars = data_module.get_data_variables()
        dummy = jnp.zeros((2,) + tuple(in_shape[1:]), jnp.float32)

        def aux_only(r):
            variables = phase_model.init(
                {"params": r}, dummy, tuple(in_vars), tuple(out_vars),
                deterministic=True)
            return {k: v for k, v in variables.items()
                    if k not in ("params", "moe_loss")}

        if set(jax.eval_shape(aux_only, jax.random.PRNGKey(0))):
            with self.mesh:
                self.aux = jax.jit(aux_only)(
                    jax.random.PRNGKey(self.cfg.trainer.seed))
            log.info("initialized aux collections: %s", sorted(self.aux))

    def _put_batch(self, x, y, dtype=None):
        """Stage one (x, y) batch onto the mesh. When `dtype` is given the
        host casts BEFORE the transfer — with data_type=bfloat16 (the
        config default, matching the reference's end-to-end bf16 training)
        this halves H2D bytes, which is the whole Trainer-loop bottleneck
        on thin links (docs/performance.md "Trainer-vs-raw-loop")."""
        if dtype is not None:
            x = np.asarray(x).astype(dtype)
            y = np.asarray(y).astype(dtype)
        sh = batch_sharding(self.mesh)
        if jax.process_count() > 1:
            # each process loads its own file-shard of the data
            # (data_par_rank=process_index); the local batches concatenate
            # into the global batch along the data axes — device_put cannot
            # address remote devices, this can
            return (jax.make_array_from_process_local_data(sh, np.asarray(x)),
                    jax.make_array_from_process_local_data(sh, np.asarray(y)))
        return (jax.device_put(jnp.asarray(x), sh), jax.device_put(jnp.asarray(y), sh))

    # -- main loop -------------------------------------------------------------

    def fit(self, max_epochs: Optional[int] = None, max_steps_per_epoch: Optional[int] = None):
        c = self.cfg
        max_epochs = max_epochs if max_epochs is not None else c.trainer.max_epochs
        interval = c.trainer.interval_epochs

        self.tx = make_optimizer("adamw", {
            "lr": c.model.lr, "weight_decay": c.model.weight_decay,
            "betas": (c.model.beta_1, c.model.beta_2),
            "mu_dtype": c.trainer.adam_mu_dtype,
            "nu_dtype": c.trainer.adam_nu_dtype,
        })
        self.lr_schedule = make_lr_scheduler("linear-warmup-cosine-annealing", {
            "lr": c.model.lr, "warmup_epochs": c.model.warmup_epochs,
            "max_epochs": max_epochs, "warmup_start_lr": c.model.warmup_start_lr,
            "eta_min": c.model.eta_min,
        })

        epoch_start = 0
        first_time = True
        steps = {}  # (data_key) -> jitted train step
        # rbg keys: bulk dropout bits use XLA's RngBitGenerator, ~2x faster
        # than threefry on TPU for the big mask tensors (measured in
        # scripts/bench_ablate.py: 561 -> 434 ms/step at 117M)
        rng = jax.random.key(c.trainer.seed + 17, impl="rbg")

        # resume
        resume_path = c.trainer.checkpoint or ckpt.latest_checkpoint(self.checkpoint_dir)

        while epoch_start < max_epochs:
            for data_key in c.data.low_res_dir:
                # cache per phase: re-visiting a data_key must not re-glob /
                # re-fill the sample store (the reference rebuilds the data
                # module every visit, intermediate_downscaling.py:517)
                dm = self._data_modules.get(data_key)
                if dm is None:
                    dm = self._make_data_module(data_key)
                    dm.setup()
                    self._data_modules[data_key] = dm
                if first_time:
                    self._build_model(dm, data_key)
                else:
                    # masked losses hold ONE mask; a multi-dataset curriculum
                    # must swap in the current phase's validity mask before
                    # this phase's train step traces (the jit bakes it) and
                    # before live eval metrics run (they read it per call)
                    self._wire_out_mask(dm)

                phase_model = self._phase_model(dm, data_key)
                in_vars, out_vars = dm.get_data_variables()

                if first_time:
                    if self.params is None:
                        self.params = self._init_params(phase_model, dm)
                    else:
                        # pre-seeded params (fine-tune import): place on mesh
                        from orbit2_tpu.parallel.sharding import shard_params

                        self._ensure_aux(phase_model, dm)
                        self.params = shard_params(
                            jax.tree.map(jnp.asarray, self.params), self.mesh)
                    # optax state mirrors the param tree under mu/nu, so the
                    # same path rules produce its shardings; scalars (count,
                    # injected lr) fall through to replicated P()
                    abstract_opt = jax.eval_shape(self.tx.init, self.params)
                    opt_sh = param_shardings(abstract_opt, self.mesh)
                    with self.mesh:
                        self.opt_state = jax.jit(
                            self.tx.init, out_shardings=opt_sh)(self.params)
                    if resume_path and os.path.exists(resume_path):
                        template = {
                            "params": self.params, "opt_state": self.opt_state,
                            "epoch": 0,
                        }
                        if self.aux:
                            template["aux"] = self.aux
                        state = ckpt.restore_checkpoint(resume_path, template)
                        self.params = state["params"]
                        self.opt_state = state["opt_state"]
                        if self.aux:
                            self.aux = state["aux"]
                        epoch_start = int(state["epoch"]) + 1
                        log.info("resumed from %s at epoch %d", resume_path, epoch_start)
                    first_time = False

                if data_key not in steps:
                    steps[data_key] = make_train_step(
                        phase_model, self.train_loss, c.data.var_weights,
                        self.tx, in_vars, out_vars, mesh=self.mesh,
                        debug_grad_norms=self.debug_grad_norms,
                        grad_accum=c.trainer.grad_accum,
                        aux_collections=tuple(sorted(self.aux)),
                        moe_aux_weight=c.model.moe_aux_weight,
                    )
                train_step = steps[data_key]

                epoch_end = min(epoch_start + interval, max_epochs)
                for epoch in range(epoch_start, epoch_end):
                    self.opt_state = set_learning_rate(
                        self.opt_state, self.lr_schedule(epoch))
                    t0 = time.perf_counter()
                    # losses stay on-device until epoch end: a float() here
                    # would sync every step and stall dispatch pipelining
                    # (the host must run ahead to overlap data staging with
                    # compute — device_prefetch only helps if it can)
                    step_losses, nbatches = [], 0

                    # multi-process: the train step is one collective SPMD
                    # program, so every process must take the SAME number of
                    # steps. File shards with unequal lengths can yield
                    # unequal per-rank batch counts (wrap-around replication
                    # equalizes file COUNTS only) — clamp the epoch to the
                    # global minimum (drop_last semantics across ranks).
                    # num_batches peeks the upcoming permutation from npz
                    # headers; it must run BEFORE the epoch iterator below.
                    sync_steps = None
                    if jax.process_count() > 1:
                        from jax.experimental import multihost_utils

                        counts = np.asarray(multihost_utils.process_allgather(
                            np.asarray(dm.num_batches("train"), np.int32)))
                        sync_steps = int(counts.min())

                    # data_type=bfloat16 (config default; the reference
                    # trains bf16 end-to-end) casts batches ON THE HOST so
                    # the H2D transfer ships half the bytes
                    stage_dtype = (jnp.bfloat16
                                   if c.trainer.data_type == "bfloat16"
                                   else None)
                    # host-side wait split, reported per epoch: data_wait_s
                    # is time blocked on the staging pipeline (loader + H2D
                    # ahead-queue), fence_wait_s is time blocked on device
                    # readbacks — together they attribute the epoch wall to
                    # input pipeline vs device compute from telemetry alone
                    data_wait_s = fence_wait_s = 0.0
                    h2d_bytes = 0

                    def _staged(loader):
                        # device_prefetch: stage H2D transfers `depth` batches
                        # ahead so the copy overlaps the previous step's compute
                        from orbit2_tpu.data.loader import device_prefetch

                        def put(batch):
                            # batch is (x, y, [mask,] in_vars, out_vars)
                            return self._put_batch(batch[0], batch[1],
                                                   dtype=stage_dtype)

                        return device_prefetch(loader, put, depth=2)

                    staged_it = iter(_staged(dm.train_dataloader()))
                    batch_idx = -1
                    while True:
                        batch_idx += 1
                        tw = time.perf_counter()
                        try:
                            x, y = next(staged_it)
                        except StopIteration:
                            break
                        data_wait_s += time.perf_counter() - tw
                        if max_steps_per_epoch and batch_idx >= max_steps_per_epoch:
                            break
                        if sync_steps is not None and batch_idx >= sync_steps:
                            break
                        h2d_bytes += x.nbytes + y.nbytes
                        rng, step_rng = jax.random.split(rng)
                        with self.mesh:
                            if self.aux:
                                (self.params, self.aux, self.opt_state,
                                 loss) = train_step(self.params, self.aux,
                                                    self.opt_state, x, y,
                                                    step_rng)
                            else:
                                self.params, self.opt_state, loss = train_step(
                                    self.params, self.opt_state, x, y, step_rng)
                        step_losses.append(loss)
                        nbatches += 1
                        # periodic fence: deferring every readback would let
                        # the host dispatch an entire epoch ahead, pinning
                        # each staged batch in HBM until its step runs. One
                        # sync per 32 steps keeps dispatch pipelined while
                        # bounding run-ahead residency to <=32 batches.
                        if nbatches % 32 == 0:
                            tf_ = time.perf_counter()
                            float(loss)
                            fence_wait_s += time.perf_counter() - tf_
                    tf_ = time.perf_counter()
                    epoch_loss = (float(jnp.stack(step_losses).sum())
                                  if step_losses else 0.0)
                    fence_wait_s += time.perf_counter() - tf_
                    dt = time.perf_counter() - t0
                    record = {
                        "epoch": epoch, "data_key": data_key,
                        "loss": epoch_loss / max(1, nbatches),
                        "batches": nbatches, "seconds": dt,
                        "lr": self.lr_schedule(epoch),
                        "data_wait_s": round(data_wait_s, 4),
                        "fence_wait_s": round(fence_wait_s, 4),
                        "h2d_bytes": h2d_bytes,
                    }
                    # epoch-boundary HBM telemetry (TPU/GPU; None on CPU) —
                    # the reference prints torch.cuda.memory_reserved here
                    # (intermediate_downscaling.py:746-747, 772)
                    from orbit2_tpu.utils.memory import device_memory_stats
                    hbm = device_memory_stats()
                    if hbm:
                        record.update({f"hbm_{k}": v for k, v in hbm.items()})
                    self.history.append(record)
                    self.metrics.log("train_epoch", **record)
                    self._save(epoch)

                    if self.run_validation:
                        self.validate(phase_model, dm, in_vars, out_vars, epoch)
                epoch_start = epoch_end
                if epoch_start >= max_epochs:
                    break
        ckpt.wait_for_async_saves()
        return self.history

    def validate(self, phase_model, dm, in_vars, out_vars, epoch: int):
        # cache the jitted eval step per (model, variable-set). Flax modules
        # hash by config, so curriculum revisits of the same phase hit the
        # cache — the MODULE is the key (not its hash value: dict equality
        # resolves hash collisions between distinct configs); wrapped presets
        # (PreInterpolated vit/unet/resnet) fall back to identity, which is
        # stable because their for_phase returns self
        try:
            hash(phase_model)
            mkey = phase_model
        except TypeError:  # unhashable config fields
            mkey = id(phase_model)
        ekey = (mkey, tuple(in_vars), tuple(out_vars))
        if not hasattr(self, "_eval_steps"):
            self._eval_steps = {}
        if ekey not in self._eval_steps:
            self._eval_steps[ekey] = make_eval_step(
                phase_model, in_vars, out_vars, mesh=self.mesh,
                aux_collections=tuple(sorted(self.aux)))
        eval_step = self._eval_steps[ekey]
        agg: Dict[str, float] = {}
        n = 0
        for batch, nreal in self._synced_batches(dm.val_dataloader, dm, "val"):
            losses, real = self._eval_one(eval_step, batch, "val",
                                          self.val_losses, self.val_transforms,
                                          out_vars, dm.batch_size, real=nreal)
            for k, v in losses.items():
                agg[k] = agg.get(k, 0.0) + float(v) * real
            n += real
        means = {k: v / max(1, n) for k, v in agg.items()}
        log.info("validation epoch %d: %s", epoch, means)
        self.last_validation = {"means": means, "samples": n}
        return means

    def _synced_batches(self, make_loader, dm, stage, max_batches=None):
        """Iterate an eval dataloader with the ROUND COUNT agreed across
        processes. Multi-process eval steps are collective SPMD programs: a
        rank whose file shard yields fewer batches (unequal shard lengths
        survive the reader's wrap-around FILE replication) must keep
        participating in every collective or all ranks hang — it yields
        full-size zero batches with real=0 until the longest rank is done.

        Yields (batch, real): real is None for a genuine batch (derived from
        its row count) and 0 for a padding round. The per-process count
        comes from the data module's header-only batch count (no data is
        read to count) and is gathered once per (module, stage)."""
        def loader():
            for i, b in enumerate(make_loader()):
                if max_batches is not None and i >= max_batches:
                    return
                yield b

        if jax.process_count() == 1:
            for b in loader():
                yield b, None
            return
        from jax.experimental import multihost_utils

        # key on the module OBJECT (identity hash): holding it in the dict
        # keeps it alive, so a freed module's address can never be reused by
        # a new one and alias a stale count — id() alone could collide after
        # GC, desynchronizing the collective allgather across processes
        ckey = (dm, stage, max_batches)
        if not hasattr(self, "_eval_round_counts"):
            self._eval_round_counts = {}
        if ckey not in self._eval_round_counts:
            local_n = dm.num_batches(stage)
            if max_batches is not None:
                local_n = min(local_n, max_batches)
            rounds = int(np.asarray(multihost_utils.process_allgather(
                np.asarray(local_n, np.int32))).max())
            self._eval_round_counts[ckey] = rounds
        rounds = self._eval_round_counts[ckey]
        it = loader()
        last = None
        for _ in range(rounds):
            b = next(it, None)
            if b is not None:
                last = b
                yield b, None
            else:  # padding round: full-size zeros, zero real samples
                if last is not None:
                    # match the real batches' exact shapes (a tail batch is
                    # padded up by _eval_one, so only the row count differs)
                    x0 = np.zeros((dm.batch_size,)
                                  + np.asarray(last[0]).shape[1:], np.float32)
                    y0 = np.zeros((dm.batch_size,)
                                  + np.asarray(last[1]).shape[1:], np.float32)
                else:  # this rank saw no batches at all
                    in_size, out_size = dm.get_data_dims()
                    x0 = np.zeros(in_size, np.float32)
                    y0 = np.zeros(out_size, np.float32)
                yield (x0, y0), 0
        if next(it, None) is not None:
            # a miscount here would silently drop real batches — fail loud
            raise RuntimeError(
                f"num_batches({stage!r}) undercounted: the dataloader "
                f"yielded more than {rounds} batches")

    def _eval_one(self, eval_step, batch, stage, loss_metrics, transforms,
                  out_vars, batch_size, real=None):
        """Run one eval batch. Partial tail batches are padded to the static
        batch size (so the jitted step never recompiles) and the padding rows
        sliced off again before metrics — no sample is ever dropped.

        Multi-process: each rank first all-gathers its local batch size, so
        the tail decision is COLLECTIVE — if any rank has a partial batch,
        every rank takes the pad+replicate+strip path together (per-rank
        tails may differ when val files have unequal lengths; a rank whose
        last batch happens to be full still participates). The padded
        prediction is replicated to every host and each strips every rank's
        padding rows using the gathered per-rank counts. The reference
        instead drops multi-rank tail batches — here they are evaluated.

        `real` overrides the sample count for padding rounds injected by
        _synced_batches (full-size zero batch, real=0).

        Returned weight = the number of samples the metric mean covers
        (global across processes), so sample-weighted aggregation over
        batches is consistent between full and tail batches."""
        x, y = np.asarray(batch[0]), np.asarray(batch[1])
        if real is None:
            real = x.shape[0]
        nproc = jax.process_count()
        if nproc > 1:
            from jax.experimental import multihost_utils

            reals = np.asarray(multihost_utils.process_allgather(
                np.asarray(real, np.int32)))
        else:
            reals = np.asarray([real])
        any_tail = bool((reals != batch_size).any())
        if x.shape[0] != batch_size:  # partial tail: tile the last row up
            reps = [1] * x.ndim
            reps[0] = batch_size - x.shape[0]
            x = np.concatenate([x, np.tile(x[-1:], reps)])
            reps_y = [1] * y.ndim
            reps_y[0] = batch_size - y.shape[0]
            y = np.concatenate([y, np.tile(y[-1:], reps_y)])
        xd, yd = self._put_batch(x, y)
        aux = getattr(self, "aux", None)
        with self.mesh:
            if aux:
                yhat = eval_step(self.params, aux, xd, yd)
            else:
                yhat = eval_step(self.params, xd, yd)
        if any_tail:
            if nproc > 1:
                yhat_g = np.asarray(self._replicate(yhat))
                y_g = np.asarray(self._replicate(yd))
                keep = np.concatenate([
                    np.arange(p * batch_size, p * batch_size + int(reals[p]))
                    for p in range(nproc)])
                if keep.size == 0:  # all ranks on padding rounds
                    return {}, 0
                yhat = jnp.asarray(yhat_g[keep])
                yd = jnp.asarray(y_g[keep])
            else:
                yhat = jnp.asarray(np.asarray(yhat)[:real])
                yd = jnp.asarray(y[:real])
        losses = evaluate_batch(yhat, yd, stage, loss_metrics, transforms,
                                out_vars)
        return losses, int(reals.sum())

    def _replicate(self, arr):
        """Jitted identity onto a fully-replicated sharding: after it, every
        host addresses the whole array (one all-gather of one batch)."""
        if not hasattr(self, "_replicate_fn"):
            from orbit2_tpu.parallel.mesh import replicated

            self._replicate_fn = jax.jit(
                lambda a: a, out_shardings=replicated(self.mesh))
        with self.mesh:
            return self._replicate_fn(arr)

    def test(self, data_key: Optional[str] = None, max_batches: Optional[int] = None,
             quant: str = "none"):
        """Evaluate the test split with the test losses + denormalize
        transforms (the reference's test stage, evaluate_func semantics).

        `quant="w8a8"` serves the trunk through the int8 MXU path
        (ops/quant.py): the trained fp params are converted in place
        (utils/quantize.py) and the phase model swapped for its quantized
        twin. Measured 1.9x vs the best bf16 deterministic forward at 1B
        serving shapes with ~1% relative output RMSE
        (docs/performance.md "w8a8 serving")."""
        c = self.cfg
        data_key = data_key or next(iter(c.data.low_res_dir))
        dm = self._data_modules.get(data_key)
        if dm is None:  # not pre-built by fit(); test-only setup, uncached
            dm = self._make_data_module(data_key)
            dm.setup("test")
        if self.model is None:
            self._build_model(dm, data_key)
        else:
            # the wired mask may belong to the dataset fit() last visited —
            # masked eval on a different data_key must swap in THIS
            # dataset's validity mask (live metrics read it per call)
            self._wire_out_mask(dm)
        phase_model = self._phase_model(dm, data_key)
        in_vars, out_vars = dm.get_data_variables()
        if self.params is None:
            self.params = self._init_params(phase_model, dm)
        else:
            # pre-seeded trees (checkpoint restore / torch import) may carry
            # the SAVE topology's placement — re-shard onto THIS trainer's
            # mesh before jit, mirroring fit()'s resume path (reference
            # resume semantics: intermediate_downscaling.py:659-672)
            from orbit2_tpu.parallel.sharding import shard_params

            self.params = shard_params(
                jax.tree.map(jnp.asarray, self.params), self.mesh)
            if getattr(self, "aux", None):
                self.aux = shard_params(
                    jax.tree.map(jnp.asarray, self.aux), self.mesh)
            self._ensure_aux(phase_model, dm)  # pre-seeded conv params
        saved_params = None
        if quant != "none":
            # serve through the quantized twin WITHOUT mutating trainer
            # state: the fp params are restored after the loop so the same
            # Trainer can keep training / visualizing / re-evaluating in fp
            saved_params = self.params
            phase_model, self.params = self._quantize_for_serving(
                quant, phase_model, dm, self.params)
        eval_step = make_eval_step(phase_model, in_vars, out_vars,
                                   mesh=self.mesh,
                                   aux_collections=tuple(sorted(self.aux)))
        try:
            agg: Dict[str, float] = {}
            n = 0
            for batch, nreal in self._synced_batches(dm.test_dataloader, dm,
                                                     "test", max_batches):
                losses, real = self._eval_one(eval_step, batch, "test",
                                              self.test_losses,
                                              self.test_transforms, out_vars,
                                              dm.batch_size, real=nreal)
                for k, v in losses.items():
                    agg[k] = agg.get(k, 0.0) + float(v) * real
                n += real
        finally:
            if saved_params is not None:
                self.params = saved_params
        means = {k: v / max(1, n) for k, v in agg.items()}
        self.metrics.log("test", data_key=data_key, samples=n, **means)
        return means

    def _quantize_for_serving(self, quant: str, phase_model, data_module,
                              params):
        """Swap the phase model for its w8a8 twin and convert the trained fp
        params onto the int8 layout (utils/quantize.py). Quantized kernels
        land replicated on the mesh (sharding rules match `kernel$` only),
        which is the intended serving placement — the int8 win is a
        single-chip MXU-rate effect."""
        import dataclasses

        from orbit2_tpu.parallel.sharding import shard_params
        from orbit2_tpu.utils.quantize import quantize_params

        if quant != "w8a8":
            raise ValueError(f"unknown quant mode {quant!r} (none | w8a8)")
        if not hasattr(phase_model, "quant"):
            raise ValueError(
                f"preset {self.cfg.model.preset!r} has no quantized serving "
                "path (w8a8 is wired for the ViT family)")
        qmodel = dataclasses.replace(phase_model, quant="w8a8")
        in_shape, _ = data_module.get_data_dims()
        in_vars, out_vars = data_module.get_data_variables()
        dummy = jnp.zeros((2,) + tuple(in_shape[1:]), jnp.float32)
        qparams = quantize_params(qmodel, params, dummy, in_vars, out_vars)
        log.info("quantized trunk to w8a8 (int8 kernels + fp32 scales)")
        return qmodel, shard_params(qparams, self.mesh)

    def _save(self, epoch: int):
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        path = os.path.join(self.checkpoint_dir, f"epoch_{epoch}")
        # async: the Orbax write overlaps the next epoch's compute; pruning
        # keeps the newest keep_last_checkpoints (0 = keep all)
        state = {
            "params": self.params, "opt_state": self.opt_state, "epoch": epoch,
        }
        if self.aux:
            state["aux"] = self.aux
        ckpt.save_checkpoint(path, state, async_save=self.async_checkpoints)
        if self.keep_last_checkpoints:
            ckpt.prune_checkpoints(self.checkpoint_dir, self.keep_last_checkpoints,
                                   current_epoch=epoch)
