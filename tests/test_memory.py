"""Memory telemetry + AOT memory planning (orbit2_tpu/utils/memory.py).

The reference's only memory tooling is runtime torch.cuda.memory_reserved
prints (intermediate_downscaling.py:514,546,746-747,772,793). The rebuild
mirrors that at epoch boundaries (JSONL, not stdout) and adds what XLA makes
possible: planning a config x mesh per-device footprint abstractly, with no
buffers and no chips.
"""

from types import SimpleNamespace

import pytest

from orbit2_tpu.config import (Config, ModelConfig, ParallelismConfig,
                               TrainerConfig)
from orbit2_tpu.utils.memory import (device_memory_stats, log_memory,
                                     plan_train_memory)


def test_device_memory_stats_graceful_without_allocator():
    # CPU backend: either no stats (None) or ints — never a crash
    s = device_memory_stats()
    assert s is None or all(isinstance(v, int) for v in s.values())


def test_device_memory_stats_maps_allocator_keys():
    fake = SimpleNamespace(memory_stats=lambda: {
        "bytes_in_use": 10, "peak_bytes_in_use": 20, "bytes_limit": 100,
        "num_allocs": 7})  # extra allocator keys are dropped
    assert device_memory_stats(fake) == {
        "bytes_in_use": 10, "peak_bytes_in_use": 20, "bytes_limit": 100}
    assert device_memory_stats(SimpleNamespace()) is None
    assert device_memory_stats(SimpleNamespace(memory_stats=lambda: None)) is None
    boom = SimpleNamespace(memory_stats=lambda: (_ for _ in ()).throw(RuntimeError))
    assert device_memory_stats(boom) is None


def test_log_memory_emits_one_record(monkeypatch):
    from orbit2_tpu.utils import memory as mem
    from orbit2_tpu.utils.logging import MetricsLogger

    monkeypatch.setattr(mem, "device_memory_stats",
                        lambda device=None: {"bytes_in_use": 5, "bytes_limit": 9})
    rec = log_memory(MetricsLogger(None, echo=False), epoch=3)
    assert rec["event"] == "memory" and rec["bytes_in_use"] == 5 \
        and rec["epoch"] == 3
    monkeypatch.setattr(mem, "device_memory_stats", lambda device=None: None)
    assert log_memory(MetricsLogger(None, echo=False)) is None


def _tiny_cfg(**trainer_kw):
    return Config(
        trainer=TrainerConfig(batch_size=8, remat=False, **trainer_kw),
        parallelism=ParallelismConfig(simple_ddp=1, fsdp=4, tensor_par=2),
        model=ModelConfig(embed_dim=64, depth=2, decoder_depth=1,
                          num_heads=2),
    )


def test_plan_train_memory_reports_sharded_layout():
    plan = plan_train_memory(_tiny_cfg(), img=(8, 16), in_channels=7,
                             out_channels=3, batch=8)
    assert plan["params"] > 0
    assert plan["mesh"] == {"stage": 1, "replica": 1, "fsdp": 4, "expert": 1,
                            "seq": 1, "tensor": 2}
    # fp32 master params shard over fsdp x tensor: per-device bytes must be
    # well under the replicated footprint (small norm/bias leaves replicate)
    assert 0 < plan["param_bytes_per_device"] < plan["params"] * 4
    # adamw default carries 2 fp32 moments, same layout
    assert plan["opt_bytes_per_device"] >= 2 * plan["param_bytes_per_device"] * 0.8
    assert plan["batch_bytes_per_device"] > 0
    assert plan["total_bytes_per_device"] >= plan["param_bytes_per_device"]


def test_plan_honors_moment_dtypes():
    fp32 = plan_train_memory(_tiny_cfg(), img=(8, 16), in_channels=7,
                             out_channels=3, batch=8)
    bf16 = plan_train_memory(
        _tiny_cfg(adam_mu_dtype="bfloat16", adam_nu_dtype="bfloat16"),
        img=(8, 16), in_channels=7, out_channels=3, batch=8)
    # both moments halve: optimizer bytes drop to ~50% (count leaf stays)
    assert bf16["opt_bytes_per_device"] < 0.6 * fp32["opt_bytes_per_device"]


def test_plan_rejects_conv_presets():
    cfg = _tiny_cfg()
    cfg.model.preset = "unet"
    with pytest.raises(NotImplementedError):
        plan_train_memory(cfg, img=(8, 16), in_channels=7, out_channels=3,
                          batch=8)
