"""Config schema validation tests (the reference parses YAML with raw dict
indexing and no validation, intermediate_downscaling.py:393-455)."""

import pytest

from orbit2_tpu.config import Config, ConfigError, load_config


def minimal(**overrides):
    raw = {
        "trainer": {"max_epochs": 4, "batch_size": 2},
        "parallelism": {"fsdp": 2, "simple_ddp": 1, "tensor_par": 2},
        "model": {"embed_dim": 64, "num_heads": 4},
        "data": {
            "low_res_dir": {"A": "/x"},
            "high_res_dir": {"A": "/y"},
            "spatial_resolution": {"A": 625},
            "default_vars": ["a", "b"],
            "dict_in_variables": {"A": ["a", "b"]},
            "dict_out_variables": {"A": ["b"]},
        },
    }
    for k, v in overrides.items():
        raw.setdefault(k, {}).update(v)
    return raw


def test_load_valid():
    cfg = load_config(minimal())
    assert cfg.parallelism.data_par == 2
    assert cfg.parallelism.world_size == 4
    assert cfg.tiling.effective_div == 1


def test_heads_divisible_by_tp():
    with pytest.raises(ConfigError):
        load_config(minimal(parallelism={"tensor_par": 3}))


def test_unknown_key_rejected():
    raw = minimal()
    raw["trainer"]["nonsense"] = 1
    with pytest.raises(ConfigError):
        load_config(raw)


def test_mismatched_dirs_rejected():
    raw = minimal()
    raw["data"]["high_res_dir"] = {"B": "/y"}
    with pytest.raises(ConfigError):
        load_config(raw)


def test_var_not_in_defaults_rejected():
    raw = minimal()
    raw["data"]["dict_in_variables"] = {"A": ["zz"]}
    with pytest.raises(ConfigError):
        load_config(raw)


def test_numeric_string_coercion():
    raw = minimal(model={"lr": "2e-3"})
    cfg = load_config(raw)
    assert cfg.model.lr == pytest.approx(2e-3)


def test_tiling_defaults_off():
    cfg = load_config(minimal(tiling={"do_tiling": False, "div": 4, "overlap": 3}))
    assert cfg.tiling.effective_div == 1
    assert cfg.tiling.effective_overlap == 0
    cfg2 = load_config(minimal(tiling={"do_tiling": True, "div": 4, "overlap": 3}))
    assert cfg2.tiling.effective_div == 4


def test_adam_mu_dtype_validation():
    from orbit2_tpu.config import ConfigError, load_config

    cfg = load_config({"trainer": {"adam_mu_dtype": "bfloat16"}})
    assert cfg.trainer.adam_mu_dtype == "bfloat16"
    with pytest.raises(ConfigError):
        load_config({"trainer": {"adam_mu_dtype": "fp8"}}).validate()
