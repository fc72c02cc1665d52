"""Persistent XLA compilation cache (orbit2_tpu/utils/compile_cache.py).

No reference analogue (torch eager has no compile step); here a cold 1B
compile costs minutes, so cache hits are a first-class production feature.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from orbit2_tpu.utils import compile_cache as cc


@pytest.fixture(autouse=True)
def _reset_cache_config():
    yield
    # leave no global cache config behind for other tests
    jax.config.update("jax_compilation_cache_dir", None)
    cc._enabled_dir = None


def test_enable_populates_cache_dir(tmp_path):
    d = str(tmp_path / "jaxcache")
    assert cc.enable_compilation_cache(d, min_compile_seconds=0.0)
    assert cc.cache_dir() == d

    @jax.jit
    def f(x):
        return x @ x.T + jnp.tanh(x).sum()

    f(jnp.ones((32, 32), jnp.float32)).block_until_ready()
    entries = os.listdir(d)
    assert entries, "compilation cache directory stayed empty after a jit"


def test_env_var_wins_over_config(tmp_path, monkeypatch):
    from orbit2_tpu.config import load_config

    env_dir = str(tmp_path / "env_cache")
    cfg_dir = str(tmp_path / "cfg_cache")
    cfg = load_config({"trainer": {"compilation_cache": cfg_dir}})
    monkeypatch.setenv("ORBIT2_COMPILATION_CACHE", env_dir)
    assert cc.maybe_enable_from_config(cfg.trainer) == env_dir

    monkeypatch.delenv("ORBIT2_COMPILATION_CACHE")
    assert cc.maybe_enable_from_config(cfg.trainer) == cfg_dir


def test_disabled_by_default():
    from orbit2_tpu.config import load_config

    cfg = load_config({})
    assert cfg.trainer.compilation_cache is None
    assert cc.maybe_enable_from_config(cfg.trainer) is None


def test_trainer_wires_cache(tmp_path, synth_dataset):
    """Constructing a Trainer from a config with trainer.compilation_cache
    activates the cache (the driver-visible wiring, trainer.py __init__)."""
    from orbit2_tpu.config import load_config
    from orbit2_tpu.training.trainer import Trainer

    ds = synth_dataset
    d = str(tmp_path / "trainer_cache")
    cfg = load_config({
        "trainer": {"compilation_cache": d, "num_workers": 0,
                    "data_type": "float32", "remat": False},
        "tiling": {"do_tiling": False},
        "model": {"preset": "res_slimvit", "superres_mag": 4,
                  "patch_size": 2, "embed_dim": 32, "depth": 1,
                  "decoder_depth": 1, "num_heads": 2,
                  "attention_impl": "xla"},
        "data": {
            "low_res_dir": {"SYNTH": ds["low"]},
            "high_res_dir": {"SYNTH": ds["high"]},
            "spatial_resolution": {"SYNTH": 625},
            "default_vars": list(ds["in_vars"]),
            "dict_in_variables": {"SYNTH": list(ds["in_vars"])},
            "dict_out_variables": {"SYNTH": list(ds["out_vars"])},
        },
    })
    Trainer(cfg, checkpoint_dir=str(tmp_path / "ck"))
    assert cc.cache_dir() == d
    assert os.path.isdir(d)
