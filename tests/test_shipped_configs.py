"""Every YAML under configs/ must parse through the validated schema.

The reference ships unvalidated YAML (its examples read raw dicts); we
validate on load (orbit2_tpu/config.py), so this test is the drift guard
that keeps the shipped matrix (8m/117m/1b/10b/fine-tune/inference/forecast)
loadable — a schema change that orphans a shipped config fails here, not in
a user's launch script.
"""

import glob
import os

import pytest

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_shipped_config_loads(path):
    from orbit2_tpu.config import load_config

    cfg = load_config(path)
    # cheap cross-field invariants that every shipped config must satisfy
    assert cfg.trainer.batch_size >= 1
    assert cfg.trainer.task in (
        "downscaling", "forecasting", "continuous-forecasting")
    for key in cfg.data.low_res_dir:
        assert key in cfg.data.dict_in_variables
        assert key in cfg.data.spatial_resolution


def test_config_dir_not_empty():
    assert len(CONFIGS) >= 7, CONFIGS
