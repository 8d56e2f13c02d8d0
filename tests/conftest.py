"""Test harness config: run JAX on 8 virtual CPU devices.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): all sharding/collective code paths compile and execute on a
virtual 8-device host mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The ambient TPU plugin overrides JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules dominated by torch-oracle parity or end-to-end pipeline runs (the
# suite's wall-time tail). The default `pytest tests/` still runs everything;
# the developer loop uses `-m "not slow"` (<15 min) — see CLAUDE.md.
SLOW_MODULES = {
    "test_beit_upernet", "test_swin_upernet", "test_convnext_upernet",
    "test_dpt", "test_segformer", "test_mobile_seg", "test_mobilevitv2",
    "test_smp_extra", "test_manet_pan", "test_smp_manifest", "test_models",
    "test_hf_trainer_smoke", "test_train_e2e", "test_metadata_train",
    "test_zone_e2e", "test_zone_batch", "test_zone_hf_model",
    "test_zone_smp_archs", "test_zone_multichip", "test_multihost",
    "test_remat_accum", "test_dry_dock", "test_tv_encoders", "test_senet",
    "test_xception", "test_mit", "test_dpn", "test_inception",
    "test_timm_en", "test_resnest", "test_res2net", "test_timm_mnv3",
    "test_sknet", "test_regnet", "test_gernet", "test_resnext_wsl",
    "test_mobileone", "test_sharding", "test_pretrained_init",
    "test_model_census", "test_hf_pretrained_init",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(2022)
