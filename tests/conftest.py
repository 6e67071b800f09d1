"""Test harness: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh — the TPU-world answer to
"test multi-node without a cluster" (SURVEY.md §4). XLA_FLAGS must be set before
backends initialize; the jax.config update is needed as well because the
environment's TPU site-hook re-registers its platform over JAX_PLATFORMS.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Fast/slow tiers (VERDICT r3 item 8): the full suite takes ~70 min cold on
# CPU; `pytest -m "not slow"` selects a <5-min iteration tier. Files listed
# here are auto-marked slow from measured per-file durations
# (/tmp/pytest_full_r4 run: each >= ~25 s, dominated by XLA compiles);
# individual tests can also self-mark with @pytest.mark.slow.
_SLOW_FILES = {
    "test_model_zoo.py", "test_monai_tail.py", "test_parallel.py",
    "test_end_to_end.py", "test_models.py", "test_registration.py",
    "test_parity_swin_unetr.py", "test_winograd.py", "test_dints_search.py",
    "test_regunet.py", "test_sppin_process.py", "test_scipy_goldens.py",
    "test_transforms.py", "test_sliding_window.py", "test_parity_regunet.py",
    "test_parity_dints.py", "test_train_golden.py", "test_validation.py",
    "test_parity_zoo.py", "test_pipeline_golden.py",
    "test_parity_reference.py", "test_collectives.py", "test_convergence.py",
    "test_grad_accum.py", "test_export.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
