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

jax.config.update("jax_platforms", "cpu")
