"""Test harness: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh — the TPU-world answer to
"test multi-node without a cluster" (SURVEY.md §4). Must run before jax backends
initialize, hence top-level env mutation in conftest.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
