"""Opt-in persistent XLA compilation cache.

``UNET3D_TPU_COMPILE_CACHE=<dir>`` enables JAX's serialized-executable cache
for the CLIs, so repeated runs (CV fold recursion, resume, predict after
train) skip recompiling already-seen (program, shape) pairs.

Off by default: measured through this workspace's remote-compile tunnel
(tools/test_compile_cache.py), the cache is a large net win for the many
small programs (model init: 205 s cold -> 11.8 s warm) but *loading* the
serialized 128^3 train-step executable took 1195 s vs 321 s compiling cold —
deserialization through the tunnel is pathological for big programs. On a
real TPU VM (local libtpu compile) the cache is the standard practice; enable
it there.
"""
from __future__ import annotations

import os


def maybe_enable_compile_cache() -> bool:
    """Enable the persistent cache if UNET3D_TPU_COMPILE_CACHE names a dir."""
    cache_dir = os.environ.get("UNET3D_TPU_COMPILE_CACHE")
    if not cache_dir:
        return False
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
