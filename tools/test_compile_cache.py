#!/usr/bin/env python
"""Probe JAX's persistent compilation cache through the remote-compile path.

First compiles of each (model, shape) cost 20-60 s here (CLAUDE.md); if the
serialized-executable cache works on this backend, a second process reuses it
and CLI restarts / CV-fold recursions skip recompiling the train step.

Usage: python tools/test_compile_cache.py /tmp/jax_cache   (run twice)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_cache"
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, make_train_step

    size = 128
    strides = [[1, 1, 1]] + [[2, 2, 2]] * 5
    t0 = time.perf_counter()
    model = create_model(
        "DynUNet", in_channels=4, out_channels=3, spatial_dims=3,
        strides=strides, filters=[64, 96, 128, 192, 256, 384],
        kernel_size=[[3, 3, 3]] * 6,
        upsample_kernel_size=strides[1:], deep_supervision=False)
    variables = init_params(model, (size, size, size, 4))
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    tx = build_optimizer("Adam", lr=1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(model, DiceLoss(sigmoid=True), tx, amp=True)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 4, size, size, size), jnp.float32)
    labels = jnp.asarray((rng.rand(1, 3, size, size, size) > 0.5)
                         .astype(np.float32))
    t0 = time.perf_counter()
    state, loss = step(state, images, labels)
    float(loss)
    print(f"first step (compile+run): {time.perf_counter() - t0:.1f}s",
          flush=True)
    n_files = sum(len(fs) for _, _, fs in os.walk(cache_dir))
    print(f"cache entries under {cache_dir}: {n_files}", flush=True)


if __name__ == "__main__":
    main()
