#!/usr/bin/env python
"""Sweep XLA TPU compiler options on the headline train step.

XLA's fusion decisions at the 130 ms/step plateau are shaped by the scoped
VMEM budget (bigger budget -> larger fusions -> fewer HBM round-trips for the
norm/activation chains the profiler shows at 1.5-2x off roofline). Options are
passed per-compile via ``compiled = jit(f).lower(...).compile(options)`` so
they survive the remote-compile path (XLA_FLAGS on the client does not).

Run via nohup (one TPU process at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, train_step_body

    size = 128
    strides = [[1, 1, 1]] + [[2, 2, 2]] * 5
    model = create_model(
        "DynUNet", in_channels=4, out_channels=3, spatial_dims=3,
        strides=strides, filters=[64, 96, 128, 192, 256, 384],
        kernel_size=[[3, 3, 3]] * 6,
        upsample_kernel_size=strides[1:], deep_supervision=False)
    variables = init_params(model, (size, size, size, 4))
    tx = build_optimizer("Adam", lr=1e-3)
    criterion = DiceLoss(sigmoid=True, include_background=True)
    state = create_train_state(variables, tx)
    body = train_step_body(model, criterion, tx, amp=True)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 4, size, size, size), jnp.float32)
    labels = jnp.asarray((rng.rand(1, 3, size, size, size) > 0.5)
                         .astype(np.float32))
    return body, state, images, labels


def main():
    import jax

    body, state0, images, labels = build()
    lowered = jax.jit(body, donate_argnums=(0,)).lower(state0, images, labels)

    BASE = {"xla_tpu_scoped_vmem_limit_kib": "32768"}  # adopted round-2 default
    candidates = [
        ("base(vmem32M)", BASE),
        ("+rwb-fusion-off", {**BASE, "xla_tpu_rwb_fusion": "false"}),
        ("+no-dot-strength-red", {**BASE, "xla_tpu_enable_dot_strength_reduction": "false"}),
        ("+aggressive-opt-barrier", {**BASE, "xla_tpu_enable_flash_attention": "false"}),
        ("+async-sort", {**BASE, "xla_tpu_enable_async_copies": "true"}),
        ("+vector-fusion-wide", {**BASE, "xla_tpu_vector_load_fusion_window": "2048",
                                 "xla_tpu_vector_store_fusion_window": "512"}),
        ("+bundle-cost-model", {**BASE, "xla_tpu_use_bundle_aware_cost_model": "true"}),
        ("+licm-inflate", {**BASE, "xla_tpu_licm_size_inflation_ratio": "2.0"}),
    ]
    import jax.numpy as jnp
    for name, opts in candidates:
        try:
            t0 = time.perf_counter()
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
            compile_s = time.perf_counter() - t0
            # fresh copy per candidate: the step donates its state argument
            state = jax.tree_util.tree_map(jnp.copy, state0)
            state, loss = compiled(state, images, labels)
            float(loss)
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                state, loss = compiled(state, images, labels)
            float(loss)
            dt = (time.perf_counter() - t0) / n * 1e3
            print(f"{name}: {dt:.1f} ms/step (compile {compile_s:.0f}s)",
                  flush=True)
            del compiled, state
        except Exception as error:
            print(f"{name}: FAILED {type(error).__name__}: "
                  f"{str(error)[:200]}", flush=True)


if __name__ == "__main__":
    main()
