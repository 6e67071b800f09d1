#!/usr/bin/env python
"""Headline benchmark: BraTS 128-cubed training throughput (patches/sec/chip).

Runs the flagship BraTS-2020 DynUNet topology (4 modalities -> 3 tumor regions,
6 levels, filters 64..384 — `examples/brats2020/brats2020_config.json` in the
reference) through the full jitted train step (forward + Dice loss + backward +
Adam update) in bf16 compute on the attached TPU chip, and prints ONE JSON line.

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
comparison constant below is an estimated throughput of the reference PyTorch
stack (MONAI DynUNet, channels-last AMP, batch 1-2) on a single A100 for this
exact workload: ~0.4 s/iteration => ~2.5 patches/sec. ``vs_baseline`` is
measured/A100-estimate; the BASELINE.json north star is >= 5.0.
"""
from __future__ import annotations

import json
import sys
import time

A100_REFERENCE_PATCHES_PER_SEC = 2.5  # documented estimate, see module docstring


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, make_train_step

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

    rng = np.random.RandomState(0)
    best = 0.0
    best_batch = 1
    # batch 1 is the reference's BraTS configuration; larger batches compile
    # slowly through the remote-compile path without improving per-chip
    # throughput materially at 128^3 (measured in round 1).
    for batch in (1,):
        try:
            state = create_train_state(variables, tx)
            step = make_train_step(model, criterion, tx, amp=True)
            images = jnp.asarray(rng.rand(batch, 4, size, size, size), jnp.float32)
            labels = jnp.asarray((rng.rand(batch, 3, size, size, size) > 0.5)
                                 .astype(np.float32))
            state, loss = step(state, images, labels)  # compile
            float(loss)  # host transfer is the only reliable completion barrier
            n_iters = 10
            t0 = time.perf_counter()
            for _ in range(n_iters):
                state, loss = step(state, images, labels)
            float(loss)  # sync once: steps chain through the donated state
            dt = (time.perf_counter() - t0) / n_iters
            throughput = batch / dt
            if throughput > best:
                best = throughput
                best_batch = batch
            print(f"# batch={batch}: {dt * 1e3:.1f} ms/step, "
                  f"{throughput:.2f} patches/sec", file=sys.stderr)
            del state, step, images, labels
        except Exception as error:  # OOM at larger batch: keep best so far
            print(f"# batch={batch} failed: {error}", file=sys.stderr)
            break

    print(json.dumps({
        "metric": f"BraTS 128^3 DynUNet train patches/sec/chip (bf16, batch={best_batch})",
        "value": round(best, 3),
        "unit": "patches/sec/chip",
        "vs_baseline": round(best / A100_REFERENCE_PATCHES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
