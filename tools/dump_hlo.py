#!/usr/bin/env python
"""Dump the optimized HLO of the benchmark train step (for correlating
profiler fusion names with source ops). Writes /tmp/train_step_hlo.txt."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, make_train_step

    size = int(os.environ.get("PROF_SIZE", "128"))
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
    step = make_train_step(model, criterion, tx, amp=True)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 4, size, size, size), jnp.float32)
    labels = jnp.asarray((rng.rand(1, 3, size, size, size) > 0.5).astype(np.float32))
    compiled = step.lower(state, images, labels).compile()
    text = compiled.as_text()
    out = os.environ.get("HLO_OUT", "/tmp/train_step_hlo.txt")
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}: {len(text)} bytes", flush=True)
    try:
        print(compiled.cost_analysis())
    except Exception as e:
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
