#!/usr/bin/env python
"""In-context bisect of the three session rewrites (padall decomp2d, subpixel
custom vjp, bf16 loss) on the full BraTS train step. Env toggles are read at
trace time, so one process can compile every combination."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_and_time():
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
    state = create_train_state(variables, tx)
    step = make_train_step(model, criterion, tx, amp=True)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 4, size, size, size), jnp.float32)
    labels = jnp.asarray((rng.rand(1, 3, size, size, size) > 0.5).astype(np.float32))
    for _ in range(2):
        state, loss = step(state, images, labels)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss = step(state, images, labels)
    float(loss)
    return (time.perf_counter() - t0) / 5 * 1e3


COMBOS = [
    # (DECPAD, SUBPIX_VJP, LOSS_F32, label)
    ("d", "0", "1", "all-old (round start)"),
    ("hw", "0", "1", "padall only"),
    ("d", "1", "1", "subpix-vjp only"),
    ("d", "0", "0", "bf16-loss only"),
    ("hw", "1", "0", "all-new"),
]

if __name__ == "__main__":
    for decpad, vjp, f32, label in COMBOS:
        os.environ["UNET3D_TPU_DECPAD"] = decpad
        os.environ["UNET3D_TPU_SUBPIX_VJP"] = vjp
        os.environ["UNET3D_TPU_LOSS_F32"] = f32
        ms = build_and_time()
        print(f"{label:28s} {ms:7.1f} ms/step", flush=True)
