#!/usr/bin/env python
"""SPPIN-scale train-step benchmark: 192^3 volumes (examples/sppin config).

The SPPIN recipe trains DynUNet 4->1ch at 192^3, batch 2, bf16 AMP
(`examples/sppin/sppin_config.json`). 192^3 is 3.4x the voxels of the BraTS
128^3 patch; this measures batch 1 and 2, falling back to remat (jax
rematerialization trades FLOPs for HBM) if the plain step OOMs.
Run via nohup (one TPU process at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, make_train_step

    size = 192
    strides = [[1, 1, 1]] + [[2, 2, 2]] * 5
    rng = np.random.RandomState(0)

    kwargs = dict(
        in_channels=4, out_channels=1, spatial_dims=3,
        strides=strides, filters=[64, 96, 128, 192, 256, 384],
        kernel_size=[[3, 3, 3]] * 6,
        upsample_kernel_size=strides[1:], deep_supervision=False)
    for remat in (False, True):
        if remat:  # config path: training.remat wraps the class in nn.remat
            import flax.linen as nn
            from unet3d_tpu.models.registry import (_freeze_lists,
                                                    fetch_model_by_name)
            cls = fetch_model_by_name("DynUNet")
            frozen = {k: _freeze_lists(v) for k, v in kwargs.items()}
            model = nn.remat(cls, static_argnums=(2,))(**frozen)
        else:
            model = create_model("DynUNet", **kwargs)
        variables = init_params(model, (size, size, size, 4))
        tx = build_optimizer("Adam", lr=1e-3)
        criterion = DiceLoss(sigmoid=True, include_background=True)
        step = make_train_step(model, criterion, tx, amp=True)
        for batch in (1, 2):
            try:
                state = create_train_state(
                    __import__("jax").tree_util.tree_map(jnp.copy, variables), tx)
                images = jnp.asarray(rng.rand(batch, 4, size, size, size),
                                     jnp.float32)
                labels = jnp.asarray(
                    (rng.rand(batch, 1, size, size, size) > 0.5)
                    .astype(np.float32))
                state, loss = step(state, images, labels)
                float(loss)
                n = 5
                t0 = time.perf_counter()
                for _ in range(n):
                    state, loss = step(state, images, labels)
                float(loss)
                dt = (time.perf_counter() - t0) / n
                print(f"192^3 batch={batch} remat={remat}: {dt * 1e3:.1f} "
                      f"ms/step ({batch / dt:.2f} patches/sec)", flush=True)
                del state, images, labels
            except Exception as error:
                print(f"192^3 batch={batch} remat={remat}: failed "
                      f"{type(error).__name__}: {str(error)[:160]}", flush=True)
        if not remat:
            print("---", flush=True)


if __name__ == "__main__":
    main()
