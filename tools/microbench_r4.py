#!/usr/bin/env python
"""Round-2 microbench batch 4: input-layout transpose cost in context.

Measures the full train step (a) as shipped — NCDHW host batches transposed
to NDHWC inside the jitted step — vs (b) a variant fed NDHWC directly with
the transposes removed. Decides whether the loader should emit NDHWC.
Run via nohup (one TPU process at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import (TrainState, compute_criterion,
                                       create_train_state, make_train_step,
                                       tpu_compiler_options)

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
    images = jnp.asarray(rng.rand(1, 4, size, size, size), jnp.float32)
    labels = jnp.asarray((rng.rand(1, 3, size, size, size) > 0.5)
                         .astype(np.float32))

    def time_step(step, state, x, y, n=10):
        state, loss = step(state, x, y)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state, x, y)
        float(loss)
        return (time.perf_counter() - t0) / n * 1e3

    import jax as _jax
    fresh = lambda: _jax.tree_util.tree_map(jnp.copy, variables)

    # (a) as shipped — fresh param copies per variant: the step donates state
    state = create_train_state(fresh(), tx)
    step = make_train_step(model, criterion, tx, amp=True)
    print(f"as-shipped (NCDHW in, transpose in-jit): "
          f"{time_step(step, state, images, labels):.1f} ms/step", flush=True)

    # (b) NDHWC end-to-end, no transposes in the step
    def train_step_ndhwc(state: TrainState, x, y):
        rng_, dropout_rng, sample_rng = jax.random.split(state.rng, 3)
        x = x.astype(jnp.bfloat16)

        def loss_fn(params):
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
            out = model.apply({"params": p}, x, True,
                              rngs={"dropout": dropout_rng,
                                    "sample": sample_rng})
            return compute_criterion(criterion, out, y), {}

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, opt_state=new_opt, rng=rng_,
                             step=state.step + 1), loss

    state = create_train_state(fresh(), tx)
    step_b = jax.jit(train_step_ndhwc, donate_argnums=(0,),
                     compiler_options=tpu_compiler_options())
    x_t = jnp.transpose(images, (0, 2, 3, 4, 1))
    y_t = jnp.transpose(labels, (0, 2, 3, 4, 1))
    print(f"NDHWC end-to-end (no in-jit transpose): "
          f"{time_step(step_b, state, x_t, y_t):.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
