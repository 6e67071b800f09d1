#!/usr/bin/env python
"""Serving-artifact latency: exported StableHLO flagship vs in-process jit.

Exports the BraTS DynUNet (bf16 AMP, sigmoid folded) at 128^3, loads the
artifact back, and times a batch-1 forward through `ExportedModel.__call__`
against the same forward through make_forward's jit. Run via nohup (one TPU
process at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.predict.export import (export_forward, load_exported,
                                           save_exported)

    size = 128
    strides = [[1, 1, 1]] + [[2, 2, 2]] * 5
    model = create_model(
        "DynUNet", in_channels=4, out_channels=3, spatial_dims=3,
        strides=strides, filters=[64, 96, 128, 192, 256, 384],
        kernel_size=[[3, 3, 3]] * 6,
        upsample_kernel_size=strides[1:], deep_supervision=False)
    variables = init_params(model, (size, size, size, 4))

    t0 = time.perf_counter()
    exported = export_forward(model, variables, (size, size, size, 4),
                              amp=True, activation="sigmoid")
    path = "/tmp/flagship.u3dexp"
    save_exported(exported, path)
    print(f"export+save: {time.perf_counter() - t0:.1f}s "
          f"({os.path.getsize(path) / 1e6:.1f} MB)", flush=True)

    import jax.numpy as jnp2

    served = load_exported(path)
    rng = np.random.RandomState(0)
    x = rng.rand(1, 4, size, size, size).astype(np.float32)
    t0 = time.perf_counter()
    out = np.asarray(served(x))  # includes device compile of the artifact
    print(f"first served call (compile): {time.perf_counter() - t0:.1f}s "
          f"out={out.shape}", flush=True)
    n = 10
    xd = jnp2.asarray(x)  # input staged on device: isolate program time
    t0 = time.perf_counter()
    for _ in range(n):
        # scalar-sum sync: full-volume host readback through this tunnel is
        # ~1.7 s of pure transfer and would swamp the device time
        float(jnp2.sum(served(xd)))
    served_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"served artifact forward: {served_ms:.1f} ms/case "
          f"(device time, scalar sync)", flush=True)

    # in-process comparison: the predict path's jitted forward
    import jax.numpy as jnp
    from unet3d_tpu.predict.volumetric import apply_activation, make_forward
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, to_ndhwc
    state = create_train_state(variables, build_optimizer("Adam"))
    forward = make_forward(model, state, amp=True)
    xj = to_ndhwc(jnp.asarray(x))
    run = lambda: apply_activation(forward(xj).astype(jnp.float32), "sigmoid")
    out2 = np.asarray(run())
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(run()))
    direct_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"in-process jit forward:  {direct_ms:.1f} ms/case "
          f"(device time, scalar sync)", flush=True)
    err = float(np.max(np.abs(out - np.moveaxis(out2[0], -1, 0)[None])))
    print(f"max |served - direct| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
