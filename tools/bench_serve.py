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

    import jax.numpy as jnp2

    rng = np.random.RandomState(0)
    x = rng.rand(1, 4, size, size, size).astype(np.float32)
    n = 10
    served_ms = {}
    out = None
    for layout in ("ncdhw", "ndhwc"):
        t0 = time.perf_counter()
        exported = export_forward(model, variables, (size, size, size, 4),
                                  amp=True, activation="sigmoid",
                                  entry_layout=layout)
        path = f"/tmp/flagship_{layout}.u3dexp"
        save_exported(exported, path)
        print(f"[{layout}] export+save: {time.perf_counter() - t0:.1f}s "
              f"({os.path.getsize(path) / 1e6:.1f} MB)", flush=True)

        served = load_exported(path)
        # ndhwc entry: the layout transpose happens host-side (numpy, free
        # relative to the tunnel) — the artifact program itself is
        # transpose-free
        xl = x if layout == "ncdhw" else np.moveaxis(x, 1, -1).copy()
        t0 = time.perf_counter()
        o = np.asarray(served(xl))  # includes device compile of the artifact
        out = o if layout == "ncdhw" else np.moveaxis(o, -1, 1)
        print(f"[{layout}] first served call (compile): "
              f"{time.perf_counter() - t0:.1f}s out={o.shape}", flush=True)
        xd = jnp2.asarray(xl)  # input staged on device: isolate program time
        # dispatch n calls back-to-back, sync ONCE with a scalar sum: per-call
        # sync would add one tunnel round-trip (~30-80 ms, varies by session)
        # to every iteration and measure the tunnel, not the device — the
        # round-4b 155-vs-109 ms "serving overhead" was exactly this artifact
        t0 = time.perf_counter()
        ys = [served(xd) for _ in range(n)]
        float(jnp2.sum(ys[-1]))
        served_ms[layout] = (time.perf_counter() - t0) / n * 1e3
        print(f"[{layout}] served artifact forward: "
              f"{served_ms[layout]:.1f} ms/case "
              f"(device time, batch-dispatch scalar sync)", flush=True)

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
    ys = [run() for _ in range(n)]
    float(jnp.sum(ys[-1]))
    direct_ms = (time.perf_counter() - t0) / n * 1e3
    print(f"in-process jit forward:  {direct_ms:.1f} ms/case "
          f"(device time, batch-dispatch scalar sync)", flush=True)
    err = float(np.max(np.abs(out - np.moveaxis(out2[0], -1, 0)[None])))
    print(f"max |served - direct| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
