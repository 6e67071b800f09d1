#!/usr/bin/env python
"""Whole-case sliding-window inference benchmark (BraTS-scale case).

240x240x160 case, 128^3 ROI, overlap 0.5, gaussian blending — the round-1
headline (0.92 s/case f32). Measures f32 vs bf16 (amp) forwards and the 4x
flip TTA variant. Run via nohup (one TPU process at a time)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import numpy as np
    import optax

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.predict.sliding_window import SlidingWindowInferer
    from unet3d_tpu.predict.volumetric import make_forward
    from unet3d_tpu.train.step import create_train_state

    strides = [[1, 1, 1]] + [[2, 2, 2]] * 5
    model = create_model(
        "DynUNet", in_channels=4, out_channels=3, spatial_dims=3,
        strides=strides, filters=[64, 96, 128, 192, 256, 384],
        kernel_size=[[3, 3, 3]] * 6,
        upsample_kernel_size=strides[1:], deep_supervision=False)
    variables = init_params(model, (128, 128, 128, 4))
    state = create_train_state(variables, optax.adam(1e-3))

    rng = np.random.RandomState(0)
    case = jnp.asarray(rng.rand(1, 240, 240, 160, 4), jnp.float32)

    for label, kwargs in [("f32", {}), ("bf16 amp", {"amp": True})]:
        fwd = make_forward(model, state, **kwargs)
        inferer = SlidingWindowInferer(roi_size=(128, 128, 128), overlap=0.5,
                                       mode="gaussian")
        out = inferer(case, fwd)
        float(jnp.sum(out))  # compile + barrier
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = inferer(case, fwd)
        float(jnp.sum(out))
        print(f"whole-case {label}: {(time.perf_counter() - t0) / n:.3f} s/case",
              flush=True)

    # sw_batch_size sweep (bf16): stacking windows into one forward helps when
    # single windows under-fill the chip; at 128^3 the MXU is already saturated
    fwd = make_forward(model, state, amp=True)
    for sw in (2, 4):
        inferer = SlidingWindowInferer(roi_size=(128, 128, 128), overlap=0.5,
                                       mode="gaussian", sw_batch_size=sw)
        try:
            out = inferer(case, fwd)
            float(jnp.sum(out))
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                out = inferer(case, fwd)
            float(jnp.sum(out))
            print(f"whole-case bf16 sw_batch_size={sw}: "
                  f"{(time.perf_counter() - t0) / n:.3f} s/case", flush=True)
        except Exception as error:
            print(f"whole-case bf16 sw_batch_size={sw}: failed ({error})",
                  flush=True)

    # smaller 64^3 ROI where window stacking should pay (MONAI's use case)
    for sw in (1, 4):
        inferer = SlidingWindowInferer(roi_size=(64, 64, 64), overlap=0.5,
                                       mode="gaussian", sw_batch_size=sw)
        out = inferer(case, fwd)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = inferer(case, fwd)
        float(jnp.sum(out))
        print(f"whole-case bf16 roi=64 sw_batch_size={sw}: "
              f"{(time.perf_counter() - t0) / n:.3f} s/case", flush=True)

    # flip TTA (4 flips) in bf16
    from unet3d_tpu.predict.volumetric import predictions_with_tta
    inferer = SlidingWindowInferer(roi_size=(128, 128, 128), overlap=0.5,
                                   mode="gaussian")
    fwd = make_forward(model, state, amp=True)
    out = predictions_with_tta(model, state, case, inferer=inferer, forward=fwd)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(3):
        out = predictions_with_tta(model, state, case, inferer=inferer,
                                   forward=fwd)
    float(jnp.sum(out))
    print(f"whole-case bf16 + 4x flip TTA: {(time.perf_counter() - t0) / 3:.3f}"
          " s/case", flush=True)


if __name__ == "__main__":
    main()
