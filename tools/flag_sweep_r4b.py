#!/usr/bin/env python
"""Round-4b extended XLA TPU compiler-option sweep on the headline train step.

The round-2 sweep (tools/flag_sweep.py) covered fusion-shaping knobs; the only
mover was the scoped-VMEM budget (adopted). This sweep covers the categories it
never touched: memory-space assignment (prefetch aggressiveness), the
latency-hiding scheduler, and the conv input/output fusion toggles. Unknown
option names fail the compile and are reported as FAILED — that is signal too
(this XLA version's surface).

Also probes per-block remat at 128^3 (PERF.md only has the 160^3 number) to
complete the remat cost table.

Run via nohup (one TPU process at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = {"xla_tpu_scoped_vmem_limit_kib": "32768"}  # adopted default

CANDIDATES = [
    ("base(vmem32M)", BASE),
    ("+latency-hiding-sched", {**BASE, "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("+async-copy-bw-x4", {**BASE, "xla_tpu_async_copy_bandwidth_scaling_factor": "4.0"}),
    ("+async-copy-bw-x0.25", {**BASE, "xla_tpu_async_copy_bandwidth_scaling_factor": "0.25"}),
    ("+msa-use-ratio-0", {**BASE, "xla_tpu_msa_inefficient_use_to_copy_ratio": "0.0"}),
    ("+scavenge-vmem", {**BASE, "xla_tpu_scavenge_vmem_for_fusions": "true"}),
    ("+conv-input-fusion-off", {**BASE, "xla_jf_conv_input_fusion": "false"}),
    ("+conv-output-fusion-on", {**BASE, "xla_jf_conv_output_fusion": "true"}),
    ("+exp-fusion-cost-model", {**BASE, "xla_tpu_use_experimental_fusion_cost_model": "true"}),
    ("+vmem48M", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("+sliced-prefetch", {**BASE, "xla_tpu_enable_sliced_prefetch": "true"}),
    ("+alloc-scoped-same-offset", {**BASE, "xla_tpu_allocate_scoped_vmem_at_same_offset": "false"}),
]


def build(remat: bool):
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
        upsample_kernel_size=strides[1:], deep_supervision=False, remat=remat)
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


def run_one(lowered, state0, images, labels, name, opts):
    import jax
    import jax.numpy as jnp
    try:
        t0 = time.perf_counter()
        compiled = lowered.compile(compiler_options=opts)
        compile_s = time.perf_counter() - t0
        state = jax.tree_util.tree_map(jnp.copy, state0)
        state, loss = compiled(state, images, labels)
        float(loss)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = compiled(state, images, labels)
        float(loss)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {dt:.1f} ms/step (compile {compile_s:.0f}s)", flush=True)
        del compiled, state
        return dt
    except Exception as error:
        print(f"{name}: FAILED {type(error).__name__}: {str(error)[:200]}",
              flush=True)
        return None


def main():
    import jax

    body, state0, images, labels = build(remat=False)
    lowered = jax.jit(body, donate_argnums=(0,)).lower(state0, images, labels)
    for name, opts in CANDIDATES:
        run_one(lowered, state0, images, labels, name, opts)
    del lowered

    # per-block remat at 128^3 (completes the PERF.md remat table)
    body, state0, images, labels = build(remat=True)
    lowered = jax.jit(body, donate_argnums=(0,)).lower(state0, images, labels)
    run_one(lowered, state0, images, labels, "remat-per-block@128^3", BASE)


if __name__ == "__main__":
    main()
