#!/usr/bin/env python
"""Op-level economics of the fused affine+lrelu+conv Pallas block kernel
(VERDICT r4 item 3): vs the XLA formulation that materializes the normalized
activation. Run on the real TPU; results recorded in PERF.md.

Sites: DynUNet level-0 conv2 (C=64, the 128-lane padding-tax case) and the
upsample4 conv_block conv1 shape (C=128, no padding tax — the kernel's best
case). Timing barrier: scalar host transfer (CLAUDE.md: block_until_ready
returns early through the axon tunnel).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from unet3d_tpu.ops.pallas.block_kernel import pallas_block_conv3d  # noqa: E402


def bench(fn, *args, iters=10, reps=3):
    """Dispatch `iters` async calls back-to-back, sync once (the repo's
    microbench pattern — per-call sync pays the tunnel latency per call)."""
    y = fn(*args)
    float(jnp.sum(y.astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        float(jnp.sum(y.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    results = {}
    for cin, tag in ((64, "level0_C64"), (128, "upsample4_C128")):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 128, 128, 128, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, cin, 64) * 0.05, jnp.bfloat16)
        scale = jnp.asarray(rng.rand(cin) + 0.5, jnp.float32)
        shift = jnp.asarray(rng.randn(cin) * 0.3, jnp.float32)

        @jax.jit
        def xla_separate(x, w, scale, shift):
            z = x.astype(jnp.float32) * scale + shift
            z = jnp.where(z >= 0, z, z * 0.01).astype(jnp.bfloat16)
            return jax.lax.conv_general_dilated(
                z, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        t_xla = bench(xla_separate, x, w, scale, shift)
        t_pallas = bench(pallas_block_conv3d, x, w, scale, shift)
        results[tag] = {"xla_ms": round(t_xla, 2),
                        "pallas_fused_ms": round(t_pallas, 2)}
        print(tag, results[tag], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
