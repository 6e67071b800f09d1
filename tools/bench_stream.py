#!/usr/bin/env python
"""Measure the chip's achievable HBM STREAM bandwidth (VERDICT r4 item 3).

The round-1..4 roofline used the 250 GB/s effective COPY ceiling as the
denominator; fusions were observed at 300-700 GB/s, i.e. the copy ceiling
understates what a streaming op can achieve and therefore overstates how
"saturated" an op is. This measures the real ceilings with STREAM-style
kernels (scale: y = a*y reads+writes 1 buffer/iter; triad: y = a*y + x reads
2 writes 1), iterated inside one jitted lax.fori_loop so dispatch overhead
amortizes, synced by a scalar host transfer (the only reliable barrier
through the axon tunnel — CLAUDE.md).

Public v5e spec: 819 GB/s HBM. Whatever fraction of that the STREAM kernels
reach on this chip is the honest per-op ceiling for the roofline report
(tools/roofline_report.py --stream_gbps).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

ITERS = 64


def _bench(fn, x, traffic_per_iter: float, warmup: int = 1, reps: int = 3):
    for _ in range(warmup):
        y = fn(x)
        float(y.ravel()[0])  # host-transfer sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn(x)
        float(y.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return traffic_per_iter * ITERS / best / 1e9


def main():
    results = {}
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        n = 64 * 1024 * 1024  # elements; 256 MB f32 / 128 MB bf16
        nbytes = n * jnp.dtype(dtype).itemsize
        x = jnp.arange(n, dtype=jnp.float32).astype(dtype).reshape(8192, -1)

        @jax.jit
        def scale(x):
            # y = 1.000001*y each iter: read + write one buffer
            return jax.lax.fori_loop(0, ITERS, lambda i, y: y * 1.000001, x)

        @jax.jit
        def triad(x):
            # y = 0.999*y + x: read 2 buffers, write 1
            return jax.lax.fori_loop(0, ITERS,
                                     lambda i, y: y * 0.999 + x, x)

        results[f"scale_{name}_gbps"] = round(_bench(scale, x, 2 * nbytes), 1)
        results[f"triad_{name}_gbps"] = round(_bench(triad, x, 3 * nbytes), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
