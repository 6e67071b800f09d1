#!/usr/bin/env python
"""Op-level TPU probe: Pallas s2-wgrad kernel vs XLA's rhs-dilated wgrad.

Times the bare weight-gradient op at the two stride-2 shapes that matter in
the BraTS 128^3 DynUNet step (levels 0->1 and 1->2). Methodology per
tools/microbench_r4.py: lax.scan of ITERS dependent iterations inside one
jit, scalar-only host transfer.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 8
_PADS = ((1, 1), (1, 1), (1, 1))
_DN = ("NDHWC", "DHWIO", "NDHWC")


def time_scalar(jfn, *args, reps=3):
    float(jfn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def wgrad_xla(x, g):
    co = g.shape[-1]
    def loss(w):
        y = lax.conv_general_dilated(x, w, (2, 2, 2), _PADS,
                                     dimension_numbers=_DN,
                                     preferred_element_type=x.dtype)
        return jnp.sum((y.astype(jnp.float32)) * g.astype(jnp.float32))
    w0 = jnp.zeros((3, 3, 3, x.shape[-1], co), x.dtype)
    return jax.grad(loss)(w0)


def main():
    from unet3d_tpu.ops.pallas.s2_wgrad_kernel import s2_wgrad_pallas
    from unet3d_tpu.train.step import tpu_compiler_options
    opts = tpu_compiler_options()
    print("devices:", jax.devices(), "opts:", opts, flush=True)
    for name, D, ci, co in [("L0 128^3 64->96 ", 128, 64, 96),
                            ("L1  64^3 96->128", 64, 96, 128)]:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, D, D, D, ci), jnp.bfloat16)
        g = jnp.asarray(rng.rand(1, D // 2, D // 2, D // 2, co), jnp.bfloat16)
        flops = 2 * 27 * ci * co * (D // 2) ** 3

        def harness(fn):
            @partial(jax.jit, compiler_options=opts)
            def run(x, g):
                def body(acc, i):
                    dw = fn(x * (1 + i * 1e-6).astype(x.dtype), g)
                    return acc + jnp.sum(dw.astype(jnp.float32)), None
                acc, _ = lax.scan(body, jnp.float32(0),
                                  jnp.arange(ITERS, dtype=jnp.float32))
                return acc
            return run

        ref = np.asarray(wgrad_xla(x, g), np.float32)
        got = np.asarray(
            jax.jit(s2_wgrad_pallas, compiler_options=opts)(x, g), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"{name} rel err {err:.2e}", flush=True)

        for label, fn in [("xla   ", wgrad_xla), ("pallas", s2_wgrad_pallas)]:
            t = time_scalar(harness(fn), x, g)
            print(f"{name} {label} {t:6.2f} ms ({flops/t/1e9:6.1f} TF/s)",
                  flush=True)


if __name__ == "__main__":
    main()
