#!/usr/bin/env python
"""Round-3 measurement: Winograd F(2^3,3^3) vs decomp2d on the real chip.

VERDICT round 2 item 1: measure, don't argue. Cases at the level-0 BraTS
workhorse shape (the conv family that owns the 45-48 ms conv floor):

  A. decomp2d (shipping default)
  B. XLA conv3d
  C. winograd_xla, f32 transforms (exactness-first)
  D. winograd_xla, bf16 transforms (speed-first)
  E. decomp2d-3C: the three depth taps as ONE 2D conv over a channel concat
     (K=3C matmul, single f32 accumulation)

Usage: python tools/microbench_winograd.py [a|b|all]  (group by shape to bound
compile time). Completion barrier is a host transfer (tunnel rule).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.ops.conv3d import conv3d_decomp2d, conv3d_xla
from unet3d_tpu.ops.winograd import winograd_conv3d_xla, winograd_conv3d_xla_bf16


def bench(fn, *args, iters=10, name=""):
    fn = jax.jit(fn)
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name:55s} {dt:8.2f} ms   (compile {compile_s:.0f}s)", flush=True)
    return dt


def gradfn(f):
    def loss(x, w):
        return jnp.sum(f(x, w).astype(jnp.float32))
    return jax.grad(loss, argnums=(0, 1))


def conv3d_decomp2d_3c(x, w):
    """Three depth taps as one K=3C 2D conv over a channel concat."""
    n, d, h, wd, c = x.shape
    kd = w.shape[0]
    r = kd // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0), (0, 0)))
    slabs = [jax.lax.slice_in_dim(xp, dz, dz + d, axis=1).reshape(n * d, h, wd, c)
             for dz in range(kd)]
    big = jnp.concatenate(slabs, axis=-1)                    # (N*D, H, W, 3C)
    wbig = w.transpose(1, 2, 0, 3, 4).reshape(w.shape[1], w.shape[2],
                                              kd * c, w.shape[4])
    y = jax.lax.conv_general_dilated(
        big, wbig, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y.reshape(n, d, h, wd, -1)


CASES = {
    "a": ("level0 64ch@128^3", (1, 128, 128, 128, 64), 64),
    "b": ("decoder-concat 128ch@128^3 -> 64", (1, 128, 128, 128, 128), 64),
    "c": ("level1 96ch@64^3", (1, 64, 64, 64, 96), 96),
}


def run_case(label, xshape, cout):
    print(f"== {label} ==", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*xshape), jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, 3, xshape[-1], cout) - 0.5, jnp.bfloat16)
    small = int(np.prod(xshape)) <= 64 ** 3 * 128
    candidates = [
        ("decomp2d", conv3d_decomp2d),
        ("xla conv3d", lambda x, w: conv3d_xla(x, w, (1, 1, 1), "SAME")),
        ("decomp2d-3C single conv", conv3d_decomp2d_3c),
        ("winograd bf16-transforms", winograd_conv3d_xla_bf16),
    ]
    if small:
        # the f32 transform domain is 8x data in f32 = 16x input bytes;
        # at 128^3x64 it provably OOMs a 16 GB chip (measured) — only
        # measurable at level-1 scale
        candidates.append(("winograd f32-transforms", winograd_conv3d_xla))
    results = {}
    for mode, wrap in (("fwd ", lambda f: f), ("f+b ", gradfn)):
        for name, fn in candidates:
            try:
                results[mode + name] = bench(wrap(fn), x, w,
                                             name=f"{mode} {name}")
            except Exception as e:  # noqa: BLE001 - record and continue
                msg = str(e).split("\n")[0][:110]
                print(f"  {mode} {name:50s} FAILED: {msg}", flush=True)
    return results


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "a"
    print(f"devices: {jax.devices()}", flush=True)
    keys = CASES.keys() if which == "all" else [which]
    for k in keys:
        label, xshape, cout = CASES[k]
        run_case(label, xshape, cout)
