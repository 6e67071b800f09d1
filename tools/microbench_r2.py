#!/usr/bin/env python
"""Round-2 microbenchmarks: candidate rewrites for the profiled hot spots.

Each case times fwd and fwd+bwd (value_and_grad) on the real chip with a host
transfer as the completion barrier. Run one group via argv to bound compile
time: python tools/microbench_r2.py [head|s2|up|norm|all]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=10, name=""):
    fn = jax.jit(fn)
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name:55s} {dt:8.2f} ms", flush=True)
    return dt


def grad_version(f, x, w):
    """fwd+bwd closure: sum-of-output loss, grads wrt both inputs."""
    def loss(x, w):
        return jnp.sum(f(x, w).astype(jnp.float32))
    return jax.grad(loss, argnums=(0, 1))


def group_head():
    print("== output_block: 1x1x1 conv 64->3 @128^3 ==", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 128, 64), jnp.bfloat16)
    w = jnp.asarray(rng.rand(1, 1, 1, 64, 3), jnp.bfloat16)

    def conv_head(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)

    def dot_head(x, w):
        n, d, h, wd, c = x.shape
        y = jax.lax.dot_general(x.reshape(-1, c), w.reshape(c, -1),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=x.dtype)
        return y.reshape(n, d, h, wd, -1)

    def einsum_head(x, w):
        return jnp.einsum("ndhwc,co->ndhwo", x, w.reshape(w.shape[-2], -1))

    bench(conv_head, x, w, name="fwd conv1x1 (current)")
    bench(dot_head, x, w, name="fwd reshape+dot")
    bench(einsum_head, x, w, name="fwd einsum")
    bench(grad_version(conv_head, x, w), x, w, name="bwd conv1x1 (current)")
    bench(grad_version(dot_head, x, w), x, w, name="bwd reshape+dot")
    bench(grad_version(einsum_head, x, w), x, w, name="bwd einsum")


def group_s2():
    print("== downsample: k3 s2 conv 64->96 @128^3 ==", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 128, 64), jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, 3, 64, 96), jnp.bfloat16)

    def conv_s2(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2, 2), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)

    def s2d_conv(x, w):
        # space-to-depth: (1,128,128,128,64) -> (1,64,64,64,8*64), then the
        # s2 k3 conv becomes a k2 s1 VALID conv with a zero-embedded kernel.
        n, d, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))  # SAME halo
        d2, h2, w2 = (d + 2) // 2, (h + 2) // 2, (wd + 2) // 2
        xs = xp.reshape(n, d2, 2, h2, 2, w2, 2, c)
        xs = jnp.transpose(xs, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
            n, d2, h2, w2, 8 * c)
        # embed w (3,3,3,c,o) into (2,2,2,8c,o): tap (kd,kh,kw) lands in
        # s2d block (bd,bh,bw) offset (pd,ph,pw) with kd = 2*bd + pd - 0
        wb = jnp.zeros((2, 2, 2, 2, 2, 2, c, w.shape[-1]), w.dtype)
        for kd in range(3):
            for kh in range(3):
                for kw in range(3):
                    bd, pd = divmod(kd, 2)
                    bh, ph = divmod(kh, 2)
                    bw, pw = divmod(kw, 2)
                    wb = wb.at[bd, bh, bw, pd, ph, pw].set(w[kd, kh, kw])
        wb = wb.reshape(2, 2, 2, 8 * c, w.shape[-1])
        return jax.lax.conv_general_dilated(
            xs, wb, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)

    y1 = jax.jit(conv_s2)(x, w)
    y2 = jax.jit(s2d_conv)(x, w)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
    print(f"  s2d max err: {err:.4f}")
    bench(conv_s2, x, w, name="fwd XLA s2 (current)")
    bench(s2d_conv, x, w, name="fwd space-to-depth k2")
    bench(grad_version(conv_s2, x, w), x, w, name="bwd XLA s2 (current)")
    bench(grad_version(s2d_conv, x, w), x, w, name="bwd space-to-depth k2")


def group_up():
    print("== upsample: transp k2 s2 96->64 @64^3 -> 128^3 ==", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 64, 96), jnp.bfloat16)
    w = jnp.asarray(rng.rand(2, 2, 2, 96, 64), jnp.bfloat16)

    def subpixel(x, w):  # current formulation (flip for ConvTranspose parity)
        n, d, h, wd, c = x.shape
        k = w.shape[:3]
        f = w.shape[-1]
        wf = jnp.flip(w, axis=(0, 1, 2))
        wm = jnp.transpose(wf, (3, 0, 1, 2, 4)).reshape(c, -1)
        y = jnp.einsum("ndhwc,ck->ndhwk", x, wm)
        y = y.reshape(n, d, h, wd, k[0], k[1], k[2], f)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
        return y.reshape(n, d * k[0], h * k[1], wd * k[2], f)

    def xla_transpose(x, w):
        return jax.lax.conv_transpose(
            x, jnp.flip(w, (0, 1, 2)), (2, 2, 2), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def lhs_dilated(x, w):
        # conv with lhs_dilation; subpixel's flip convention means the raw
        # kernel here matches its output
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)

    y1 = jax.jit(subpixel)(x, w)
    y3 = jax.jit(lhs_dilated)(x, w)
    err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y3.astype(jnp.float32))))
    print(f"  lhs_dilated vs subpixel max err: {err:.4f}")
    bench(subpixel, x, w, name="fwd subpixel einsum (current)")
    bench(xla_transpose, x, w, name="fwd lax.conv_transpose")
    bench(lhs_dilated, x, w, name="fwd lhs_dilated conv")
    bench(grad_version(subpixel, x, w), x, w, name="bwd subpixel (current)")
    bench(grad_version(lhs_dilated, x, w), x, w, name="bwd lhs_dilated")


def group_norm():
    print("== instance norm + leaky relu @128^3 x64 ==", flush=True)
    import flax.linen as nn
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 128, 64), jnp.bfloat16)
    gn = nn.GroupNorm(num_groups=64, epsilon=1e-5)
    variables = gn.init(jax.random.PRNGKey(0), x)
    g = variables["params"]["scale"]
    b = variables["params"]["bias"]

    def flax_gn(x, g):
        y = gn.apply({"params": {"scale": g, "bias": b}}, x)
        return nn.leaky_relu(y, 0.01)

    def manual_in(x, g):
        xf = x.astype(jnp.float32)
        s1 = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        s2 = jnp.mean(xf * xf, axis=(1, 2, 3), keepdims=True)
        inv = jax.lax.rsqrt(s2 - s1 * s1 + 1e-5)
        scale_f = g.astype(jnp.float32) * inv
        shift_f = b.astype(jnp.float32) - s1 * scale_f
        y = x * scale_f.astype(x.dtype) + shift_f.astype(x.dtype)
        return nn.leaky_relu(y, 0.01)

    y1 = jax.jit(flax_gn)(x, g).astype(jnp.float32)
    y2 = jax.jit(manual_in)(x, g).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y1 - y2)))
    print(f"  manual vs flax max err: {err:.4f}")
    bench(flax_gn, x, g, name="fwd flax GroupNorm+lrelu (current)")
    bench(manual_in, x, g, name="fwd manual 2-moment IN+lrelu")
    bench(grad_version(flax_gn, x, g), x, g, name="bwd flax GroupNorm+lrelu")
    bench(grad_version(manual_in, x, g), x, g, name="bwd manual IN+lrelu")


GROUPS = {"head": group_head, "s2": group_s2, "up": group_up, "norm": group_norm}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in GROUPS.items():
        if which in ("all", name):
            fn()
    print("DONE", flush=True)
