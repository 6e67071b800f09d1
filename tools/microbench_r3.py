#!/usr/bin/env python
"""Round-2 session-2 microbenchmarks: next candidate rewrites from the fresh
trace (tools/correlate_trace.py): loss-path f32 casts, decomp2d pad placement,
stride-2 conv formulations, subpixel bwd.

Run one group to bound compile time:
  python tools/microbench_r3.py [loss|dec|s2|subpix|all]
"""
import sys
import time

sys.path.insert(0, ".")

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
    print(f"  {name:58s} {dt:8.2f} ms", flush=True)
    return dt


def grad_version(f, *argnums):
    def loss(*args):
        return jnp.sum(f(*args).astype(jnp.float32))
    return jax.grad(loss, argnums=argnums or (0, 1))


def group_loss():
    """Dice loss: full-volume f32 cast (current step behavior) vs bf16 products
    with f32-accumulated reductions."""
    print("== Dice loss @ (1,128^3,3) sigmoid ==", flush=True)
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 128, 128, 128, 3), jnp.bfloat16)
    y = jnp.asarray((rng.rand(1, 128, 128, 128, 3) > 0.5), jnp.float32)

    def dice_f32(logits, y):
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        axes = (1, 2, 3)
        inter = jnp.sum(p * y, axes)
        denom = jnp.sum(p, axes) + jnp.sum(y, axes)
        return jnp.mean(1.0 - (2 * inter + 1e-5) / (denom + 1e-5))

    def dice_bf16(logits, y):
        p = jax.nn.sigmoid(logits)  # bf16
        yb = y.astype(jnp.bfloat16)
        axes = (1, 2, 3)
        inter = jnp.sum((p * yb).astype(jnp.float32), axes)
        denom = (jnp.sum(p.astype(jnp.float32), axes)
                 + jnp.sum(y, axes))
        return jnp.mean(1.0 - (2 * inter + 1e-5) / (denom + 1e-5))

    bench(dice_f32, logits, y, name="fwd f32-cast (current)")
    bench(dice_bf16, logits, y, name="fwd bf16 products, f32 reduce")
    bench(jax.grad(dice_f32), logits, y, name="fwd+bwd f32-cast (current)")
    bench(jax.grad(dice_bf16), logits, y, name="fwd+bwd bf16 products")


def group_dec():
    """decomp2d: where the pads/slices go. Current: jnp.pad D, slab slices,
    SAME-via-explicit-HW-pads inside each tap conv. Variants:
      padall : pad D+H+W once, VALID taps (one materialized pad, not two)
      outcomb: one conv per tap over the FULL padded folded batch (no input
               slab slices), combine with shifted output slices
      stacked: single conv with 3*co output channel groups over the full
               padded batch, combine with shifted strided output slices
    """
    print("== stride-1 k3 conv 64->64 @128^3 (decomp2d forms) ==", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 128, 64), jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, 3, 64, 64) * 0.1, jnp.bfloat16)
    dn2 = ("NHWC", "HWIO", "NHWC")

    def current(x, w):
        from unet3d_tpu.ops.conv3d import conv3d_decomp2d
        return conv3d_decomp2d(x, w)

    def padall(x, w):
        n, d, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        out = None
        for dz in range(3):
            slab = jax.lax.slice_in_dim(xp, dz, dz + d, axis=1)
            slab = slab.reshape(n * d, h + 2, wd + 2, c)
            y2 = jax.lax.conv_general_dilated(
                slab, w[dz], (1, 1), "VALID", dimension_numbers=dn2,
                preferred_element_type=x.dtype)
            y = y2.reshape(n, d, h, wd, -1)
            out = y if out is None else out + y
        return out

    def outcomb(x, w):
        n, d, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xf = xp.reshape(n * (d + 2), h, wd, c)
        out = None
        for dz in range(3):
            y2 = jax.lax.conv_general_dilated(
                xf, w[dz], (1, 1), "SAME", dimension_numbers=dn2,
                preferred_element_type=x.dtype)
            y = y2.reshape(n, d + 2, h, wd, -1)
            y = jax.lax.slice_in_dim(y, dz, dz + d, axis=1)
            out = y if out is None else out + y
        return out

    def stacked(x, w):
        n, d, h, wd, c = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xf = xp.reshape(n * (d + 2), h, wd, c)
        ws = jnp.concatenate([w[0], w[1], w[2]], axis=-1)  # (3,3,c,3co)
        y2 = jax.lax.conv_general_dilated(
            xf, ws, (1, 1), "SAME", dimension_numbers=dn2,
            preferred_element_type=x.dtype)
        y = y2.reshape(n, d + 2, h, wd, 3, co)
        out = None
        for dz in range(3):
            part = jax.lax.slice_in_dim(y, dz, dz + d, axis=1)[..., dz, :]
            out = part if out is None else out + part
        return out

    ref = np.asarray(current(x, w), np.float32)
    for name, f in [("padall", padall), ("outcomb", outcomb), ("stacked", stacked)]:
        got = np.asarray(f(x, w), np.float32)
        err = np.abs(got - ref).max()
        assert err < 1e-2, (name, err)
    bench(current, x, w, name="fwd current (pad-D + slab slices)")
    bench(padall, x, w, name="fwd padall (one pad, VALID taps)")
    bench(outcomb, x, w, name="fwd outcomb (full batch, out slices)")
    bench(stacked, x, w, name="fwd stacked (1 conv, 3co groups)")
    bench(grad_version(current), x, w, name="fwd+bwd current")
    bench(grad_version(padall), x, w, name="fwd+bwd padall")
    bench(grad_version(outcomb), x, w, name="fwd+bwd outcomb")
    bench(grad_version(stacked), x, w, name="fwd+bwd stacked")


def group_s2():
    """stride-2 conv 64->96 @128^3: XLA 3D (current) vs depth-tap folding with
    all-depth 2D s2 convs + strided output combine."""
    print("== k3 s2 conv 64->96 @128^3 ==", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 128, 64), jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, 3, 64, 96) * 0.1, jnp.bfloat16)
    dn2 = ("NHWC", "HWIO", "NHWC")

    def xla3d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2, 2), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)

    def depthfold(x, w):
        # out[i] = sum_dz conv2d_s2(x[2i+dz-1], w[dz]); compute the 2D s2 conv
        # for every input slab once (2x depth compute), then combine taps with
        # strided slices of the folded output.
        n, d, h, wd, c = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xf = xp.reshape(n * (d + 2), h, wd, c)
        wst = jnp.concatenate([w[0], w[1], w[2]], axis=-1)
        y2 = jax.lax.conv_general_dilated(
            xf, wst, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn2,
            preferred_element_type=x.dtype)
        y = y2.reshape(n, d + 2, h // 2, wd // 2, 3, co)
        out = None
        for dz in range(3):
            part = jax.lax.slice_in_dim(y, dz, dz + d, axis=1)[:, ::2, ..., dz, :]
            out = part if out is None else out + part
        return out

    def depthfold3(x, w):
        # same but 3 separate convs (smaller output working set per conv)
        n, d, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xf = xp.reshape(n * (d + 2), h, wd, c)
        out = None
        for dz in range(3):
            y2 = jax.lax.conv_general_dilated(
                xf, w[dz], (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn2,
                preferred_element_type=x.dtype)
            y = y2.reshape(n, d + 2, h // 2, wd // 2, -1)
            part = jax.lax.slice_in_dim(y, dz, dz + d, axis=1)[:, ::2]
            out = part if out is None else out + part
        return out

    ref = np.asarray(xla3d(x, w), np.float32)
    for name, f in [("depthfold", depthfold), ("depthfold3", depthfold3)]:
        got = np.asarray(f(x, w), np.float32)
        # bf16 accumulation-order noise scales with |out| (~43 here)
        err = (np.abs(got - ref) / (np.abs(ref) + 1)).max()
        assert err < 2e-2, (name, err, got.shape, ref.shape)
    bench(xla3d, x, w, name="fwd XLA 3D s2 (current)")
    bench(depthfold, x, w, name="fwd depthfold stacked")
    bench(depthfold3, x, w, name="fwd depthfold 3 convs")
    bench(grad_version(xla3d), x, w, name="fwd+bwd XLA 3D s2 (current)")
    bench(grad_version(depthfold), x, w, name="fwd+bwd depthfold stacked")
    bench(grad_version(depthfold3), x, w, name="fwd+bwd depthfold 3 convs")


def group_subpix():
    """Subpixel transposed conv k2s2 96->64 @64^3->128^3: current einsum+
    transpose+reshape vs conv1x1-style dot with interleave via dynamic slicing
    vs custom-vjp wrapper (bwd as strided slices + einsum)."""
    print("== transp conv k2 s2 96->64 @64^3 ==", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 64, 64, 64, 96), jnp.bfloat16)
    w = jnp.asarray(rng.rand(2, 2, 2, 96, 64) * 0.1, jnp.bfloat16)

    def current(x, w):
        n, d, h, wd = x.shape[:4]
        c, co = w.shape[3], w.shape[4]
        wf = jnp.flip(w, axis=(0, 1, 2))
        wm = jnp.transpose(wf, (3, 0, 1, 2, 4)).reshape(c, 8 * co)
        y = jnp.einsum("ndhwc,ck->ndhwk", x, wm)
        y = y.reshape(n, d, h, wd, 2, 2, 2, co)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
        return y.reshape(n, d * 2, h * 2, wd * 2, co)

    @jax.custom_vjp
    def customv(x, w):
        return current(x, w)

    def customv_fwd(x, w):
        return current(x, w), (x, w)

    def customv_bwd(res, g):
        x, w = res
        n, d, h, wd, c = x.shape
        co = w.shape[-1]
        # g: (n, 2d, 2h, 2w, co); un-interleave via reshape (merge-style)
        gr = g.reshape(n, d, 2, h, 2, wd, 2, co)
        gr = jnp.transpose(gr, (0, 1, 3, 5, 2, 4, 6, 7))  # n,d,h,w,2,2,2,co
        gf = gr.reshape(n, d, h, wd, 8 * co)
        wf = jnp.flip(w, axis=(0, 1, 2))
        wm = jnp.transpose(wf, (3, 0, 1, 2, 4)).reshape(c, 8 * co)
        dx = jnp.einsum("ndhwk,ck->ndhwc", gf, wm)
        dwm = jnp.einsum("ndhwc,ndhwk->ck", x, gf)
        dw = jnp.flip(jnp.transpose(dwm.reshape(c, 2, 2, 2, co),
                                    (1, 2, 3, 0, 4)), axis=(0, 1, 2))
        return dx, dw

    customv.defvjp(customv_fwd, customv_bwd)

    ref = np.asarray(current(x, w), np.float32)
    got = np.asarray(customv(x, w), np.float32)
    assert np.abs(got - ref).max() < 1e-2
    g1 = jax.jit(grad_version(current))(x, w)
    g2 = jax.jit(grad_version(customv))(x, w)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        err = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
        assert err < 1e-1, err

    bench(current, x, w, name="fwd current")
    bench(grad_version(current), x, w, name="fwd+bwd current (XLA-derived)")
    bench(grad_version(customv), x, w, name="fwd+bwd custom vjp")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    groups = {"loss": group_loss, "dec": group_dec, "s2": group_s2,
              "subpix": group_subpix}
    if which == "all":
        for g in groups.values():
            g()
    else:
        groups[which]()
