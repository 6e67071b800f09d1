#!/usr/bin/env python
"""TPU probe + measurement for the Pallas Winograd-DH kernel."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from unet3d_tpu.ops.pallas.winograd_kernel import _winograd_batched, winograd_conv3d
from unet3d_tpu.ops.conv3d import conv3d_decomp2d, conv3d_xla

def bench(fn, *args, iters=10, name=""):
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name:50s} {dt:8.2f} ms (compile {c:.0f}s)", flush=True)
    return dt

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(0)

# --- probe: tiny shape, correctness vs XLA on-chip ---
x = jnp.asarray(rng.rand(1, 8, 16, 16, 8), jnp.float32)
w = jnp.asarray(rng.rand(3, 3, 3, 8, 8) - 0.5, jnp.float32)
try:
    got = _winograd_batched(x, w)
    ref = conv3d_xla(x, w, (1, 1, 1), "SAME")
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print("PROBE OK  rel err:", err, flush=True)
except Exception as e:
    print("PROBE FAILED:", str(e).split("\n")[0][:300], flush=True)
    sys.exit(1)

# --- level-0 shape measurement ---
for (shape, co) in [((1, 128, 128, 128, 64), 64), ((1, 64, 64, 64, 96), 96),
                    ((1, 128, 128, 128, 128), 64)]:
    print(f"== {shape} -> {co} ==", flush=True)
    x = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
    w = jnp.asarray(rng.rand(3, 3, 3, shape[-1], co) - 0.5, jnp.bfloat16)
    try:
        bench(jax.jit(conv3d_decomp2d), x, w, name="fwd decomp2d")
        bench(jax.jit(_winograd_batched), x, w, name="fwd pallas winograd-DH")
        # correctness on-chip at bf16
        g = jax.jit(_winograd_batched)(x, w).astype(jnp.float32)
        r = jax.jit(conv3d_decomp2d)(x, w).astype(jnp.float32)
        print("   bf16 max rel diff vs decomp2d:",
              float(jnp.max(jnp.abs(g - r)) / jnp.max(jnp.abs(r))), flush=True)
        def loss_w(x, w):
            return jnp.sum(winograd_conv3d(x, w).astype(jnp.float32))
        def loss_d(x, w):
            return jnp.sum(conv3d_decomp2d(x, w).astype(jnp.float32))
        bench(jax.jit(jax.grad(loss_d, (0, 1))), x, w, name="f+b decomp2d")
        bench(jax.jit(jax.grad(loss_w, (0, 1))), x, w, name="f+b pallas winograd-DH")
    except Exception as e:
        print("   FAILED:", str(e).split("\n")[0][:300], flush=True)
