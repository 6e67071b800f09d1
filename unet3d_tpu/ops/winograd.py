"""Winograd F(2^3, 3^3) convolution formulations for TPU.

Round-2 PERF.md item 1 argued Winograd away on a traffic estimate; VERDICT
round 2 requires it *measured*. This module holds the measurable
implementations:

* ``winograd_conv3d_xla`` — straight XLA-op formulation. The transform domain
  (64 points per 2^3-output tile = 8x data expansion) materializes in HBM, so
  this version is expected to be HBM-bound; it exists to validate the math
  end-to-end and to measure the real transform cost on-chip instead of
  estimating it.
* the Pallas tile-fused version lives in ``ops/pallas/winograd_kernel.py``
  (transform domain stays in VMEM).

Math (F(2,3), Lavin & Gray 2015):
    Y = A^T [ (G g G^T) .. (B^T d B) ] A        per dim, d a 4-tap tile
with
    B^T = [[1,0,-1,0], [0,1,1,0], [0,-1,1,0], [0,1,0,-1]]
    G   = [[1,0,0], [.5,.5,.5], [.5,-.5,.5], [0,0,1]]
    A^T = [[1,1,1,0], [0,1,-1,-1]]
A stride-1 SAME 3-cubed conv on even spatial dims decomposes into (S/2)^3
tiles of 2^3 outputs; each tile contracts 64 transform points over channels —
(tiles, Cin) @ (Cin, Cout) matmuls, 3.375x fewer FLOPs than direct.

Numerics: transforms run in f32 (the G matrix halves values; bf16 transform
inputs lose ~1-2 bits vs direct conv — measured in tests), matmuls accumulate
f32 via preferred_element_type, output cast back to the input dtype.

Reference basis: the convs this replaces are `unet3d/models/pytorch/
classification/myronenko.py:5-31` (all stride-1 3-cubed convs).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def transform_weights(w: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) -> (64, Cin, Cout) transform-domain weights U.

    U[a,b,c] = sum_{z,y,x} G[a,z] G[b,y] G[c,x] w[z,y,x]; f32 throughout
    (the 1/2 entries of G are exact in bf16 but products are not).
    """
    g = jnp.asarray(_G)
    u = jnp.einsum("az,by,cx,zyxio->abcio", g, g, g, w.astype(jnp.float32))
    return u.reshape(64, w.shape[3], w.shape[4]).astype(dtype)


def _input_transform_dim(xp: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Apply B^T along ``axis`` (padded length S+2, S even) -> new leading
    4-point axis; tile count T = S/2 replaces the spatial axis.

    Avoids strided gathers: the padded axis reshapes into (T+1, 2) pairs; each
    tile t combines pairs t and t+1 with +/- adds only (B^T entries are 0/±1).
    """
    size = xp.shape[axis]
    assert size % 2 == 0, "padded axis must be even (input axis even + 2 pad)"
    t = size // 2 - 1
    new_shape = xp.shape[:axis] + (t + 1, 2) + xp.shape[axis + 1:]
    q = xp.reshape(new_shape)
    sl_a = [slice(None)] * q.ndim
    sl_b = [slice(None)] * q.ndim
    sl_a[axis] = slice(0, t)
    sl_b[axis] = slice(1, t + 1)
    a = q[tuple(sl_a)]  # pairs (x0, x1) of each tile
    b = q[tuple(sl_b)]  # pairs (x2, x3)

    def pick(arr, j):
        sl = [slice(None)] * arr.ndim
        sl[axis + 1] = j
        return arr[tuple(sl)]

    x0, x1 = pick(a, 0), pick(a, 1)
    x2, x3 = pick(b, 0), pick(b, 1)
    # B^T rows: [x0-x2, x1+x2, -x1+x2, x1-x3]
    return jnp.stack([x0 - x2, x1 + x2, x2 - x1, x1 - x3], axis=0)


def transform_input(x: jnp.ndarray) -> jnp.ndarray:
    """NDHWC (even spatial dims) -> (64, N, D/2, H/2, W/2, C) transform V."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    v = _input_transform_dim(xp, 1)           # (4d, N, Td, H+2, W+2, C)
    v = _input_transform_dim(v, 3)            # (4h, 4d, N, Td, Th, W+2, C)
    v = _input_transform_dim(v, 5)            # (4w, 4h, 4d, N, Td, Th, Tw, C)
    # each application prepends its point axis -> order (w, h, d); flatten
    # D-major to match transform_weights' (a,b,c) = (z,y,x) flattening
    v = v.transpose((2, 1, 0) + tuple(range(3, v.ndim)))
    return v.reshape((64,) + v.shape[3:])


def inverse_transform(m: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """(64, N, Td, Th, Tw, Co) transform-domain products -> NDHWC output."""
    _, n, td, th, tw, co = m.shape
    m = m.reshape(4, 4, 4, n, td, th, tw, co)

    def apply_at(arr, axis):
        sl = [slice(None)] * arr.ndim

        def pick(j):
            s = list(sl)
            s[axis] = j
            return arr[tuple(s)]

        m0, m1, m2, m3 = pick(0), pick(1), pick(2), pick(3)
        # A^T rows: [m0+m1+m2, m1-m2-m3]
        return jnp.stack([m0 + m1 + m2, m1 - m2 - m3], axis=0)

    y = apply_at(m, 2)        # (2, 4, 4, N, ...)
    y = apply_at(y, 2)        # (2, 2, 4, N, ...)
    y = apply_at(y, 2)        # (2, 2, 2, N, Td, Th, Tw, Co)
    # interleave (od, oh, ow) with the tile axes -> (N, D, H, W, Co)
    y = y.transpose(3, 4, 0, 5, 1, 6, 2, 7)
    return y.reshape(n, td * 2, th * 2, tw * 2, co).astype(out_dtype)


def winograd_conv3d_xla(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME 3-cubed conv via F(2^3,3^3), all-XLA ops.

    Requires even spatial dims (every shape in the DynUNet family qualifies:
    inputs are /32-divisible). Transform domain materializes in HBM — see
    module docstring; use for measurement and as the Pallas reference.
    """
    assert w.shape[:3] == (3, 3, 3)
    assert all(s % 2 == 0 for s in x.shape[1:4]), "spatial dims must be even"
    u = transform_weights(w, dtype=jnp.float32)            # (64, Ci, Co)
    v = transform_input(x.astype(jnp.float32))             # (64, N, T, T, T, Ci)
    n, td, th, tw, ci = v.shape[1:]
    v2 = v.reshape(64, n * td * th * tw, ci)
    m = jax.lax.dot_general(v2, u, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = m.reshape(64, n, td, th, tw, -1)
    return inverse_transform(m, x.dtype)


def winograd_conv3d_xla_bf16(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Same, but transforms/matmul in the input dtype (bf16 under AMP) —
    the fast-but-lossier variant; kept separate so the accuracy cost is
    measurable in isolation."""
    assert w.shape[:3] == (3, 3, 3)
    u = transform_weights(w, dtype=x.dtype)
    v = transform_input(x)
    n, td, th, tw, ci = v.shape[1:]
    v2 = v.reshape(64, n * td * th * tw, ci)
    m = jax.lax.dot_general(v2, u, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = m.reshape(64, n, td, th, tw, -1)
    return inverse_transform(m, x.dtype)
