"""3D convolution strategies for TPU.

XLA's native Conv3D lowering reaches only ~26 TFLOPs on v5e for the BraTS
workhorse shapes (64ch @ 128^3) — ~13% of the chip's measured 148-TFLOPs matmul
peak. This module provides faster formulations and a single entry point
(`conv3d`) the model layers route through:

* ``xla``    — lax.conv_general_dilated (baseline; always correct, any config).
* ``decomp2d`` — decompose the depth axis: a k-cubed 3D conv equals the sum of
  k depth-shifted 2D convs with the D axis folded into the batch. XLA's 2D conv
  path tiles better (measured ~36 TFLOPs, 1.4x) and the rewrite is exact.
* ``pallas`` — fused VMEM-tile kernel (see ops/pallas/conv3d.py) when available.

The strategy is chosen per call-site shape: decomp2d applies to stride-1 odd
kernels; everything else falls back to XLA.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp

_DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")

# Strategy override for experiments: UNET3D_TPU_CONV=xla|decomp2d
_ENV_STRATEGY = os.environ.get("UNET3D_TPU_CONV")


def conv3d_xla(x: jnp.ndarray, w: jnp.ndarray, stride: Sequence[int],
               padding) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, tuple(stride), padding, dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=x.dtype)


def conv3d_decomp2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME k-cubed conv as kD depth-shifted 2D convs.

    Exact in f32. In bf16 each depth-tap's partial sum is rounded to bf16
    before the cross-tap add (XLA's single conv3d accumulates all taps in f32
    and rounds once), so AMP outputs differ from the XLA path at bf16 rounding
    magnitude — within AMP training noise, but not bit-exact.

    Output voxel o[d] = sum_dz conv2d(x[d + dz - r], w[dz]); folding D into the
    batch turns each tap into one large 2D conv, then the partial sums are
    combined with D-shifts. The depth axis is padded once; taps pad H/W via
    SAME inside the conv so the H/W pad fuses with the producing elementwise
    chain (measured: a single explicit D+H+W pad wins 0.9 ms per conv in
    isolation but loses 3.9 ms/step in context — tools/bisect_step.py).
    Output-side tap combining and stacked-output-channel single-conv forms
    both measured ~60% worse fwd+bwd (tools/microbench_r3.py).
    """
    n, d, h, wd, c = x.shape
    kd, kh, kw = w.shape[:3]
    r = kd // 2
    if os.environ.get("UNET3D_TPU_DECPAD") == "hw":
        # experiment: pad D+H+W once, VALID taps. Wins 0.9 ms/conv at the op
        # level but LOSES 3.9 ms/step in the full train step — the explicit
        # H/W pad blocks the leaky_relu->conv-input fusion XLA otherwise
        # builds (tools/bisect_step.py, r2 session 2). Kept opt-in only.
        rh, rw = kh // 2, kw // 2
        xp = jnp.pad(x, ((0, 0), (r, r), (rh, rh), (rw, rw), (0, 0)))
        out = None
        for dz in range(kd):
            slab = jax.lax.slice_in_dim(xp, dz, dz + d, axis=1)
            slab = slab.reshape(n * d, h + 2 * rh, wd + 2 * rw, c)
            y2 = jax.lax.conv_general_dilated(
                slab, w[dz], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            y = y2.reshape(n, d, h, wd, -1)
            out = y if out is None else out + y
        return out
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(kd):
        slab = jax.lax.slice_in_dim(xp, dz, dz + d, axis=1).reshape(n * d, h, wd, c)
        y2 = jax.lax.conv_general_dilated(
            slab, w[dz], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        y = y2.reshape(n, d, h, wd, -1)
        out = y if out is None else out + y
    return out


def conv3d_s2_s2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME k3s2 conv as space-to-depth + one k2s1 VALID conv (exact).

    With xp = pad(x, 1) and the parity grid sp[i, p] = xp[2i+p], every tap
    k = 2j + p of the strided conv becomes tap j of a stride-1 conv over sp:
    out[o] = sum_{j,p} sp[o+j, p] w[2j+p]. The (j,p) pairs with 2j+p > 2 get
    zero weights (27 real taps in 64 slots, 2.37x the MACs) — but the
    backward turns into canonical stride-1 wgrad/dgrad convs instead of the
    rhs-dilated wgrad XLA lowers at 15 TFLOPs (round-4 trace, PERF.md), and
    the 8*C input channels quadruple the MXU contraction depth.

    The S2D relayout keeps (pw, c) as the minor block so the W-axis split is
    a free row-major reshape; only (d, pd)/(h, ph) permute (the same trick as
    the subpixel interleave in models/layers.py).
    """
    n, D, H, W, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    d2, h2, w2 = (D + 2) // 2, (H + 2) // 2, (W + 2) // 2
    sp = xp.reshape(n, d2, 2, h2, 2, w2, 2 * c)
    sp = jnp.transpose(sp, (0, 1, 3, 5, 2, 4, 6))
    sp = sp.reshape(n, d2, h2, w2, 8 * c)
    # kernel slots: (j, p) per dim with k = 2j + p <= 2; channel blocks are
    # ordered (pd, ph, pw, c) to match the S2D layout above
    w2k = jnp.zeros((2, 2, 2, 8, c, co), w.dtype)
    dim_taps = [(0, 0), (0, 1), (1, 0)]  # (j, p) -> k = 2j + p in {0, 1, 2}
    for jd, pd in dim_taps:
        for jh, ph in dim_taps:
            for jw, pw in dim_taps:
                w2k = w2k.at[jd, jh, jw, pd * 4 + ph * 2 + pw].set(
                    w[2 * jd + pd, 2 * jh + ph, 2 * jw + pw])
    w2k = w2k.reshape(2, 2, 2, 8 * c, co)
    return jax.lax.conv_general_dilated(
        sp, w2k, (1, 1, 1), "VALID", dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=x.dtype)


# Stride-2 conv strategy (UNET3D_TPU_S2GRAD): "xla" (default), "s2d", or
# "pallas" (XLA forward + XLA data-grad + Pallas MXU weight-grad kernel).
_S2_STRATEGY = os.environ.get("UNET3D_TPU_S2GRAD", "xla")

# Stride-1 backward strategy (UNET3D_TPU_S1BWD): unset (autodiff of the
# decomp2d taps — each tap emits its own 2D dgrad/wgrad, so the round-4 trace
# shows 3 full-volume dgrad writes + 3 per-tap wgrad emitters per conv) or
# "xla3d" (custom VJP that differentiates the equivalent single XLA 3D conv —
# one dgrad write, one wgrad emitter; same math, bf16-rounding-level diff).
# Measured in the full step: xla3d is 285.7-286.1 vs 126.0 ms/step — the
# per-tap 2D backward's 3 extra full-volume writes (each at >=70% of the HBM
# roofline, tools/roofline_report.py) are still 2.3x cheaper than XLA's
# native 3D dgrad/wgrad emitters. (Same number via jax.vjp and
# jax.linear_transpose backwards: XLA DCEs the vjp's unused primal conv, so
# the gap is genuinely the 3D emitters.) Kept as a bisect handle only.
_S1_BWD = os.environ.get("UNET3D_TPU_S1BWD")


@jax.custom_vjp
def _decomp2d_xla3d_bwd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return conv3d_decomp2d(x, w)


def _d2x_fwd(x, w):
    return conv3d_decomp2d(x, w), (x, w)


def _d2x_bwd(res, g):
    x, w = res
    # conv is linear in each operand: linear_transpose builds the dgrad/wgrad
    # programs WITHOUT re-executing the forward conv (jax.vjp would)
    dx, = jax.linear_transpose(
        lambda xx: conv3d_xla(xx, w, (1, 1, 1), "SAME"), x)(g)
    dw, = jax.linear_transpose(
        lambda ww: conv3d_xla(x, ww, (1, 1, 1), "SAME"), w)(g)
    return dx, dw


_decomp2d_xla3d_bwd.defvjp(_d2x_fwd, _d2x_bwd)


def _s2d_eligible(x_shape, w_shape, stride, same_padding) -> bool:
    return (_S2_STRATEGY == "s2d" and tuple(stride) == (2, 2, 2)
            and tuple(w_shape[:3]) == (3, 3, 3) and same_padding
            and all(s % 2 == 0 for s in x_shape[1:4]))


_S2_SAME_PADS = ((1, 1), (1, 1), (1, 1))


@jax.custom_vjp
def conv3d_s2_pallas_wgrad(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME k3s2 conv whose weight gradient runs in the Pallas kernel
    (ops/pallas/s2_wgrad_kernel.py). Forward and data-grad stay on XLA's
    fast paths (the data-grad transposed conv measures 72 TFLOPs in-step;
    only the rhs-dilated weight-grad is slow at ~15, PERF.md round 4)."""
    return conv3d_xla(x, w, (2, 2, 2), _S2_SAME_PADS)


def _s2_pallas_fwd(x, w):
    return conv3d_s2_pallas_wgrad(x, w), (x, w)


def _s2_pallas_bwd(res, g):
    from unet3d_tpu.ops.pallas.s2_wgrad_kernel import s2_wgrad_pallas
    x, w = res
    # linear_transpose: the dgrad transposed-conv program without re-running
    # the forward conv (jax.vjp executes the primal to build the pullback)
    dx, = jax.linear_transpose(
        lambda xx: conv3d_xla(xx, w, (2, 2, 2), _S2_SAME_PADS), x)(g)
    dw = s2_wgrad_pallas(x, g).astype(w.dtype)
    return dx, dw


conv3d_s2_pallas_wgrad.defvjp(_s2_pallas_fwd, _s2_pallas_bwd)


def _s2_pallas_eligible(x_shape, w_shape, stride, same_padding) -> bool:
    if not (_S2_STRATEGY == "pallas" and tuple(stride) == (2, 2, 2)
            and tuple(w_shape[:3]) == (3, 3, 3) and same_padding):
        return False
    from unet3d_tpu.ops.pallas.s2_wgrad_kernel import s2_wgrad_available
    n, d, h, w, c = x_shape
    return s2_wgrad_available(
        x_shape, (n, d // 2, h // 2, w // 2, w_shape[-1]))


def conv3d_with_stats(x: jnp.ndarray, w: jnp.ndarray,
                      stride: Sequence[int] = (1, 1, 1), padding="SAME"):
    """Conv + per-(item, channel) f32 (sum, sum_sq) of the output — the
    instance-norm stats. On the profitable Pallas-Winograd shapes the stats
    accumulate inside the conv kernel's VMEM epilogue (no HBM re-read of y);
    elsewhere one jnp stats pass follows the conv (XLA fuses it — the
    baseline cost this epilogue removes)."""
    stride = tuple(int(s) for s in stride)
    same_padding = padding == "SAME" or (
        not isinstance(padding, str)
        and tuple(tuple(p) for p in padding)
        == tuple((k // 2, k // 2) for k in w.shape[:3]))
    if _ENV_STRATEGY == "winograd":
        from unet3d_tpu.ops.pallas.winograd_kernel import (
            winograd_available, winograd_conv3d_stats, winograd_profitable)
        if (winograd_profitable(x.shape)
                and stride == (1, 1, 1)
                and winograd_available(x.shape, w.shape, stride,
                                       "SAME" if same_padding else padding)):
            return winograd_conv3d_stats(x, w)
    y = conv3d(x, w, stride, padding)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(1, 2, 3)), jnp.sum(yf * yf, axis=(1, 2, 3))


def conv3d(x: jnp.ndarray, w: jnp.ndarray, stride: Sequence[int] = (1, 1, 1),
           padding="SAME") -> jnp.ndarray:
    """Strategy-dispatching 3D convolution (NDHWC / DHWIO).

    decomp2d requires stride 1, SAME padding, and an odd depth kernel; other
    configurations use the XLA path. The Pallas fused kernel
    (`ops/pallas/conv3d_kernel.py`) is opt-in via UNET3D_TPU_CONV=pallas —
    numerically exact but currently DMA-overhead-bound below decomp2d.
    """
    stride = tuple(int(s) for s in stride)
    # explicit symmetric k//2 pads on an odd kernel are exactly SAME at
    # stride 1 (FastConv lowers "SAME" to them for torch parity)
    same_padding = padding == "SAME" or (
        not isinstance(padding, str)
        and tuple(tuple(p) for p in padding)
        == tuple((k // 2, k // 2) for k in w.shape[:3]))
    if _ENV_STRATEGY == "xla":
        return conv3d_xla(x, w, stride, padding)
    if _ENV_STRATEGY == "pallas":
        from unet3d_tpu.ops.pallas.conv3d_kernel import (pallas_conv3d,
                                                         pallas_conv3d_available)
        # normalize explicit-SAME pads so the opt-in stays reachable now that
        # FastConv lowers "SAME" to explicit pairs
        if pallas_conv3d_available(x.shape, w.shape, stride,
                                   "SAME" if same_padding else padding):
            return pallas_conv3d(x, w)
    # Pallas Winograd-DH kernel: OPT-IN (UNET3D_TPU_CONV=winograd). Wins
    # op-level when the channel contraction feeds the MXU at K >= 96
    # (128ch@128^3 11.2 vs 12.9 ms, 96ch@64^3 3.9 vs 4.5 — probe_winograd_
    # tpu.py) but LOSES in the full train step: the custom call's forced
    # operand layouts surround every site with layout-conversion and convert
    # fusions the standalone probe never pays (step 210 vs 121.7 ms/step,
    # trace in PERF.md round 3). Kept for inference-style graphs and bigger
    # chips where the conv dominates its boundaries.
    if _ENV_STRATEGY == "winograd":
        from unet3d_tpu.ops.pallas.winograd_kernel import (
            winograd_available, winograd_conv3d, winograd_profitable)
        if (winograd_profitable(x.shape)
                and winograd_available(x.shape, w.shape, stride,
                                       "SAME" if same_padding else padding)):
            return winograd_conv3d(x, w)
    # ALL kernel dims must be odd: the 2D taps pad H/W via "SAME", which for
    # an even kernel pads (0, 1) instead of the symmetric (k//2, k//2) the
    # explicit-pad contract promises
    eligible = (stride == (1, 1, 1) and same_padding
                and all(k % 2 == 1 for k in w.shape[:3]) and w.shape[0] > 1)
    if eligible and _ENV_STRATEGY in (None, "decomp2d", "pallas", "winograd"):
        if _S1_BWD == "xla3d":
            return _decomp2d_xla3d_bwd(x, w)
        return conv3d_decomp2d(x, w)
    if _s2d_eligible(x.shape, w.shape, stride, same_padding):
        return conv3d_s2_s2d(x, w)
    if _s2_pallas_eligible(x.shape, w.shape, stride, same_padding):
        return conv3d_s2_pallas_wgrad(x, w)
    return conv3d_xla(x, w, stride, padding)
