"""Shared conv/norm building blocks (NDHWC, Flax).

TPU-native counterparts of the reference's conv helpers and Myronenko blocks
(`unet3d/models/pytorch/classification/resnet.py:12-22`,
`unet3d/models/pytorch/classification/myronenko.py:5-80`). Channels-last layout
throughout so XLA tiles the convolutions onto the MXU; GroupNorm follows the
reference's fallback rule (groups -> channels when not divisible).

Padding parity note: torch Conv3d(kernel=k odd, padding=k//2) produces the same
output sizes as XLA "SAME" padding for strides 1 and 2, so blocks use SAME.
torch ConvTranspose3d(kernel=k, stride=s, padding=p) maps to lax.conv_transpose
padding ((k-1-p, k-1-p),)*3: kernel=3, stride=2, padding=1 -> out = 2*in - 1 via
((1,1),)*3; kernel=2, stride=2, padding=0 -> out = 2*in also via ((1,1),)*3
(asserted against torch in tests/test_models.py).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet3d_tpu.ops.conv3d import conv3d

Ints3 = Union[int, Sequence[int]]


def _triple(v: Ints3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    return tuple(int(x) for x in v)


class FastConv(nn.Module):
    """Drop-in nn.Conv replacement routing through the strategy-dispatching
    3D conv (`ops/conv3d.py`): stride-1 odd kernels use the 2D-decomposition
    formulation that tiles better on the MXU. Parameter names/shapes match
    nn.Conv ('kernel' DHWIO + 'bias'), so checkpoints are interchangeable.

    ``padding="SAME"`` is lowered to explicit symmetric k//2 pads: XLA SAME
    distributes strided padding (lo=0, hi=1 for k=3 s=2 on even sizes), which
    diverges from torch Conv3d(padding=k//2) at the low edge — caught by the
    torch weight-transplant parity test (tests/test_parity_dynunet.py)."""
    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    # with_stats=True returns (y, sum, sum_sq) per (item, channel) — the
    # instance-norm stats, fused into the conv's VMEM epilogue on the
    # Pallas-Winograd path (ops/conv3d.conv3d_with_stats)
    with_stats: bool = False

    @nn.compact
    def __call__(self, x):
        """``x`` may be a tuple of tensors to convolve as if channel-concatenated:
        conv(concat(a, b), W) == conv(a, W[..., :ca, :]) + conv(b, W[..., ca:, :])
        exactly, but skips materializing the concat (and its backward split) —
        profiled at ~4.7 ms/step for the level-0 decoder skip join."""
        xs = x if isinstance(x, (list, tuple)) else (x,)
        in_channels = sum(v.shape[-1] for v in xs)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(in_axis=(0, 1, 2, 3),
                                                   out_axis=4),
            self.kernel_size + (in_channels, self.features))
        padding = self.padding
        if padding == "SAME":
            padding = tuple((k // 2, k // 2) for k in self.kernel_size)
        if self.with_stats and len(xs) == 1 and not self.use_bias:
            from unet3d_tpu.ops.conv3d import conv3d_with_stats
            return conv3d_with_stats(xs[0], kernel.astype(xs[0].dtype),
                                     self.strides, padding)
        y = None
        offset = 0
        for v in xs:
            c = v.shape[-1]
            part = conv3d(v, kernel[..., offset:offset + c, :].astype(v.dtype),
                          self.strides, padding)
            y = part if y is None else y + part
            offset += c
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        if self.with_stats:
            yf = y.astype(jnp.float32)
            return y, jnp.sum(yf, axis=(1, 2, 3)), jnp.sum(yf * yf, axis=(1, 2, 3))
        return y


def conv3(features: int, kernel_size: Ints3 = 3, stride: Ints3 = 1,
          use_bias: bool = True, name: Optional[str] = None) -> nn.Module:
    """k-cubed convolution, SAME padding (parity: `resnet.py:12-17` conv3x3x3)."""
    return FastConv(features=features, kernel_size=_triple(kernel_size),
                    strides=_triple(stride), padding="SAME", use_bias=use_bias,
                    name=name)


class PointwiseConv(nn.Module):
    """1-cubed convolution computed as a channel einsum (one MXU matmul).

    XLA's TPU conv emitter handles tiny channel counts poorly: the BraTS
    output head (64->3 @128^3) profiled at 6.8 ms fwd / 12.6 ms fwd+bwd as a
    conv vs 3.1 / 3.9 ms as an einsum (tools/microbench_r2.py). Param tree
    matches nn.Conv (kernel (1,1,1,Cin,Cout) + bias) so checkpoints
    interchange."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, c, self.features))
        w = kernel.reshape(c, self.features).astype(x.dtype)
        y = jnp.einsum("...c,co->...o", x, w)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def conv1(features: int, stride: Ints3 = 1, use_bias: bool = True,
          name: Optional[str] = None) -> nn.Module:
    """1-cubed (pointwise) convolution (parity: `resnet.py:20-22` conv1x1x1).

    Stride 1 routes through the einsum formulation; strided projections keep
    the conv lowering (the stride makes them gather-bound either way)."""
    if _triple(stride) == (1, 1, 1):
        return PointwiseConv(features=features, use_bias=use_bias, name=name)
    return nn.Conv(features=features, kernel_size=(1, 1, 1), strides=_triple(stride),
                   padding="VALID", use_bias=use_bias, name=name)


from functools import partial


import os as _os

# Subpixel interleave formulation (UNET3D_TPU_SUBPIX):
#   merged  — pre-merge the (kw, co) block into one unit before the transpose:
#             the fine-W interleave (w, kw, co) -> (2w, co) is then a row-major
#             bitcast, so the transpose only permutes the outer (d,kd)/(h,kh)
#             dims against a contiguous kw*co-lane row (measured fwd 3.16 vs
#             4.10 ms at the level-4 DynUNet shape, tools/microbench_r4.py).
#   full    — 8D reshape + transpose (the naive form).
_SUBPIX_MODE = _os.environ.get("UNET3D_TPU_SUBPIX", "merged")


def _subpixel_impl(k: Tuple[int, int, int], x: jnp.ndarray,
                   wm: jnp.ndarray) -> jnp.ndarray:
    n, d, h, w, c = x.shape
    co = wm.shape[1] // (k[0] * k[1] * k[2])
    y = jnp.einsum("ndhwc,ck->ndhwk", x, wm)
    if _SUBPIX_MODE == "merged":
        y = y.reshape(n, d, h, w, k[0], k[1], k[2] * co)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))
        return y.reshape(n, d * k[0], h * k[1], w * k[2], co)
    y = y.reshape(n, d, h, w, k[0], k[1], k[2], co)
    # NOTE: lax.reshape(dimensions=...) looks like it should fuse this
    # transpose+reshape into one copy but lowers 4x slower on v5e
    # (28.6 ms vs 6.9 measured) — keep the two-op form.
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(n, d * k[0], h * k[1], w * k[2], co)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _subpixel_apply(k: Tuple[int, int, int], x: jnp.ndarray,
                    wm: jnp.ndarray) -> jnp.ndarray:
    """out[s*i + a] = x[i] @ wm[:, a-block] followed by the subpixel interleave.

    Custom VJP because XLA's derived backward materializes an extra
    transpose+reshape chain; writing the bwd as the mirror un-interleave +
    two einsums measured 6.25 -> 4.37 ms fwd+bwd for the level-0 DynUNet
    upsample (tools/microbench_r3.py subpix).
    """
    return _subpixel_impl(k, x, wm)


def _subpixel_fwd(k, x, wm):
    return _subpixel_impl(k, x, wm), (x, wm)


def _subpixel_bwd(k, res, g):
    x, wm = res
    n, d, h, w, c = x.shape
    co = wm.shape[1] // (k[0] * k[1] * k[2])
    if _SUBPIX_MODE == "merged":
        # mirror of the merged fwd: (2w, co) -> (w, kw*co) is a bitcast, the
        # transpose un-permutes only the outer (d,kd)/(h,kh) dims
        gr = g.reshape(n, d, k[0], h, k[1], w, k[2] * co)
        gr = jnp.transpose(gr, (0, 1, 3, 5, 2, 4, 6))
    else:
        gr = g.reshape(n, d, k[0], h, k[1], w, k[2], co)
        gr = jnp.transpose(gr, (0, 1, 3, 5, 2, 4, 6, 7))
    gf = gr.reshape(n, d, h, w, k[0] * k[1] * k[2] * co)
    dx = jnp.einsum("ndhwk,ck->ndhwc", gf, wm)
    dwm = jnp.einsum("ndhwc,ndhwk->ck", x, gf)
    return dx, dwm


_subpixel_apply.defvjp(_subpixel_fwd, _subpixel_bwd)


class SubpixelConvTranspose(nn.Module):
    """Transposed conv with kernel == stride (no tap overlap): exactly
    ``out[s*i + a] = x[i] @ w[flip(a)]`` — one MXU matmul plus a subpixel
    (depth-to-space) interleave, much faster than XLA's fractionally-strided
    conv lowering (measured 3.6 TFLOPs for the DynUNet k2s2 upsamples).
    Parameter tree matches nn.ConvTranspose ('kernel' (k,k,k,Cin,Cout) + 'bias'),
    so checkpoints interchange."""
    features: int
    kernel_size: Tuple[int, int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(in_axis=(0, 1, 2, 3), out_axis=4),
            k + (c, self.features))
        # flax ConvTranspose applies the kernel tap-reversed; flip to match.
        # The flip/transpose stay outside the custom vjp so kernel gradients
        # flow through them by autodiff (the kernel is tiny).
        wf = jnp.flip(kernel, axis=(0, 1, 2)).astype(x.dtype)
        wm = jnp.transpose(wf, (3, 0, 1, 2, 4)).reshape(
            c, k[0] * k[1] * k[2] * self.features)
        import os
        if os.environ.get("UNET3D_TPU_SUBPIX_VJP") == "0":
            y = _subpixel_impl(tuple(k), x, wm)  # XLA-derived bwd
        else:
            y = _subpixel_apply(tuple(k), x, wm)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def transposed_conv(features: int, kernel_size: Ints3, stride: Ints3,
                    use_bias: bool = True, output_padding: Ints3 = 0,
                    name: Optional[str] = None) -> nn.Module:
    """ConvTranspose with torch padding semantics (padding = (k-stride+1)//2 each side
    when k > stride, else VALID), covering the k=3/s=2 (MirroredDecoder) and k=s
    (DynUNet) cases. The kernel == stride case routes through the subpixel
    matmul formulation (identical params and outputs). ``output_padding``
    follows torch: extra length added to the high side of each spatial dim
    (MONAI's up-convolutions use output_padding = stride - 1 so out = s*in)."""
    k = _triple(kernel_size)
    s = _triple(stride)
    op = _triple(output_padding)
    if k == s and op == (0, 0, 0):
        return SubpixelConvTranspose(features=features, kernel_size=k,
                                     use_bias=use_bias, name=name)
    # torch ConvTranspose padding p gives out = (in-1)*s + k - 2p + op; flax
    # explicit padding pairs satisfy out = (in-1)*s - k + 2 + pl + ph, so
    # pl = k-1-p and ph = k-1-p+op.
    pads = []
    for ki, si, opi in zip(k, s, op):
        torch_p = max((ki - si + 1) // 2, 0)
        pads.append((ki - 1 - torch_p, ki - 1 - torch_p + opi))
    return nn.ConvTranspose(features=features, kernel_size=k, strides=s,
                            padding=tuple(pads), use_bias=use_bias, name=name)


def group_norm_groups(channels: int, norm_groups: int = 8) -> int:
    """GroupNorm group count with the reference's fallback: when ``channels`` is not
    divisible by ``norm_groups`` (or smaller), use one group per channel
    (`myronenko.py:23-31`)."""
    if channels < norm_groups or channels % norm_groups != 0:
        return channels
    return norm_groups


class MyronenkoConvBlock(nn.Module):
    """Pre-activation block: GroupNorm -> ReLU -> conv (`myronenko.py:5-31`)."""
    planes: int
    stride: Ints3 = 1
    norm_groups: int = 8
    kernel_size: Ints3 = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.GroupNorm(num_groups=group_norm_groups(in_ch, self.norm_groups),
                         epsilon=1e-5, name="norm")(x)
        x = nn.relu(x)
        return conv3(self.planes, self.kernel_size, self.stride, use_bias=False,
                     name="conv")(x)


class MyronenkoResidualBlock(nn.Module):
    """Two pre-activation conv blocks + identity (1x1x1-projected on width change).

    Parity: `myronenko.py:34-58`.
    """
    planes: int
    stride: Ints3 = 1
    norm_groups: int = 8
    kernel_size: Ints3 = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        y = MyronenkoConvBlock(self.planes, self.stride, self.norm_groups,
                               self.kernel_size, name="conv1")(x)
        y = MyronenkoConvBlock(self.planes, self.stride, self.norm_groups,
                               self.kernel_size, name="conv2")(y)
        if x.shape[-1] != self.planes:
            identity = conv1(self.planes, use_bias=False, name="sample")(identity)
        return y + identity


class MyronenkoLayer(nn.Module):
    """n_blocks sequential blocks with channel-dropout after the first.

    Parity: `myronenko.py:61-80` (Dropout3d == whole-channel dropout -> broadcast
    over the spatial dims in NDHWC).
    """
    n_blocks: int
    planes: int
    norm_groups: int = 8
    kernel_size: Ints3 = 3
    dropout: Optional[float] = None
    block: Callable = MyronenkoResidualBlock

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.n_blocks):
            x = self.block(self.planes, norm_groups=self.norm_groups,
                           kernel_size=self.kernel_size, name=f"block{i}")(x)
            if i == 0 and self.dropout is not None:
                x = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2, 3),
                               deterministic=not train, name="dropout")(x)
        return x
