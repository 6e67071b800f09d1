"""DynUNet — the configurable-topology U-Net that is the reference's de-facto
default model (`examples/brats2020/brats2020_config.json` model section resolves
to MONAI ``DynUNet`` through the namespace at
`unet3d/models/pytorch/__init__.py:1-4`).

nnU-Net style: per-level strides/filters/kernel sizes, instance-norm + leaky-ReLU
conv blocks (optionally residual), transposed-conv upsampling with skip concat,
optional deep supervision heads (stacked along axis 1 at train time). NDHWC
layout; convs are bias-free ahead of the norm, matching the conv->norm->act
pattern.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.models.layers import (FastConv, PointwiseConv, _triple,
                                      transposed_conv)
from unet3d_tpu.ops.interpolate import resize_ndhwc

IntsOrSeq = Union[int, Sequence[int]]


def _instance_norm(channels: int, name: str) -> nn.GroupNorm:
    # InstanceNorm(affine=True) == GroupNorm with one channel per group.
    return nn.GroupNorm(num_groups=channels, epsilon=1e-5, name=name)


class _StatsInstanceNorm(nn.Module):
    """Instance norm applied from precomputed (sum, sum_sq) stats.

    Numerically the two-moment form flax GroupNorm uses (E[x^2] - E[x]^2,
    eps 1e-5, f32 stats), but the stats arrive from the conv's fused VMEM
    epilogue (`ops/conv3d.conv3d_with_stats`) instead of a fresh pass over
    the conv output. Param tree ('scale', 'bias') matches nn.GroupNorm, so
    checkpoints interchange with the unfused path."""
    channels: int

    @nn.compact
    def __call__(self, y: jnp.ndarray, s1: jnp.ndarray,
                 s2: jnp.ndarray) -> jnp.ndarray:
        from unet3d_tpu.ops.norm import (instance_norm_from_stats,
                                         use_custom_in_vjp)
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if use_custom_in_vjp():
            # OPT-IN (UNET3D_TPU_IN_VJP=1) canonical one-pass norm backward;
            # measured 4 ms/step SLOWER in the full train step than XLA's
            # derived gradient — see ops/norm.py module note
            return instance_norm_from_stats(y, s1, s2, scale, bias, 1e-5)
        m = float(np.prod(y.shape[1:4]))
        mean = s1 / m                                    # (N, C) f32
        var = jnp.maximum(s2 / m - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + 1e-5) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        out = (y.astype(jnp.float32) * inv[:, None, None, None, :]
               + shift[:, None, None, None, :])
        return out.astype(y.dtype)


def _conv_in_lrelu(parent_x, features: int, kernel_size, stride,
                   conv_name: str, norm_name: str, act: bool = True):
    """conv -> instance norm [-> leaky relu] with the fused-stats epilogue."""
    y, s1, s2 = FastConv(features, _triple(kernel_size),
                         strides=_triple(stride), use_bias=False,
                         with_stats=True, name=conv_name)(parent_x)
    y = _StatsInstanceNorm(features, name=norm_name)(y, s1, s2)
    return _lrelu(y) if act else y


def _fused_in() -> bool:
    """Conv + instance-norm-stats fusion (default on; UNET3D_TPU_FUSED_IN=0
    restores the plain GroupNorm path — identical params and numerics)."""
    return os.environ.get("UNET3D_TPU_FUSED_IN", "1") != "0"


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=0.01)


class UnetBasicBlock(nn.Module):
    """conv(stride)-IN-lrelu -> conv(1)-IN-lrelu.

    ``x`` may be a tuple (upsampled, skip): conv1 then convolves the virtual
    channel-concat via a kernel split (see FastConv), exactly equivalent to
    MONAI's cat + conv but without materializing the concat."""
    out_channels: int
    kernel_size: IntsOrSeq = 3
    stride: IntsOrSeq = 1

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        if _fused_in():
            x = _conv_in_lrelu(x, self.out_channels, self.kernel_size,
                               self.stride, "conv1", "norm1")
            return _conv_in_lrelu(x, self.out_channels, self.kernel_size,
                                  1, "conv2", "norm2")
        x = FastConv(self.out_channels, _triple(self.kernel_size),
                     strides=_triple(self.stride), use_bias=False,
                     name="conv1")(x)
        x = _lrelu(_instance_norm(self.out_channels, "norm1")(x))
        x = FastConv(self.out_channels, _triple(self.kernel_size),
                     strides=(1, 1, 1), use_bias=False, name="conv2")(x)
        return _lrelu(_instance_norm(self.out_channels, "norm2")(x))


class UnetResBlock(nn.Module):
    """Basic block + projected residual (res_block=True config flag)."""
    out_channels: int
    kernel_size: IntsOrSeq = 3
    stride: IntsOrSeq = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        if _fused_in():
            y = _conv_in_lrelu(x, self.out_channels, self.kernel_size,
                               self.stride, "conv1", "norm1")
            y = _conv_in_lrelu(y, self.out_channels, self.kernel_size,
                               1, "conv2", "norm2", act=False)
        else:
            y = FastConv(self.out_channels, _triple(self.kernel_size),
                         strides=_triple(self.stride), use_bias=False,
                         name="conv1")(x)
            y = _lrelu(_instance_norm(self.out_channels, "norm1")(y))
            y = FastConv(self.out_channels, _triple(self.kernel_size),
                         strides=(1, 1, 1), use_bias=False, name="conv2")(y)
            y = _instance_norm(self.out_channels, "norm2")(y)
        if x.shape[-1] != self.out_channels or any(s != 1 for s in _triple(self.stride)):
            if _triple(self.stride) == (1, 1, 1):
                identity = PointwiseConv(self.out_channels, use_bias=False,
                                         name="conv3")(identity)
            else:
                identity = nn.Conv(self.out_channels, (1, 1, 1),
                                   strides=_triple(self.stride), padding="VALID",
                                   use_bias=False, name="conv3")(identity)
            identity = _instance_norm(self.out_channels, "norm3")(identity)
        return _lrelu(y + identity)


class UnetUpBlock(nn.Module):
    """Transposed-conv upsample -> concat skip -> basic block."""
    out_channels: int
    kernel_size: IntsOrSeq
    upsample_kernel_size: IntsOrSeq

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = transposed_conv(self.out_channels, self.upsample_kernel_size,
                            self.upsample_kernel_size, use_bias=False,
                            name="transp_conv")(x)
        # NOTE: convolving the (up, skip) pair via a kernel split instead of
        # materializing the concat measured SLOWER end-to-end (136 vs 130
        # ms/step) — XLA fuses the concat into the conv reads and the split
        # form picks worse emitters. Keep MONAI's cat + conv.
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetBasicBlock(self.out_channels, self.kernel_size, 1,
                              name="conv_block")(x)


class DynUNet(nn.Module):
    """Configurable U-Net with the reference config's exact model-section schema:
    in_channels / out_channels / spatial_dims / kernel_size / strides /
    upsample_kernel_size / filters / deep_supervision (+ res_block, deep_supr_num).
    """
    in_channels: int = 1
    out_channels: int = 1
    spatial_dims: int = 3
    kernel_size: Tuple = ((3, 3, 3),) * 6
    strides: Tuple = ((1, 1, 1),) + ((2, 2, 2),) * 5
    upsample_kernel_size: Tuple = ((2, 2, 2),) * 5
    filters: Optional[Tuple[int, ...]] = None
    deep_supervision: bool = False
    deep_supr_num: int = 1
    res_block: bool = False
    # Rematerialize per block: the backward pass recomputes each block's
    # internal activations from its (stored) input instead of keeping them
    # live, cutting peak HBM far below whole-model nn.remat while recomputing
    # less. Framework extension (config `model.remat`); measured on one v5e:
    # 160^3 batch-1 training fits (OOM without), see PERF.md.
    remat: bool = False

    def _filters(self) -> Tuple[int, ...]:
        if self.filters is not None:
            return tuple(int(f) for f in self.filters)
        return tuple(min(2 ** (5 + i), 320) for i in range(len(self.strides)))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu DynUNet is 3D")
        filters = self._filters()
        n = len(self.strides)
        block = UnetResBlock if self.res_block else UnetBasicBlock
        up_block = UnetUpBlock
        if self.remat:
            block = nn.remat(block)
            up_block = nn.remat(UnetUpBlock)

        # Level-boundary sharding anchors: no-ops under a single-device jit;
        # under a (data, space) mesh they pin each level's activation (and its
        # cotangent) to a consistent layout — without them SPMD derived
        # conflicting forward/backward shardings at levels where D shrank
        # below the space axis and fell back to full rematerialization
        # (parallel/mesh.py activation_spec).
        from unet3d_tpu.parallel.mesh import constrain_activation

        skips = []
        x = block(filters[0], self.kernel_size[0], self.strides[0], name="input_block")(x)
        x = constrain_activation(x)
        skips.append(x)
        for i in range(1, n - 1):
            x = block(filters[i], self.kernel_size[i], self.strides[i],
                      name=f"downsample{i - 1}")(x)
            x = constrain_activation(x)
            skips.append(x)
        x = block(filters[n - 1], self.kernel_size[n - 1], self.strides[n - 1],
                  name="bottleneck")(x)
        x = constrain_activation(x)

        heads = []
        for i in range(n - 2, -1, -1):
            x = up_block(filters[i], self.kernel_size[i + 1],
                         self.upsample_kernel_size[i],
                         name=f"upsample{n - 2 - i}")(x, skips[i])
            x = constrain_activation(x)
            if self.deep_supervision and 0 < i <= self.deep_supr_num:
                heads.append(PointwiseConv(self.out_channels,
                                           name=f"deep_supervision_head{i}")(x))

        out = PointwiseConv(self.out_channels, name="output_block")(x)
        if self.deep_supervision and train:
            full = out.shape[1:4]
            ups = [resize_ndhwc(h, full, mode="nearest") for h in reversed(heads)]
            return jnp.stack([out] + ups, axis=1)
        return out
