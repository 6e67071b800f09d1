"""EfficientNet-BN 3D classification family, config-resolvable by MONAI name.

Parity: the reference's model namespace exposes every `monai.networks.nets`
class (`/root/reference/unet3d/models/pytorch/__init__.py:1`);
``EfficientNetBN(model_name="efficientnet-b0..b7")`` is MONAI's port of the
Tan & Le 2019 family to N-D (monai/networks/nets/efficientnet.py). Native
Flax/NDHWC implementation of the topology:

- stem: conv3 stride 2 (no bias) -> BatchNorm -> swish
- 7 MBConv stages (kernel/stride/expand/channels/SE from the b0 table,
  width-scaled via ``round_filters`` with divisor 8 and depth-scaled via
  ``round_repeats``): 1x1 expand -> depthwise kxk -> squeeze-excite
  (reduction on the PRE-expand channels) -> 1x1 project, with drop-connect
  (stochastic depth, rate ramped linearly to ``drop_connect_rate``) on the
  identity-skip blocks
- head: 1x1 conv to round_filters(1280) -> BatchNorm -> swish -> global
  average pool -> dropout -> Dense(num_classes)

TPU notes: depthwise convs use ``feature_group_count`` (VPU-bound, small
fraction of FLOPs); all pointwise convs are MXU einsum-shaped. BatchNorm
statistics live in the ``batch_stats`` collection the trainer threads.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet3d_tpu.models.layers import PointwiseConv

# (num_repeat, kernel, stride, expand_ratio, in_ch, out_ch, se_ratio) — the
# efficientnet-b0 block args MONAI parses from "r1_k3_s11_e1_i32_o16_se0.25"...
_B0_BLOCKS = (
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
)

# model_name -> (width_coefficient, depth_coefficient, image_size, dropout)
_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}


def _round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def _bn(name: str, train: bool) -> nn.BatchNorm:
    # MONAI/official EfficientNet BN: momentum 0.99 (torch 1-0.01), eps 1e-3
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, name=name)


def _swish(x):
    return x * nn.sigmoid(x)


def _tf_same_pads(sizes, kernel: int, stride: int):
    """TF/MONAI 'same' pads per spatial dim: total = max((ceil(n/s)-1)*s+k-n, 0),
    split (total//2, total-total//2) — low side gets the SMALLER half
    (monai EfficientNet `_get_same_padding_conv_nd` + ConstantPad order)."""
    pads = []
    for n in sizes:
        total = max((-(-int(n) // stride) - 1) * stride + kernel - int(n), 0)
        pads.append((total // 2, total - total // 2))
    return tuple(pads)


class MBConvBlock(nn.Module):
    kernel: int
    stride: int
    expand_ratio: int
    out_channels: int
    se_ratio: float
    drop_connect: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        identity = x
        y = x
        if self.expand_ratio != 1:
            y = PointwiseConv(mid, use_bias=False, name="expand_conv")(y)
            y = _swish(_bn("bn0", train)(y))
        # depthwise conv with MONAI's TF-style "same" padding — asymmetric
        # (lo = total//2, hi = total - total//2), e.g. (0,1) for k3 s2 on
        # even sizes; shapes are static under jit so the pads resolve at
        # trace time exactly like MONAI's _make_same_padder
        y = nn.Conv(mid, (self.kernel,) * 3, strides=(self.stride,) * 3,
                    padding=_tf_same_pads(y.shape[1:4], self.kernel,
                                          self.stride),
                    feature_group_count=mid,
                    use_bias=False, name="depthwise_conv")(y)
        y = _swish(_bn("bn1", train)(y))
        if self.se_ratio > 0:
            se_ch = max(1, int(in_ch * self.se_ratio))
            s = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
            s = PointwiseConv(se_ch, name="se_reduce")(s)
            s = PointwiseConv(mid, name="se_expand")(_swish(s))
            y = y * nn.sigmoid(s)
        y = PointwiseConv(self.out_channels, use_bias=False,
                          name="project_conv")(y)
        y = _bn("bn2", train)(y)
        if self.stride == 1 and in_ch == self.out_channels:
            if self.drop_connect > 0 and train:
                keep = 1.0 - self.drop_connect
                mask = jax.random.bernoulli(self.make_rng("dropout"), keep,
                                            (y.shape[0], 1, 1, 1, 1))
                y = y * mask.astype(y.dtype) / keep
            y = y + identity
        return y


class EfficientNetBN(nn.Module):
    """monai.networks.nets.EfficientNetBN config surface (spatial_dims=3)."""
    model_name: str = "efficientnet-b0"
    spatial_dims: int = 3
    in_channels: int = 1
    num_classes: int = 2
    dropout_rate: Optional[float] = None   # None -> the model_name default
    drop_connect_rate: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu EfficientNetBN is 3D")
        if self.model_name not in _PARAMS:
            raise ValueError(f"unknown EfficientNet variant {self.model_name}; "
                             f"supported: {sorted(_PARAMS)}")
        width, depth, _, default_drop = _PARAMS[self.model_name]
        dropout = (default_drop if self.dropout_rate is None
                   else self.dropout_rate)

        y = nn.Conv(_round_filters(32, width), (3, 3, 3), strides=(2, 2, 2),
                    padding=_tf_same_pads(x.shape[1:4], 3, 2),
                    use_bias=False, name="stem_conv")(x)
        y = _swish(_bn("stem_bn", train)(y))

        total_blocks = sum(_round_repeats(r, depth) for r, *_ in _B0_BLOCKS)
        block_idx = 0
        for si, (r, k, s, e, ci, co, se) in enumerate(_B0_BLOCKS):
            repeats = _round_repeats(r, depth)
            out_ch = _round_filters(co, width)
            for j in range(repeats):
                rate = self.drop_connect_rate * block_idx / total_blocks
                y = MBConvBlock(kernel=k, stride=s if j == 0 else 1,
                                expand_ratio=e, out_channels=out_ch,
                                se_ratio=se, drop_connect=rate,
                                name=f"block{si}_{j}")(y, train)
                block_idx += 1

        y = PointwiseConv(_round_filters(1280, width), use_bias=False,
                          name="head_conv")(y)
        y = _swish(_bn("head_bn", train)(y))
        y = jnp.mean(y, axis=(1, 2, 3))
        if dropout:
            y = nn.Dropout(dropout, deterministic=not train)(y)
        return nn.Dense(self.num_classes, name="fc")(y)
