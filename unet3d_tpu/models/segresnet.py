"""SegResNet — MONAI's Myronenko-family segmentation net, config-resolvable.

Parity: the reference makes every MONAI net reachable by config ``name``
through `unet3d/models/pytorch/__init__.py:1` (``from monai.networks.nets
import *``); SegResNet is the published-BraTS-paper architecture and the most
named after DynUNet. This module re-implements MONAI's
``monai.networks.nets.SegResNet`` topology natively in Flax/NDHWC:

- init 3-cubed conv to ``init_filters``
- encoder: per-level pre-activation residual blocks (GroupNorm(8) -> ReLU ->
  conv), ``blocks_down`` counts, stride-2 conv entering each level after the
  first, width doubling per level
- decoder: per-level 1-cubed conv halving width + non-trainable trilinear
  upsample, add the skip, then ``blocks_up`` residual blocks
- final GroupNorm -> ReLU -> 1-cubed conv head

The residual block is exactly the in-repo Myronenko block
(`unet3d_tpu/models/layers.py` MyronenkoResidualBlock) — SegResNet *is* that
family; only the level plumbing differs from MyronenkoEncoder (dropout placed
after the init conv, additive skips instead of concat).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import (MyronenkoResidualBlock, conv1, conv3,
                                      group_norm_groups)
from unet3d_tpu.ops.interpolate import resize_ndhwc


class SegResNet(nn.Module):
    """MONAI SegResNet config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    init_filters: int = 8
    in_channels: int = 1
    out_channels: int = 2
    dropout_prob: Optional[float] = None
    norm_groups: int = 8
    blocks_down: Tuple[int, ...] = (1, 2, 2, 4)
    blocks_up: Tuple[int, ...] = (1, 1, 1)
    upsample_mode: str = "nontrainable"
    use_conv_final: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu SegResNet is 3D")
        x = conv3(self.init_filters, 3, 1, name="convInit")(x)
        if self.dropout_prob is not None:
            x = nn.Dropout(rate=self.dropout_prob, deterministic=not train,
                           name="dropout")(x)

        skips = []
        for i, n_blocks in enumerate(self.blocks_down):
            width = self.init_filters * (2 ** i)
            if i > 0:
                x = conv3(width, 3, 2, name=f"down{i}")(x)
            for b in range(n_blocks):
                x = MyronenkoResidualBlock(width, norm_groups=self.norm_groups,
                                           name=f"layer{i}_block{b}")(x)
            skips.append(x)

        up_skips = skips[:-1][::-1]  # deepest-first, excluding the bottleneck
        for i, n_blocks in enumerate(self.blocks_up):
            width = x.shape[-1] // 2
            x = conv1(width, name=f"up{i}_conv")(x)
            d, h, w = x.shape[1:4]
            x = resize_ndhwc(x, (2 * d, 2 * h, 2 * w),
                             mode="trilinear" if self.upsample_mode
                             in ("nontrainable", "trilinear") else "nearest")
            x = x + up_skips[i]
            for b in range(n_blocks):
                x = MyronenkoResidualBlock(width, norm_groups=self.norm_groups,
                                           name=f"up{i}_block{b}")(x)

        if self.use_conv_final:
            x = nn.GroupNorm(num_groups=group_norm_groups(x.shape[-1],
                                                          self.norm_groups),
                             name="final_norm")(x)
            x = nn.relu(x)
            x = conv1(self.out_channels, name="conv_final")(x)
        return x
