"""Myronenko (BraTS-2018-winner style) encoders.

Parity: `unet3d/models/pytorch/classification/myronenko.py:83-114` and the
skip-collecting variant `unet3d/models/pytorch/segmentation/unet.py:8-16`.
Per-level residual-block counts [1, 2, 2, 4], width = base_width * dilation^i,
stride-2 conv downsampling between levels, channel dropout(0.2) in level 0.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import MyronenkoLayer, conv3


class MyronenkoEncoder(nn.Module):
    base_width: int = 32
    layer_blocks: Tuple[int, ...] = (1, 2, 2, 4)
    feature_dilation: int = 2
    downsampling_stride: int = 2
    dropout: Optional[float] = 0.2
    layer_widths: Optional[Tuple[int, ...]] = None
    kernel_size: int = 3
    collect_skips: bool = False

    def level_width(self, i: int) -> int:
        if self.layer_widths is not None:
            return int(self.layer_widths[i])
        return int(self.base_width * (self.feature_dilation ** i))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        skips: List[jnp.ndarray] = []
        n_levels = len(self.layer_blocks)
        for i, n_blocks in enumerate(self.layer_blocks):
            out_width = self.level_width(i)
            layer_dropout = self.dropout if (self.dropout and i == 0) else None
            x = MyronenkoLayer(n_blocks=n_blocks, planes=out_width,
                               kernel_size=self.kernel_size, dropout=layer_dropout,
                               name=f"layer{i}")(x, train=train)
            if i != n_levels - 1:
                if self.collect_skips:
                    skips.insert(0, x)
                x = conv3(out_width, self.kernel_size, self.downsampling_stride,
                          use_bias=False,
                          name=f"down{i}")(x)
        if self.collect_skips:
            skips.insert(0, x)
            return skips
        return x


class UNetEncoder(MyronenkoEncoder):
    """Encoder that returns per-level outputs deepest-first (`unet.py:8-16`)."""
    collect_skips: bool = True
