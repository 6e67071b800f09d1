"""AttentionUnet — Oktay et al. 2018, config-resolvable by its MONAI name.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`). Native Flax/NDHWC
implementation of the ``monai.networks.nets.AttentionUnet`` topology:

- encoder: ConvBlock (2 x conv3 -> BatchNorm -> ReLU) per level, strided convs
  between levels per ``strides``.
- decoder: recursive AttentionLayer — upsample the deeper output with a
  transposed conv (+BN+ReLU), gate the same-level encoder features with an
  additive attention block (psi = sigmoid(BN(conv1(relu(W_g g + W_x x))))),
  concat and merge with a single monai Convolution
  (conv3 -> InstanceNorm -> dropout -> PReLU, the default ADN).
- pointwise head to ``out_channels``.

BatchNorm statistics live in the ``batch_stats`` collection the trainer
threads (see models/resnet.py).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import FastConv, conv1, transposed_conv
from unet3d_tpu.models.monai_unet import Convolution


def _bn(name: str, train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class ConvBlock(nn.Module):
    features: int
    strides: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = FastConv(self.features, (3, 3, 3),
                     strides=(self.strides,) * 3, name="conv0")(x)
        x = _bn("bn0", train)(x)
        x = nn.relu(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = FastConv(self.features, (3, 3, 3), name="conv1")(x)
        x = _bn("bn1", train)(x)
        return nn.relu(x)


class AttentionBlock(nn.Module):
    """Additive attention gate: x * sigmoid(BN(conv1(relu(W_g g + W_x x))))."""
    f_int: int

    @nn.compact
    def __call__(self, g: jnp.ndarray, x: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        wg = conv1(self.f_int, use_bias=True, name="W_g")(g)
        wg = _bn("bn_g", train)(wg)
        wx = conv1(self.f_int, use_bias=True, name="W_x")(x)
        wx = _bn("bn_x", train)(wx)
        psi = conv1(1, use_bias=True, name="psi")(nn.relu(wg + wx))
        psi = _bn("bn_psi", train)(psi)
        return x * nn.sigmoid(psi)


class UpConv(nn.Module):
    features: int
    strides: int = 2
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = transposed_conv(self.features, self.kernel_size, self.strides,
                            output_padding=self.strides - 1, name="up")(x)
        x = _bn("bn", train)(x)
        return nn.relu(x)


class AttentionUnet(nn.Module):
    """MONAI AttentionUnet config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    strides: Tuple[int, ...] = (2, 2, 2)
    kernel_size: int = 3
    up_kernel_size: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu AttentionUnet is 3D")
        ch = self.channels
        # encoder
        feats = [ConvBlock(ch[0], dropout=self.dropout, name="conv0")(x, train)]
        for i in range(1, len(ch)):
            feats.append(ConvBlock(ch[i], strides=self.strides[i - 1],
                                   dropout=self.dropout,
                                   name=f"down{i}")(feats[-1], train))
        # decoder with attention gates, deepest-first
        y = feats[-1]
        for i in range(len(ch) - 2, -1, -1):
            skip = feats[i]
            up = UpConv(ch[i], strides=self.strides[i],
                        kernel_size=self.up_kernel_size,
                        name=f"upconv{i}")(y, train)
            att = AttentionBlock(max(ch[i] // 2, 1),
                                 name=f"att{i}")(up, skip, train)
            # MONAI AttentionLayer.merge: one default Convolution, not a ConvBlock.
            y = Convolution(ch[i], dropout=self.dropout, name=f"merge{i}")(
                jnp.concatenate([att, up], axis=-1), train)
        return conv1(self.out_channels, use_bias=True, name="head")(y)
