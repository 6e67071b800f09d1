"""DenseNet 3D classification family, config-resolvable by MONAI names.

Parity: the reference's model namespace exposes every `monai.networks.nets`
class (`/root/reference/unet3d/models/pytorch/__init__.py:1`), whose
classification nets are the DenseNet family (monai.networks.nets.densenet).
Native Flax/NDHWC implementation of the torchvision-derived topology MONAI
ports to 3D:

- stem: conv7 stride 2 (no bias) -> BatchNorm -> ReLU -> maxpool3 stride 2
- dense blocks: each DenseLayer is BN -> ReLU -> conv1 (bn_size*growth) ->
  BN -> ReLU -> conv3 (growth) [-> dropout], output concatenated to its input
- transitions: BN -> ReLU -> conv1 halving channels -> avgpool2 stride 2
- head: BN -> ReLU -> global average pool -> Dense(out_channels)

BatchNorm statistics live in the ``batch_stats`` collection the trainer
threads (see models/resnet.py).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import FastConv, PointwiseConv


def _bn(name: str, train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    dropout_prob: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.relu(_bn("norm1", train)(x))
        y = PointwiseConv(self.bn_size * self.growth_rate, use_bias=False,
                          name="conv1")(y)
        y = nn.relu(_bn("norm2", train)(y))
        y = FastConv(self.growth_rate, (3, 3, 3), use_bias=False,
                     name="conv2")(y)
        if self.dropout_prob > 0:
            y = nn.Dropout(self.dropout_prob, deterministic=not train)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """monai.networks.nets.DenseNet config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    init_features: int = 64
    growth_rate: int = 32
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    bn_size: int = 4
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu DenseNet is 3D")
        x = FastConv(self.init_features, (7, 7, 7), strides=(2, 2, 2),
                     use_bias=False, name="conv0")(x)
        x = nn.relu(_bn("norm0", train)(x))
        # torch-parity symmetric (1,1) pads: XLA "SAME" places strided-pool
        # windows lo=0/hi=1 on even sizes, offsetting every window by one
        # voxel vs torch MaxPool3d(3, 2, padding=1) (see models/resnet.py).
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 1),) * 3)

        channels = self.init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(self.growth_rate, self.bn_size,
                               self.dropout_prob,
                               name=f"block{i}_layer{j}")(x, train)
            channels += n_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                x = nn.relu(_bn(f"transition{i}_norm", train)(x))
                channels //= 2
                x = PointwiseConv(channels, use_bias=False,
                                  name=f"transition{i}_conv")(x)
                x = nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))

        x = nn.relu(_bn("norm5", train)(x))
        x = jnp.mean(x, axis=(1, 2, 3))  # global average pool
        return nn.Dense(self.out_channels, name="class_layers_out")(x)


def DenseNet121(**kwargs):
    kwargs.setdefault("init_features", 64)
    kwargs.setdefault("growth_rate", 32)
    kwargs.setdefault("block_config", (6, 12, 24, 16))
    return DenseNet(**kwargs)


def DenseNet169(**kwargs):
    kwargs.setdefault("init_features", 64)
    kwargs.setdefault("growth_rate", 32)
    kwargs.setdefault("block_config", (6, 12, 32, 32))
    return DenseNet(**kwargs)


def DenseNet201(**kwargs):
    kwargs.setdefault("init_features", 64)
    kwargs.setdefault("growth_rate", 32)
    kwargs.setdefault("block_config", (6, 12, 48, 32))
    return DenseNet(**kwargs)


def DenseNet264(**kwargs):
    kwargs.setdefault("init_features", 64)
    kwargs.setdefault("growth_rate", 32)
    kwargs.setdefault("block_config", (6, 12, 64, 48))
    return DenseNet(**kwargs)
