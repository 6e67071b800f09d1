"""3D ResNet / ResNeXt classifiers (NDHWC, Flax).

Parity: `unet3d/models/pytorch/classification/resnet.py` (torchvision ResNet
ported to 3D: 7-cubed stride-2 stem, 3-cubed stride-2 maxpool, four stages,
global average pool, linear head; ResNeXt via groups/width_per_group).
BatchNorm uses the Flax ``batch_stats`` collection; the trainer threads it.
"""
from __future__ import annotations


from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _bn(name: str, train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        name=name)


class BasicBlock(nn.Module):
    expansion = 1
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.planes, (3, 3, 3), strides=(self.stride,) * 3,
                      padding=((1, 1),) * 3, use_bias=False, name="conv1")(x)
        out = nn.relu(_bn("bn1", train)(out))
        out = nn.Conv(self.planes, (3, 3, 3), padding=((1, 1),) * 3,
                      use_bias=False, name="conv2")(out)
        out = _bn("bn2", train)(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes, (1, 1, 1), strides=(self.stride,) * 3,
                               padding="VALID", use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1, 1), padding="VALID", use_bias=False, name="conv1")(x)
        out = nn.relu(_bn("bn1", train)(out))
        out = nn.Conv(width, (3, 3, 3), strides=(self.stride,) * 3,
                      padding=((1, 1),) * 3, feature_group_count=self.groups,
                      use_bias=False, name="conv2")(out)
        out = nn.relu(_bn("bn2", train)(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1, 1), padding="VALID",
                      use_bias=False, name="conv3")(out)
        out = _bn("bn3", train)(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1, 1),
                               strides=(self.stride,) * 3, padding="VALID",
                               use_bias=False, name="downsample_conv")(x)
            identity = _bn("downsample_bn", train)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Parity: `resnet.py:135-227`. ``features_only`` exposes the pooled latent
    (for the hybrid encoders in custom.py)."""
    block: Any = BasicBlock
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    n_outputs: int = 1000
    groups: int = 1
    width_per_group: int = 64
    n_features: int = 3  # input channels; Flax infers, kept for config parity
    features_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # torch-parity symmetric padding (k//2 both sides); XLA "SAME" pads
        # lo=0/hi=1-style asymmetrically on even sizes at stride 2, which
        # shifts the stem/blocks one voxel against the reference
        x = nn.Conv(64, (7, 7, 7), strides=(2, 2, 2), padding=((3, 3),) * 3,
                    use_bias=False, name="conv1")(x)
        x = nn.relu(_bn("bn1", train)(x))
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3)
        in_planes = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_down = b == 0 and (s != 1 or in_planes != planes * self.block.expansion)
                x = self.block(planes=planes, stride=s, groups=self.groups,
                               base_width=self.width_per_group, has_downsample=has_down,
                               name=f"layer{stage + 1}_block{b}")(x, train=train)
                in_planes = planes * self.block.expansion
        x = jnp.mean(x, axis=(1, 2, 3))  # AdaptiveAvgPool3d(1) + flatten
        if self.features_only:
            return x
        return nn.Dense(self.n_outputs, name="fc")(x)


def resnet_18(**kwargs) -> ResNet:
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kwargs)


def resnet_34(**kwargs) -> ResNet:
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kwargs)


def resnet_50(**kwargs) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kwargs)


def resnet_101(**kwargs) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), **kwargs)


def resnet_152(**kwargs) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 8, 36, 3), **kwargs)


def resnext_50_32x4d(**kwargs) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), groups=32,
                  width_per_group=4, **kwargs)


def resnext_101_32x8d(**kwargs) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), groups=32,
                  width_per_group=8, **kwargs)
