"""MONAI's generic ``UNet`` (recursive skip U-Net), config-resolvable by name.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`); ``UNet`` is MONAI's
canonical tutorial net. Native Flax/NDHWC implementation of the topology:

- recursive blocks: down (strided Convolution or ResidualUnit), skip-concat
  around the subblock, up (strided transposed Convolution [+ ResidualUnit when
  ``num_res_units > 0``]).
- Convolution = conv -> InstanceNorm -> Dropout -> PReLU (ADN "NDA" order).
- ResidualUnit = ``subunits`` convolutions with a (projected) residual add.

The MONAI class validates ``len(strides) == len(channels) - 1``; same here.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import FastConv, transposed_conv


class PReLU(nn.Module):
    """Channel-shared learnable leaky slope (torch PReLU default: one param)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def _norm_act(x: jnp.ndarray, norm: str, act: str, dropout: float,
              train: bool, parent, idx: int) -> jnp.ndarray:
    norm = (norm or "instance").lower()
    if norm == "instance":
        # torch InstanceNorm3d default: affine=False
        x = nn.GroupNorm(num_groups=x.shape[-1], use_bias=False, use_scale=False,
                         epsilon=1e-5, name=f"norm{idx}")(x)
    elif norm == "batch":
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name=f"norm{idx}")(x)
    if dropout:
        x = nn.Dropout(dropout, deterministic=not train)(x)
    act = (act or "prelu").lower()
    if act == "prelu":
        x = PReLU(name=f"act{idx}")(x)
    elif act == "leakyrelu":
        x = nn.leaky_relu(x, 0.01)
    else:
        x = nn.relu(x)
    return x


class Convolution(nn.Module):
    """conv/conv-transpose + Norm-Dropout-Act (monai.networks.blocks.Convolution)."""
    features: int
    strides: int = 1
    kernel_size: int = 3
    act: str = "prelu"
    norm: str = "instance"
    dropout: float = 0.0
    is_transposed: bool = False
    conv_only: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.is_transposed:
            x = transposed_conv(self.features, self.kernel_size, self.strides,
                                output_padding=self.strides - 1, name="conv")(x)
        elif self.dilation != 1:
            # dilated stages (AutoEncoder intermediate blocks) go through the
            # XLA conv directly; the decomp2d path assumes dilation 1
            x = nn.Conv(self.features, (self.kernel_size,) * 3,
                        strides=(self.strides,) * 3,
                        kernel_dilation=(self.dilation,) * 3,
                        padding=[((self.kernel_size - 1) // 2 * self.dilation,)
                                 * 2] * 3, name="conv")(x)
        else:
            x = FastConv(self.features, (self.kernel_size,) * 3,
                         strides=(self.strides,) * 3, name="conv")(x)
        if self.conv_only:
            return x
        return _norm_act(x, self.norm, self.act, self.dropout, train, self, 0)


class ResidualUnit(nn.Module):
    """``subunits`` conv+ADN stages with a residual add; the identity is
    strided/projected by a conv when shape changes."""
    features: int
    strides: int = 1
    kernel_size: int = 3
    subunits: int = 2
    act: str = "prelu"
    norm: str = "instance"
    dropout: float = 0.0
    last_conv_only: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        y = x
        for i in range(max(1, self.subunits)):
            strides = self.strides if i == 0 else 1
            if self.dilation != 1:
                y = nn.Conv(self.features, (self.kernel_size,) * 3,
                            strides=(strides,) * 3,
                            kernel_dilation=(self.dilation,) * 3,
                            padding=[((self.kernel_size - 1) // 2
                                      * self.dilation,) * 2] * 3,
                            name=f"conv{i}")(y)
            else:
                y = FastConv(self.features, (self.kernel_size,) * 3,
                             strides=(strides,) * 3, name=f"conv{i}")(y)
            if not (self.last_conv_only and i == self.subunits - 1):
                y = _norm_act(y, self.norm, self.act, self.dropout, train, self, i)
        if self.strides != 1 or identity.shape[-1] != self.features:
            identity = FastConv(self.features, (1, 1, 1),
                                strides=(self.strides,) * 3,
                                name="residual")(identity)
        return y + identity


class UNet(nn.Module):
    """MONAI UNet config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256)
    strides: Tuple[int, ...] = (2, 2, 2, 2)
    kernel_size: int = 3
    up_kernel_size: int = 3
    num_res_units: int = 0
    act: str = "prelu"
    norm: str = "instance"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu UNet is 3D")
        if len(self.strides) != len(self.channels) - 1:
            raise ValueError("len(strides) must be len(channels) - 1")

        def down(x, features, strides, is_top, name):
            if self.num_res_units > 0:
                return ResidualUnit(features, strides, self.kernel_size,
                                    self.num_res_units, self.act, self.norm,
                                    self.dropout, name=name)(x, train)
            return Convolution(features, strides, self.kernel_size, self.act,
                               self.norm, self.dropout, name=name)(x, train)

        def up(x, features, strides, is_top, name):
            x = Convolution(features, strides, self.up_kernel_size, self.act,
                            self.norm, self.dropout, is_transposed=True,
                            conv_only=is_top and self.num_res_units == 0,
                            name=f"{name}_t")(x, train)
            if self.num_res_units > 0:
                x = ResidualUnit(features, 1, self.kernel_size, 1, self.act,
                                 self.norm, self.dropout, last_conv_only=is_top,
                                 name=f"{name}_ru")(x, train)
            return x

        def block(x, channels, strides, out_c, is_top, depth):
            # mirrors monai UNet._create_block: down in->channels[0], recurse
            # (child up-projects back to channels[0]), concat skip, up -> out_c
            c, s = channels[0], strides[0]
            h = down(x, c, s, is_top, f"down_{depth}")
            if len(channels) > 2:
                inner = block(h, channels[1:], strides[1:], c, False, depth + 1)
            else:
                inner = down(h, channels[1], 1, False, f"bottom_{depth + 1}")
            cat = jnp.concatenate([h, inner], axis=-1)
            return up(cat, out_c, s, is_top, f"up_{depth}")

        return block(x, self.channels, self.strides, self.out_channels, True, 0)
