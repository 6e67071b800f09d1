"""BasicUNet — MONAI's plain two-conv U-Net, config-resolvable by name.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`). Native Flax/NDHWC
implementation of the ``monai.networks.nets.BasicUNet`` topology:

- features (32, 32, 64, 128, 256, 32): conv_0 TwoConv at full resolution,
  4 Down blocks (2-cubed max-pool then TwoConv), 4 UpCat blocks (transposed
  conv k2 s2, pad-to-match, concat skip, TwoConv), final pointwise conv.
- TwoConv = 2 x (3-cubed conv -> InstanceNorm(affine) -> LeakyReLU(0.1)).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import FastConv, conv1, transposed_conv


class _ConvNormAct(nn.Module):
    features: int
    negative_slope: float = 0.1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = FastConv(self.features, (3, 3, 3), name="conv")(x)
        # instance norm with affine=True == GroupNorm(groups=channels) + scale/bias
        x = nn.GroupNorm(num_groups=self.features, epsilon=1e-5, name="norm")(x)
        if self.dropout > 0:
            # MONAI Convolution ADN ordering "NDA": norm -> dropout -> act
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.leaky_relu(x, self.negative_slope)


class TwoConv(nn.Module):
    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _ConvNormAct(self.features, dropout=self.dropout,
                         name="conv_0")(x, train)
        return _ConvNormAct(self.features, dropout=self.dropout,
                            name="conv_1")(x, train)


def _max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))


def _pad_to_match(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Pad odd spatial mismatches before concat (MONAI UpCat uses
    F.pad(..., 'replicate'), so boundary values are edge-replicated)."""
    pads = [(0, 0)]
    for i in range(1, 4):
        pads.append((0, max(ref.shape[i] - x.shape[i], 0)))
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads, mode="edge")
    return x


class UpCat(nn.Module):
    up_features: int   # channels after the transposed conv
    out_features: int  # TwoConv output width
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        x = transposed_conv(self.up_features, 2, 2, name="upsample")(x)
        x = _pad_to_match(x, skip)
        x = jnp.concatenate([skip, x], axis=-1)
        return TwoConv(self.out_features, dropout=self.dropout,
                       name="convs")(x, train)


class BasicUNet(nn.Module):
    """MONAI BasicUNet config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    features: Tuple[int, ...] = (32, 32, 64, 128, 256, 32)
    dropout: float = 0.0
    upsample: str = "deconv"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu BasicUNet is 3D")
        fea, dr = self.features, self.dropout
        x0 = TwoConv(fea[0], dr, name="conv_0")(x, train)
        x1 = TwoConv(fea[1], dr, name="down_1")(_max_pool2(x0), train)
        x2 = TwoConv(fea[2], dr, name="down_2")(_max_pool2(x1), train)
        x3 = TwoConv(fea[3], dr, name="down_3")(_max_pool2(x2), train)
        x4 = TwoConv(fea[4], dr, name="down_4")(_max_pool2(x3), train)
        # UpCat(in, cat, out): up channels halve except the topmost block
        u4 = UpCat(fea[4] // 2, fea[3], dr, name="upcat_4")(x4, x3, train)
        u3 = UpCat(fea[3] // 2, fea[2], dr, name="upcat_3")(u4, x2, train)
        u2 = UpCat(fea[2] // 2, fea[1], dr, name="upcat_2")(u3, x1, train)
        u1 = UpCat(fea[1], fea[5], dr, name="upcat_1")(u2, x0, train)
        return conv1(self.out_channels, name="final_conv")(u1)
