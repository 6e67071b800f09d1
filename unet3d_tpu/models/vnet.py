"""VNet — Milletari et al. 2016, config-resolvable by its MONAI name.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`). This is a native
Flax/NDHWC implementation of the ``monai.networks.nets.VNet`` topology:

- InputTransition: 5-cubed conv ``in -> 16`` + BatchNorm + act, residual with
  the input broadcast-repeated to 16 channels.
- 4 DownTransitions: 2-cubed stride-2 conv doubling channels + BN + act, then
  (1, 2, 3, 2) LUConvs (5-cubed conv + BN + act), residual add; dropout on the
  two deepest levels.
- 4 UpTransitions: 2-cubed stride-2 transposed conv to ``out//2`` channels +
  BN + act, concat with the skip, (2, 2, 1, 1) LUConvs, residual add.
- OutputTransition: 5-cubed conv -> ``out_channels`` + BN + act, then a
  pointwise conv.

ELU activation by default (MONAI's); channels-last so the 5-cubed convs tile
onto the MXU. BatchNorm statistics live in the ``batch_stats`` collection the
trainer already threads (see models/resnet.py).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import FastConv, conv1, transposed_conv


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name.lower() == "elu":
        return nn.elu(x)
    if name.lower() == "prelu":
        # MONAI default is ELU; PReLU would need a param — use leaky as the
        # deterministic stand-in when configured.
        return nn.leaky_relu(x, 0.25)
    return nn.relu(x)


def _bn(name: str, train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class LUConv(nn.Module):
    """5-cubed conv + BN + act (MONAI vnet.LUConv)."""
    features: int
    act: str = "elu"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = FastConv(self.features, (5, 5, 5), use_bias=self.use_bias,
                     name="conv")(x)
        x = _bn("bn", train)(x)
        return _act(self.act, x)


class InputTransition(nn.Module):
    out_channels: int = 16
    act: str = "elu"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        y = FastConv(self.out_channels, (5, 5, 5), use_bias=self.use_bias,
                     name="conv")(x)
        y = _bn("bn", train)(y)
        # repeat the input across channels to 16 (MONAI InputTransition)
        reps = self.out_channels // in_ch
        x16 = jnp.concatenate([x] * reps, axis=-1) if reps > 1 else x
        if x16.shape[-1] != self.out_channels:
            x16 = jnp.pad(x16, [(0, 0)] * (x.ndim - 1)
                          + [(0, self.out_channels - x16.shape[-1])])
        return _act(self.act, y + x16)


class DownTransition(nn.Module):
    out_channels: int
    n_convs: int
    dropout: Optional[float] = None
    act: str = "elu"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        down = nn.Conv(self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                       padding="VALID", use_bias=self.use_bias,
                       name="down_conv")(x)
        down = _bn("bn", train)(down)
        down = _act(self.act, down)
        y = down
        if self.dropout is not None:
            # MONAI dropout_dim=3 -> Dropout3d: whole-channel dropout
            y = nn.Dropout(self.dropout, broadcast_dims=(1, 2, 3),
                           deterministic=not train)(y)
        for i in range(self.n_convs):
            y = LUConv(self.out_channels, self.act, self.use_bias,
                       name=f"conv{i}")(y, train)
        return _act(self.act, y + down)


class UpTransition(nn.Module):
    out_channels: int
    n_convs: int
    dropout: Optional[float] = None
    act: str = "elu"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        if self.dropout is not None:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2, 3),
                           deterministic=not train)(x)
        skip = nn.Dropout(0.5, broadcast_dims=(1, 2, 3),
                          deterministic=not train)(skip)
        up = transposed_conv(self.out_channels // 2, 2, 2,
                             use_bias=self.use_bias, name="up_conv")(x)
        up = _bn("bn", train)(up)
        up = _act(self.act, up)
        xcat = jnp.concatenate([up, skip], axis=-1)
        y = xcat
        for i in range(self.n_convs):
            y = LUConv(self.out_channels, self.act, self.use_bias,
                       name=f"conv{i}")(y, train)
        return _act(self.act, y + xcat)


class OutputTransition(nn.Module):
    out_channels: int
    act: str = "elu"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = FastConv(self.out_channels, (5, 5, 5), use_bias=self.use_bias,
                     name="conv")(x)
        y = _bn("bn", train)(y)
        y = _act(self.act, y)
        # MONAI's final pointwise conv2 keeps its (default) bias
        return conv1(self.out_channels, name="conv2")(y)


class VNet(nn.Module):
    """MONAI VNet config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    act: str = "elu"
    dropout_prob: float = 0.5
    bias: bool = False  # MONAI default: bias-free convs ahead of BatchNorm

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu VNet is 3D")
        if 16 % x.shape[-1] != 0:
            raise ValueError("VNet requires in_channels dividing 16, got "
                             f"{x.shape[-1]}")
        b = self.bias
        x16 = InputTransition(16, self.act, b, name="in_tr")(x, train)
        d32 = DownTransition(32, 1, act=self.act, use_bias=b,
                             name="down_tr32")(x16, train)
        d64 = DownTransition(64, 2, act=self.act, use_bias=b,
                             name="down_tr64")(d32, train)
        d128 = DownTransition(128, 3, dropout=self.dropout_prob, act=self.act,
                              use_bias=b, name="down_tr128")(d64, train)
        d256 = DownTransition(256, 2, dropout=self.dropout_prob, act=self.act,
                              use_bias=b, name="down_tr256")(d128, train)
        u256 = UpTransition(256, 2, dropout=self.dropout_prob, act=self.act,
                            use_bias=b, name="up_tr256")(d256, d128, train)
        u128 = UpTransition(128, 2, dropout=self.dropout_prob, act=self.act,
                            use_bias=b, name="up_tr128")(u256, d64, train)
        u64 = UpTransition(64, 1, act=self.act, use_bias=b,
                           name="up_tr64")(u128, d32, train)
        u32 = UpTransition(32, 1, act=self.act, use_bias=b,
                           name="up_tr32")(u64, x16, train)
        return OutputTransition(self.out_channels, self.act, b,
                                name="out_tr")(u32, train)
