"""HighResNet — Li et al. 2017 dilated residual net, config-resolvable by name.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`). Native Flax/NDHWC
implementation of ``monai.networks.nets.HighResNet``'s default 3D layer plan:

- conv_0: 3-cubed conv -> 16 features (+BN+ReLU)
- res_1/2/3: 3 repeats each of a HighResBlock (2 x pre-activation dilated
  conv) at 16/32/64 features with dilation 1/2/4; identity zero-padded on
  channel growth (``channel_matching="pad"``)
- conv_1: pointwise -> 80 (+BN+ReLU); conv_2: pointwise -> out_channels.

No downsampling: full-resolution segmentation via growing receptive field —
dilated stride-1 convs route through the decomp2d formulation unchanged
(dilation only shifts the depth-tap offsets, which fall back to XLA here).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _bn(name: str, train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class HighResBlock(nn.Module):
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        y = x
        for i in range(2):
            y = _bn(f"bn{i}", train)(y)
            y = nn.relu(y)
            y = nn.Conv(self.features, (3, 3, 3),
                        kernel_dilation=(self.dilation,) * 3, padding="SAME",
                        use_bias=False, name=f"conv{i}")(y)
        if identity.shape[-1] != self.features:
            # channel_matching="pad": MONAI's ChannelPad splits the zero
            # padding symmetrically (half before, half after the channels)
            total = self.features - identity.shape[-1]
            identity = jnp.pad(identity, [(0, 0)] * (identity.ndim - 1)
                               + [(total // 2, total - total // 2)])
        return y + identity


class HighResNet(nn.Module):
    """MONAI HighResNet config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu HighResNet is 3D")
        x = nn.Conv(16, (3, 3, 3), padding="SAME", use_bias=False,
                    name="conv_0")(x)
        x = _bn("bn_0", train)(x)
        x = nn.relu(x)
        for li, (features, dilation) in enumerate([(16, 1), (32, 2), (64, 4)]):
            for r in range(3):
                x = HighResBlock(features, dilation,
                                 name=f"res_{li + 1}_{r}")(x, train)
        x = nn.Conv(80, (1, 1, 1), use_bias=False, name="conv_1")(x)
        x = _bn("bn_1", train)(x)
        x = nn.relu(x)
        if self.dropout_prob:
            # MONAI's Dropout factory with spatial_dims=3 -> Dropout3d
            x = nn.Dropout(self.dropout_prob, broadcast_dims=(1, 2, 3),
                           deterministic=not train)(x)
        return nn.Conv(self.out_channels, (1, 1, 1), name="conv_2")(x)
