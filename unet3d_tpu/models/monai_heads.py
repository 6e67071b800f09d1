"""MONAI's small conv-stack heads: Regressor / Classifier / Discriminator /
Critic / Generator, config-resolvable by their MONAI names.

Parity: the reference's model namespace exposes every `monai.networks.nets`
class (`/root/reference/unet3d/models/pytorch/__init__.py:1`). These five are
MONAI's GAN/classification building-block nets (monai.networks.nets.regressor
/ classifier / generator), all assembled from the same Convolution /
ResidualUnit blocks as the MONAI UNet (models/monai_unet.py):

- Regressor: per-(channels, strides) ResidualUnit (or Convolution when
  ``num_res_units == 0``; the LAST stage is conv-only, no norm/act), then
  flatten -> Dense(prod(out_shape)) -> reshape.
- Classifier: Regressor with ``out_shape = (classes,)`` and an optional
  ``last_act`` on the logits.
- Discriminator: Classifier specialization — one output unit, sigmoid last
  activation, dropout 0.25 by default.
- Critic: Discriminator without the last activation (WGAN critic).
- Generator: Dense(prod(latent)) -> reshape to ``start_shape`` -> per-stage
  transposed Convolution (+ ResidualUnit at stride 1 when
  ``num_res_units > 0``; the last stage is conv-only).

Native-layout note: the flatten before the final Dense runs over NDHWC, so a
torch checkpoint's final Linear (flattened NCDHW) needs an index permutation
to transplant; conv-stage weights interchange directly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.models.monai_unet import Convolution, ResidualUnit


def _stage(features: int, strides: int, kernel_size: int, num_res_units: int,
           act: str, norm: str, dropout: float, is_last: bool, name: str):
    if num_res_units > 0:
        return ResidualUnit(features, strides=strides, kernel_size=kernel_size,
                            subunits=num_res_units, act=act, norm=norm,
                            dropout=dropout, last_conv_only=is_last, name=name)
    return Convolution(features, strides=strides, kernel_size=kernel_size,
                       act=act, norm=norm, dropout=dropout, conv_only=is_last,
                       name=name)


class Regressor(nn.Module):
    """monai.networks.nets.Regressor config surface (spatial_dims fixed 3)."""
    in_shape: Tuple[int, ...] = (1, 32, 32, 32)   # (C, D, H, W)
    out_shape: Tuple[int, ...] = (1,)
    channels: Tuple[int, ...] = (8, 16, 32)
    strides: Tuple[int, ...] = (2, 2, 2)
    kernel_size: int = 3
    num_res_units: int = 2
    act: str = "prelu"
    norm: str = "instance"
    dropout: float = 0.0
    last_act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, (c, s) in enumerate(zip(self.channels, self.strides)):
            x = _stage(c, s, self.kernel_size, self.num_res_units, self.act,
                       self.norm, self.dropout,
                       is_last=(i == len(self.channels) - 1),
                       name=f"layer_{i}")(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(int(np.prod(self.out_shape)), name="final")(x)
        if self.last_act:
            la = self.last_act.lower()
            x = {"sigmoid": nn.sigmoid, "softmax": nn.softmax,
                 "tanh": nn.tanh, "relu": nn.relu}[la](x)
        return x.reshape((x.shape[0],) + tuple(self.out_shape))


class Classifier(Regressor):
    """Regressor with ``out_shape = (classes,)`` (monai classifier.py)."""
    classes: int = 2

    def __post_init__(self):
        object.__setattr__(self, "out_shape", (self.classes,))
        super().__post_init__()


class Discriminator(Classifier):
    """One sigmoid output unit; MONAI defaults dropout to 0.25."""
    classes: int = 1
    dropout: float = 0.25
    last_act: Optional[str] = "sigmoid"


class Critic(Classifier):
    """WGAN critic: one linear output unit, no last activation."""
    classes: int = 1
    dropout: float = 0.25
    last_act: Optional[str] = None


class Generator(nn.Module):
    """monai.networks.nets.Generator: latent vector -> conv-transpose stack.

    ``start_shape`` is (C, D, H, W); input is ``(N,) + latent_shape``.
    """
    latent_shape: Tuple[int, ...] = (64,)
    start_shape: Tuple[int, ...] = (8, 4, 4, 4)
    channels: Tuple[int, ...] = (8, 4, 1)
    strides: Tuple[int, ...] = (2, 2, 2)
    kernel_size: int = 3
    num_res_units: int = 2
    act: str = "prelu"
    norm: str = "instance"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c0, *spatial = self.start_shape
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(int(np.prod(self.start_shape)), name="linear")(x)
        # device layout is NDHWC; reshape channel-first then transpose once
        x = x.reshape((x.shape[0], c0) + tuple(spatial))
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        for i, (c, s) in enumerate(zip(self.channels, self.strides)):
            is_last = i == len(self.channels) - 1
            conv_only = is_last and self.num_res_units == 0
            x = Convolution(c, strides=s, kernel_size=self.kernel_size,
                            act=self.act, norm=self.norm, dropout=self.dropout,
                            is_transposed=True, conv_only=conv_only,
                            name=f"conv_{i}")(x, train)
            if self.num_res_units > 0:
                x = ResidualUnit(c, strides=1, kernel_size=self.kernel_size,
                                 subunits=self.num_res_units, act=self.act,
                                 norm=self.norm, dropout=self.dropout,
                                 last_conv_only=is_last,
                                 name=f"resunit_{i}")(x, train)
        return x
