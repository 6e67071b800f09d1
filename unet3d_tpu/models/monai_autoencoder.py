"""MONAI ``AutoEncoder`` / ``VarAutoEncoder``, config-resolvable by name.

Parity: the reference's model namespace exposes every `monai.networks.nets`
class (`/root/reference/unet3d/models/pytorch/__init__.py:1`). These are
distinct from the in-repo reference family (ConvolutionalAutoEncoder /
VariationalAutoEncoder in models/variational.py, which mirror the reference's
Myronenko-based `unet3d/models/pytorch/autoencoder/`): MONAI's are plain
Convolution/ResidualUnit stacks (monai/networks/nets/autoencoder.py,
varautoencoder.py):

- encode: per-(channels, strides) Convolution (or ResidualUnit when
  ``num_res_units > 0``).
- intermediate: dilated Convolution / ResidualUnit stages driven by
  ``inter_channels`` / ``inter_dilations``.
- decode: transposed Convolution per reversed stride (+ single-subunit
  ResidualUnit when ``num_res_units > 0``); the last decode stage is
  conv-only (no norm/act).
- VarAutoEncoder: flatten after encode -> Dense mu / logvar -> explicit-PRNG
  reparameterize (the ``sample`` rng collection the trainer already threads;
  eval uses mu) -> Dense back -> relu -> reshape -> decode -> sigmoid.
  Returns ``(reconstruction, mu, logvar, z)`` like MONAI.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet3d_tpu.models.monai_unet import Convolution, ResidualUnit


class _CoderMixin:
    def _encode_stages(self):
        stages = []
        for i, (c, s) in enumerate(zip(self.channels, self.strides)):
            if self.num_res_units > 0:
                stages.append(ResidualUnit(
                    c, strides=s, kernel_size=self.kernel_size,
                    subunits=self.num_res_units, act=self.act, norm=self.norm,
                    dropout=self.dropout, name=f"encode_{i}"))
            else:
                stages.append(Convolution(
                    c, strides=s, kernel_size=self.kernel_size, act=self.act,
                    norm=self.norm, dropout=self.dropout, name=f"encode_{i}"))
        return stages

    def _intermediate_stages(self):
        stages = []
        dilations = self.inter_dilations or (1,) * len(self.inter_channels or ())
        for i, (c, d) in enumerate(zip(self.inter_channels or (), dilations)):
            if self.num_inter_units > 0:
                stages.append(ResidualUnit(
                    c, strides=1, kernel_size=self.kernel_size,
                    subunits=self.num_inter_units, act=self.act,
                    norm=self.norm, dropout=self.dropout, dilation=d,
                    name=f"inter_{i}"))
            else:
                stages.append(Convolution(
                    c, strides=1, kernel_size=self.kernel_size, act=self.act,
                    norm=self.norm, dropout=self.dropout, dilation=d,
                    name=f"inter_{i}"))
        return stages

    def _decode_stages(self):
        channels = tuple(self.channels[-2::-1]) + (self.out_channels,)
        strides = tuple(self.strides[::-1])
        stages = []
        for i, (c, s) in enumerate(zip(channels, strides)):
            is_last = i == len(channels) - 1
            sub = [Convolution(
                c, strides=s, kernel_size=self.up_kernel_size, act=self.act,
                norm=self.norm, dropout=self.dropout, is_transposed=True,
                conv_only=is_last and self.num_res_units == 0,
                name=f"decode_{i}")]
            if self.num_res_units > 0:
                sub.append(ResidualUnit(
                    c, strides=1, kernel_size=self.up_kernel_size, subunits=1,
                    act=self.act, norm=self.norm, dropout=self.dropout,
                    last_conv_only=is_last, name=f"decode_{i}_ru"))
            stages.append(sub)
        return stages


class AutoEncoder(nn.Module, _CoderMixin):
    """monai.networks.nets.AutoEncoder config surface (spatial_dims fixed 3)."""
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    channels: Tuple[int, ...] = (4, 8, 16)
    strides: Tuple[int, ...] = (2, 2, 2)
    kernel_size: int = 3
    up_kernel_size: int = 3
    num_res_units: int = 0
    inter_channels: Optional[Tuple[int, ...]] = None
    inter_dilations: Optional[Tuple[int, ...]] = None
    num_inter_units: int = 2
    act: str = "prelu"
    norm: str = "instance"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for stage in self._encode_stages():
            x = stage(x, train)
        for stage in self._intermediate_stages():
            x = stage(x, train)
        for sub in self._decode_stages():
            for stage in sub:
                x = stage(x, train)
        return x


class VarAutoEncoder(nn.Module, _CoderMixin):
    """monai.networks.nets.VarAutoEncoder: returns (recon, mu, logvar, z)."""
    spatial_dims: int = 3
    in_shape: Tuple[int, ...] = (1, 32, 32, 32)   # (C, D, H, W)
    out_channels: int = 1
    latent_size: int = 16
    channels: Tuple[int, ...] = (4, 8, 16)
    strides: Tuple[int, ...] = (2, 2, 2)
    kernel_size: int = 3
    up_kernel_size: int = 3
    num_res_units: int = 0
    inter_channels: Optional[Tuple[int, ...]] = None
    inter_dilations: Optional[Tuple[int, ...]] = None
    num_inter_units: int = 2
    act: str = "prelu"
    norm: str = "instance"
    dropout: float = 0.0
    use_sigmoid: bool = True

    @property
    def in_channels(self):
        return self.in_shape[0]

    @property
    def out_shape(self):
        # spatial size after the encode strides (k=3 same padding: ceil-div)
        spatial = list(self.in_shape[1:])
        for s in self.strides:
            spatial = [-(-d // s) for d in spatial]
        inter = (self.inter_channels[-1] if self.inter_channels
                 else self.channels[-1])
        return (inter,) + tuple(spatial)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        for stage in self._encode_stages():
            x = stage(x, train)
        for stage in self._intermediate_stages():
            x = stage(x, train)
        grid = x.shape[1:4]
        flat = x.reshape(x.shape[0], -1)
        mu = nn.Dense(self.latent_size, name="mu")(flat)
        logvar = nn.Dense(self.latent_size, name="logvar")(flat)
        if train:
            eps = jax.random.normal(self.make_rng("sample"), mu.shape,
                                    dtype=mu.dtype)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        y = nn.relu(nn.Dense(flat.shape[-1], name="decodeL")(z))
        y = y.reshape((x.shape[0],) + grid + (x.shape[-1],))
        for sub in self._decode_stages():
            for stage in sub:
                y = stage(y, train)
        if self.use_sigmoid:
            y = nn.sigmoid(y)
        return y, mu, logvar, z
