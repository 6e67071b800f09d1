"""Regularized / hybrid models: classification + reconstruction heads.

Parity: `unet3d/models/pytorch/classification/custom.py` —
RegularizedResNet (Myronenko encoder + VAE branch + linear classification head),
RegularizedBasicResNet (3D ResNet encoder + BasicDecoder reconstruction),
ResNetWithDecoder1D (3D encoder -> 1D signal decoder for task-activation-map
regression); plus the BasicDecoder / Decoder1D building blocks from
`classification/decoder.py:9-33,133-162`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.models.myronenko import MyronenkoEncoder
from unet3d_tpu.models.decoder import MyronenkoDecoder
from unet3d_tpu.models.layers import conv1
from unet3d_tpu.models.resnet import BasicBlock, ResNet
from unet3d_tpu.models.variational import MyronenkoVariationalLayer
from unet3d_tpu.ops.interpolate import upsample_ndhwc


class BasicDecoder(nn.Module):
    """1x1x1-conv channel halving + interpolate-upsample + ResNet blocks per level.

    Parity: `classification/decoder.py:9-33`.
    """
    layers: Tuple[int, ...]
    in_planes: int
    plane_dilation: int = 2
    upsampling_mode: str = "trilinear"
    upsampling_scale: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        planes = self.in_planes
        for li, n_blocks in enumerate(self.layers):
            planes = int(planes / self.plane_dilation)
            x = conv1(planes, use_bias=False, name=f"conv1_{li}")(x)
            x = upsample_ndhwc(x, self.upsampling_scale, self.upsampling_mode,
                               align_corners=False)
            for bi in range(n_blocks):
                x = BasicBlock(planes=planes, name=f"layer{li}_block{bi}")(x,
                                                                           train=train)
        return x


class BasicBlock1D(nn.Module):
    """1D conv-BN-ReLU residual block (`resnet.py:70-86`). x is (B, L, C)."""
    channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                      use_bias=False, name="conv1")(x)
        out = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(out))
        out = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                      use_bias=False, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, name="bn2")(out)
        return nn.relu(out + identity)


def _interp_1d(x: jnp.ndarray, size: int, mode: str = "linear",
               align_corners: bool = True) -> jnp.ndarray:
    """torch interpolate on (B, L, C) along L."""
    l_in = x.shape[1]
    v = np.arange(size, dtype=np.float64)
    if mode == "nearest":
        coords = np.clip(np.floor(v * (l_in / size)), 0, l_in - 1)
        return jnp.take(x, jnp.asarray(coords.astype(np.int32)), axis=1)
    if align_corners:
        coords = v * ((l_in - 1) / max(size - 1, 1))
    else:
        coords = np.clip((v + 0.5) * (l_in / size) - 0.5, 0, l_in - 1)
    lo = np.floor(coords).astype(np.int32)
    hi = np.minimum(lo + 1, l_in - 1)
    frac = jnp.asarray((coords - lo).astype(np.float32))[None, :, None]
    return (jnp.take(x, jnp.asarray(lo), axis=1) * (1 - frac)
            + jnp.take(x, jnp.asarray(hi), axis=1) * frac)


class Decoder1D(nn.Module):
    """Upsample-conv1-blocks per level on 1D signals (`decoder.py:133-162`)."""
    layer_blocks: Tuple[int, ...]
    layer_channels: Tuple[int, ...]
    kernel_size: int = 3
    upsample_factor: int = 2
    interpolation_mode: str = "linear"
    interpolation_align_corners: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for li, (n_blocks, out_channels) in enumerate(zip(self.layer_blocks,
                                                          self.layer_channels)):
            x = _interp_1d(x, x.shape[1] * self.upsample_factor,
                           self.interpolation_mode, self.interpolation_align_corners)
            x = nn.Conv(out_channels, (1,), use_bias=False, name=f"conv1_{li}")(x)
            for bi in range(n_blocks):
                x = BasicBlock1D(out_channels, self.kernel_size,
                                 name=f"layer{li}_block{bi}")(x, train=train)
        return x


class RegularizedResNet(nn.Module):
    """Myronenko encoder with a linear classification head off the VAE bottleneck
    plus the VAE reconstruction branch (`custom.py:8-23`).

    Returns (classification, reconstruction, mu, logvar).
    """
    n_outputs: int
    input_shape: Tuple[int, int, int]
    n_features: int = 1
    base_width: int = 32
    encoder_blocks: Tuple[int, ...] = (1, 2, 2, 4)
    decoder_blocks: Optional[Tuple[int, ...]] = None
    feature_dilation: int = 2
    downsampling_stride: int = 2
    interpolation_mode: str = "trilinear"
    vae_features: int = 128
    n_reduced_latent_feature_maps: int = 16
    var_layer_stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 sample: Optional[bool] = None):
        if sample is None:
            sample = train
        depth = len(self.encoder_blocks) - 1
        latent_width = self.base_width * (self.feature_dilation ** depth)
        latent_shape = tuple(int(s // (self.downsampling_stride ** depth))
                             for s in self.input_shape)
        x = MyronenkoEncoder(base_width=self.base_width,
                             layer_blocks=tuple(self.encoder_blocks),
                             feature_dilation=self.feature_dilation,
                             downsampling_stride=self.downsampling_stride,
                             name="encoder")(x, train=train)
        var_layer = MyronenkoVariationalLayer(
            in_features=int(latent_width), input_shape=latent_shape,
            reduced_features=self.n_reduced_latent_feature_maps,
            latent_features=self.vae_features, conv_stride=self.var_layer_stride,
            upsampling_mode=self.interpolation_mode, name="var_layer")
        y, mu, logvar, reduced = var_layer(x, sample=sample, return_reduced=True)
        # classification head reads the flattened reduced latent (`custom.py:14-17`)
        output = nn.Dense(self.n_outputs, name="fc")(reduced)
        blocks = self.decoder_blocks or tuple([1] * len(self.encoder_blocks))
        y = MyronenkoDecoder(base_width=self.base_width, layer_blocks=tuple(blocks),
                             upsampling_scale=self.downsampling_stride,
                             feature_reduction_scale=self.feature_dilation,
                             upsampling_mode=self.interpolation_mode,
                             name="decoder")(y, train=train)
        vae_output = conv1(self.n_features, use_bias=False,
                           name="final_convolution")(y)
        return output, vae_output, mu, logvar


class RegularizedBasicResNet(nn.Module):
    """3D ResNet classifier + BasicDecoder reconstruction of the pooled latent.

    Parity: `custom.py:26-62` (the `_ResNetLatent` pooled-latent trick).
    Returns (classification, reconstruction).
    """
    n_features: int
    n_outputs: int = 1000
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    decoding_layers: Tuple[int, ...] = (1, 1, 1, 1, 1, 1, 1)
    latent_planes: int = 512
    plane_dilation: int = 2
    upsampling_mode: str = "trilinear"
    upsampling_scale: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        latent = ResNet(block=BasicBlock, layers=tuple(self.layers),
                        features_only=True, name="encoder")(x, train=train)
        out = nn.Dense(self.n_outputs, name="fc")(latent)
        y = latent.reshape(latent.shape[0], 1, 1, 1, latent.shape[-1])
        y = BasicDecoder(layers=tuple(self.decoding_layers),
                         in_planes=self.latent_planes,
                         plane_dilation=self.plane_dilation,
                         upsampling_mode=self.upsampling_mode,
                         upsampling_scale=self.upsampling_scale,
                         name="decoder")(y, train=train)
        y = conv1(self.n_features, use_bias=False,
                  name="final_convolution")(y)
        return out, y


class ResNetWithDecoder1D(nn.Module):
    """3D encoder -> upsampled 1D signal decoder (`custom.py:65-98`)."""
    n_fc_outputs: int
    n_outputs: int
    initial_upsample: int = 1024
    blocks_per_layer: int = 1
    channel_decay: int = 2
    upsample_factor: int = 2
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    interpolation_mode: str = "linear"
    interpolation_align_corners: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ResNet(block=BasicBlock, layers=tuple(self.layers),
                   n_outputs=self.n_fc_outputs, name="encoder")(x, train=train)
        # (B, n_fc) -> (B, L=1, C) -> nearest-upsample L to initial_upsample
        layer_blocks, layer_channels = [], []
        size, channels = self.initial_upsample, self.n_fc_outputs
        while size < self.n_outputs:
            size = int(size * self.upsample_factor)
            channels = int(channels / self.channel_decay)
            layer_blocks.append(self.blocks_per_layer)
            layer_channels.append(channels)
        y = x[:, None, :]  # (B, 1, C)
        y = _interp_1d(y, self.initial_upsample, mode="nearest")
        y = Decoder1D(layer_blocks=tuple(layer_blocks),
                      layer_channels=tuple(layer_channels),
                      upsample_factor=self.upsample_factor,
                      interpolation_mode=self.interpolation_mode,
                      interpolation_align_corners=self.interpolation_align_corners,
                      name="decoder")(y, train=train)
        y = nn.Conv(1, (3,), use_bias=False, padding="VALID", name="out_conv")(y)
        return _interp_1d(y, self.n_outputs, self.interpolation_mode,
                          self.interpolation_align_corners)
