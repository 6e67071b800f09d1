"""Autoencoder family: ConvolutionalAutoEncoder, VAE, labeled VAE.

Parity: `unet3d/models/pytorch/autoencoder/variational.py` — encoder/decoder with
optional mirrored topology, final 1x1x1 conv, optional sigmoid/softmax; the VAE
inserts a strided-conv -> flatten -> dense mu/logvar -> dense -> reshape -> 1x1x1
conv -> trilinear-upsample latent layer, with the deterministic ``.test()`` path
decoding mu. Reparameterization uses an explicit Flax RNG stream ("sample").
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.models.decoder import MirroredDecoder, MyronenkoDecoder
from unet3d_tpu.models.layers import MyronenkoConvBlock, conv1
from unet3d_tpu.models.myronenko import MyronenkoEncoder
from unet3d_tpu.ops.interpolate import upsample_ndhwc


def _activation(name: Optional[str]):
    if name == "sigmoid":
        return nn.sigmoid
    if name == "softmax":
        return lambda x: nn.softmax(x, axis=-1)  # channel axis in NDHWC
    if name is None:
        return None
    raise ValueError(f"Unsupported activation {name}")


class ConvolutionalAutoEncoder(nn.Module):
    """Parity: `variational.py:37-87`. ``n_outputs`` defaults to ``n_features``
    (reconstruction)."""
    n_features: int = 1
    base_width: int = 32
    encoder_blocks: Tuple[int, ...] = (1, 2, 2, 4)
    decoder_blocks: Optional[Tuple[int, ...]] = None
    feature_dilation: int = 2
    downsampling_stride: int = 2
    interpolation_mode: str = "trilinear"
    n_outputs: Optional[int] = None
    layer_widths: Optional[Tuple[int, ...]] = None
    decoder_mirrors_encoder: bool = False
    activation: Optional[str] = None
    use_transposed_convolutions: bool = False
    kernel_size: int = 3

    def _encoder(self, collect_skips: bool = False) -> MyronenkoEncoder:
        return MyronenkoEncoder(base_width=self.base_width,
                                layer_blocks=tuple(self.encoder_blocks),
                                feature_dilation=self.feature_dilation,
                                downsampling_stride=self.downsampling_stride,
                                layer_widths=self.layer_widths,
                                kernel_size=self.kernel_size,
                                collect_skips=collect_skips, name="encoder")

    def _decoder(self) -> nn.Module:
        common = dict(base_width=self.base_width,
                      upsampling_scale=self.downsampling_stride,
                      feature_reduction_scale=self.feature_dilation,
                      upsampling_mode=self.interpolation_mode,
                      layer_widths=self.layer_widths,
                      use_transposed_convolutions=self.use_transposed_convolutions,
                      kernel_size=self.kernel_size, name="decoder")
        if self.decoder_mirrors_encoder:
            return MirroredDecoder(layer_blocks=tuple(self.encoder_blocks), **common)
        blocks = self.decoder_blocks or tuple([1] * len(self.encoder_blocks))
        return MyronenkoDecoder(layer_blocks=tuple(blocks), **common)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self._encoder()(x, train=train)
        x = self._decoder()(x, train=train)
        n_out = self.n_outputs if self.n_outputs is not None else self.n_features
        x = conv1(n_out, use_bias=False, name="final_convolution")(x)
        act = _activation(self.activation)
        return act(x) if act else x


class VariationalBlock(nn.Module):
    """dense -> (mu, logvar) -> reparameterize -> dense (`variational.py:12-34`)."""
    n_features: int
    out_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, sample: bool = True):
        x = nn.Dense(self.n_features * 2, name="dense1")(x)
        mu, logvar = jnp.split(x, 2, axis=1)
        if sample:
            std = jnp.exp(0.5 * logvar)
            eps = jax.random.normal(self.make_rng("sample"), std.shape, std.dtype)
            z = mu + eps * std
        else:
            z = mu  # deterministic `.test()` path (`variational.py:148-155`).
            # Intentional divergence: the reference's forward() samples eps
            # even in eval; here eval defaults to the deterministic mu-decode
            # (equivalent to its test()) so validation losses are repeatable.
            # Pass sample=True for the reference's sampled-eval behavior.
        out = nn.Dense(self.out_size, name="dense2")(z)
        return out, mu, logvar


class MyronenkoVariationalLayer(nn.Module):
    """Strided conv -> flatten -> VariationalBlock -> reshape -> 1x1x1 conv -> upsample.

    Parity: `variational.py:90-110`. ``input_shape`` is the spatial shape of the
    incoming feature map (static, from config input_shape / 2^depth).
    """
    in_features: int
    input_shape: Tuple[int, int, int]
    reduced_features: int = 16
    latent_features: int = 128
    conv_stride: int = 2
    upsampling_mode: str = "trilinear"
    align_corners_upsampling: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, sample: bool = True,
                 return_reduced: bool = False):
        # SAME-padded stride-s convs produce CEIL(size/s) outputs; floor
        # division broke non-divisible input shapes (ref shares the flaw)
        reduced_shape = tuple(-(-int(s) // self.conv_stride)
                              for s in self.input_shape)
        in_size = int(np.prod(reduced_shape)) * self.reduced_features
        x = MyronenkoConvBlock(self.reduced_features, stride=self.conv_stride,
                               name="in_conv")(x)
        reduced = x.reshape(x.shape[0], -1)
        x, mu, logvar = VariationalBlock(n_features=self.latent_features,
                                         out_size=in_size,
                                         name="var_block")(reduced, sample=sample)
        x = nn.relu(x)
        x = x.reshape((-1,) + reduced_shape + (self.reduced_features,))
        x = conv1(self.in_features, use_bias=False, name="out_conv")(x)
        x = upsample_ndhwc(x, self.conv_stride, self.upsampling_mode,
                           self.align_corners_upsampling)
        if return_reduced:
            # RegularizedResNet reads its classification head off the flattened
            # reduced latent (`custom.py:14-17`)
            return x, mu, logvar, reduced
        return x, mu, logvar


class VariationalAutoEncoder(ConvolutionalAutoEncoder):
    """Parity: `variational.py:113-155`; returns (out, mu, logvar)."""
    input_shape: Optional[Tuple[int, int, int]] = None
    n_reduced_latent_feature_maps: int = 16
    vae_features: int = 128
    var_layer_stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, sample: Optional[bool] = None):
        if sample is None:
            sample = train
        x = self._encoder()(x, train=train)
        depth = len(self.encoder_blocks) - 1
        latent_width = (self.layer_widths[depth] if self.layer_widths is not None
                        else self.base_width * (self.feature_dilation ** depth))
        if self.input_shape is None:
            raise ValueError("VariationalAutoEncoder requires input_shape")
        latent_shape = tuple(int(s // (self.downsampling_stride ** depth))
                             for s in self.input_shape)
        x, mu, logvar = MyronenkoVariationalLayer(
            in_features=int(latent_width), input_shape=latent_shape,
            reduced_features=self.n_reduced_latent_feature_maps,
            latent_features=self.vae_features, conv_stride=self.var_layer_stride,
            upsampling_mode=self.interpolation_mode, name="var_layer")(x, sample=sample)
        x = self._decoder()(x, train=train)
        n_out = self.n_outputs if self.n_outputs is not None else self.n_features
        x = conv1(n_out, use_bias=False, name="final_convolution")(x)
        act = _activation(self.activation)
        if act:
            x = act(x)
        return x, mu, logvar


class LabeledVariationalAutoEncoder(VariationalAutoEncoder):
    """VAE with an n_outputs segmentation head (`variational.py:158-161`)."""
    pass
