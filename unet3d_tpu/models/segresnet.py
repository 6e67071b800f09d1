"""SegResNet — MONAI's Myronenko-family segmentation net, config-resolvable.

Parity: the reference makes every MONAI net reachable by config ``name``
through `unet3d/models/pytorch/__init__.py:1` (``from monai.networks.nets
import *``); SegResNet is the published-BraTS-paper architecture and the most
named after DynUNet. This module re-implements MONAI's
``monai.networks.nets.SegResNet`` topology natively in Flax/NDHWC:

- init 3-cubed conv to ``init_filters``
- encoder: per-level pre-activation residual blocks (GroupNorm(8) -> ReLU ->
  conv), ``blocks_down`` counts, stride-2 conv entering each level after the
  first, width doubling per level
- decoder: per-level 1-cubed conv halving width + non-trainable trilinear
  upsample, add the skip, then ``blocks_up`` residual blocks
- final GroupNorm -> ReLU -> 1-cubed conv head

The residual block is exactly the in-repo Myronenko block
(`unet3d_tpu/models/layers.py` MyronenkoResidualBlock) — SegResNet *is* that
family; only the level plumbing differs from MyronenkoEncoder (dropout placed
after the init conv, additive skips instead of concat).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet3d_tpu.models.layers import (MyronenkoResidualBlock, conv1, conv3,
                                      group_norm_groups, transposed_conv)
from unet3d_tpu.ops.interpolate import resize_ndhwc


def _make_upsample2x(channels: int, mode: str, name: str):
    """2x upsampler per MONAI UpSample semantics: 'nontrainable' -> trilinear
    interpolation; 'deconv' -> kernel-2 stride-2 transposed conv (trainable);
    'pixelshuffle' is not implemented (fail fast, never silently swap)."""
    if mode == "deconv":
        module = transposed_conv(channels, 2, 2, name=name)
        return lambda h: module(h)
    if mode in ("nontrainable", "trilinear", "nearest"):
        interp = "nearest" if mode == "nearest" else "trilinear"
        return lambda h: resize_ndhwc(
            h, tuple(2 * s for s in h.shape[1:4]), mode=interp)
    raise NotImplementedError(
        f"SegResNet upsample_mode={mode!r} is not supported here "
        "(supported: nontrainable, deconv)")


def _upsample2x(h, mode: str, name: str):
    return _make_upsample2x(h.shape[-1], mode, name)(h)


class SegResNet(nn.Module):
    """MONAI SegResNet config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    init_filters: int = 8
    in_channels: int = 1
    out_channels: int = 2
    dropout_prob: Optional[float] = None
    norm_groups: int = 8
    blocks_down: Tuple[int, ...] = (1, 2, 2, 4)
    blocks_up: Tuple[int, ...] = (1, 1, 1)
    upsample_mode: str = "nontrainable"
    use_conv_final: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu SegResNet is 3D")
        x = conv3(self.init_filters, 3, 1, use_bias=False, name="convInit")(x)
        if self.dropout_prob is not None:
            # MONAI uses Dropout3d here: whole-channel dropout
            x = nn.Dropout(rate=self.dropout_prob, broadcast_dims=(1, 2, 3),
                           deterministic=not train, name="dropout")(x)

        skips = []
        for i, n_blocks in enumerate(self.blocks_down):
            width = self.init_filters * (2 ** i)
            if i > 0:
                x = conv3(width, 3, 2, use_bias=False, name=f"down{i}")(x)
            for b in range(n_blocks):
                x = MyronenkoResidualBlock(width, norm_groups=self.norm_groups,
                                           name=f"layer{i}_block{b}")(x)
            skips.append(x)

        up_skips = skips[:-1][::-1]  # deepest-first, excluding the bottleneck
        for i, n_blocks in enumerate(self.blocks_up):
            width = x.shape[-1] // 2
            x = conv1(width, use_bias=False, name=f"up{i}_conv")(x)
            x = _upsample2x(x, self.upsample_mode, name=f"up{i}_deconv")
            x = x + up_skips[i]
            for b in range(n_blocks):
                x = MyronenkoResidualBlock(width, norm_groups=self.norm_groups,
                                           name=f"up{i}_block{b}")(x)

        if self.use_conv_final:
            x = nn.GroupNorm(num_groups=group_norm_groups(x.shape[-1],
                                                          self.norm_groups),
                             epsilon=1e-5, name="final_norm")(x)
            x = nn.relu(x)
            x = conv1(self.out_channels, name="conv_final")(x)
        return x


class SegResNetVAE(nn.Module):
    """SegResNet with the Myronenko VAE regularization branch, per MONAI's
    ``monai.networks.nets.SegResNetVAE`` semantics.

    The VAE branch shares the segmentation decoder's up-path weights: from the
    encoder bottleneck it strides down to ``smallest_filters`` channels,
    flattens to a ``vae_nz``-dim latent (mu + sampled noise; optional learned
    std), projects back up, and replays the decoder WITHOUT skip additions to
    reconstruct the input. During training ``__call__`` returns
    ``(seg_output, vae_loss)`` where ``vae_loss = MSE(recon, input) + reg``;
    the train step adds scalar extras to the criterion
    (`unet3d_tpu/train/step.py` compute_criterion). Eval returns only the
    segmentation output.
    """
    input_image_size: Tuple[int, ...]
    spatial_dims: int = 3
    init_filters: int = 8
    in_channels: int = 1
    out_channels: int = 2
    dropout_prob: Optional[float] = None
    norm_groups: int = 8
    blocks_down: Tuple[int, ...] = (1, 2, 2, 4)
    blocks_up: Tuple[int, ...] = (1, 1, 1)
    upsample_mode: str = "nontrainable"
    vae_estimate_std: bool = False
    vae_default_std: float = 0.3
    vae_nz: int = 256
    smallest_filters: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu SegResNetVAE is 3D")
        if len(self.blocks_up) != len(self.blocks_down) - 1:
            raise ValueError(
                "SegResNetVAE needs len(blocks_up) == len(blocks_down) - 1 so "
                "the VAE branch reconstructs at the input resolution; got "
                f"blocks_up={self.blocks_up} for blocks_down={self.blocks_down}")
        net_input = x
        x = conv3(self.init_filters, 3, 1, use_bias=False, name="convInit")(x)
        if self.dropout_prob is not None:
            # MONAI uses Dropout3d here: whole-channel dropout
            x = nn.Dropout(rate=self.dropout_prob, broadcast_dims=(1, 2, 3),
                           deterministic=not train, name="dropout")(x)

        skips = []
        for i, n_blocks in enumerate(self.blocks_down):
            width = self.init_filters * (2 ** i)
            if i > 0:
                x = conv3(width, 3, 2, use_bias=False, name=f"down{i}")(x)
            for b in range(n_blocks):
                x = MyronenkoResidualBlock(width, norm_groups=self.norm_groups,
                                           name=f"layer{i}_block{b}")(x)
            skips.append(x)
        vae_input = x

        # decoder modules are created once and replayed (weight-shared) by the
        # VAE branch, matching MONAI's reuse of up_samples/up_layers
        up_convs, up_blocks, up_samplers = [], [], []
        bottom_width = self.init_filters * (2 ** (len(self.blocks_down) - 1))
        for i, n_blocks in enumerate(self.blocks_up):
            width = bottom_width // (2 ** (i + 1))
            up_convs.append(conv1(width, use_bias=False, name=f"up{i}_conv"))
            up_samplers.append(_make_upsample2x(width, self.upsample_mode,
                                                name=f"up{i}_deconv"))
            up_blocks.append([
                MyronenkoResidualBlock(width, norm_groups=self.norm_groups,
                                       name=f"up{i}_block{b}")
                for b in range(n_blocks)])

        def run_decoder(h, use_skips: bool):
            for i in range(len(self.blocks_up)):
                h = up_convs[i](h)
                h = up_samplers[i](h)
                if use_skips:
                    # mirror of the down path: up step i consumes the skip
                    # from encoder level len(blocks_down)-2-i (MONAI down_x[i+1])
                    h = h + skips[len(self.blocks_down) - 2 - i]
                for blk in up_blocks[i]:
                    h = blk(h)
            return h

        y = run_decoder(x, use_skips=True)
        y = nn.GroupNorm(num_groups=group_norm_groups(y.shape[-1],
                                                      self.norm_groups),
                         epsilon=1e-5, name="final_norm")(y)
        y = nn.relu(y)
        seg = conv1(self.out_channels, name="conv_final")(y)
        # the VAE branch only contributes during training, but must also be
        # traced at init so its parameters exist before the first train step
        if not train and not self.is_initializing():
            return seg

        # ---- VAE branch (MONAI SegResNetVAE._get_vae_loss) ----
        zoom = 2 ** (len(self.blocks_down) - 1)
        fc_insize = [s // (2 * zoom) for s in self.input_image_size]
        total = self.smallest_filters * int(math.prod(fc_insize))

        v = nn.GroupNorm(num_groups=group_norm_groups(vae_input.shape[-1],
                                                      self.norm_groups),
                         epsilon=1e-5, name="vae_down_norm")(vae_input)
        v = nn.relu(v)
        v = conv3(self.smallest_filters, 3, 2, use_bias=False,
                  name="vae_down_conv")(v)
        v = v.reshape(v.shape[0], -1)
        z_mean = nn.Dense(self.vae_nz, name="vae_fc1")(v)
        noise = jax.random.normal(self.make_rng("sample"), z_mean.shape,
                                  dtype=z_mean.dtype)
        if self.vae_estimate_std:
            z_sigma = jax.nn.softplus(nn.Dense(self.vae_nz, name="vae_fc2")(v))
            reg = 0.5 * jnp.mean(z_mean.astype(jnp.float32) ** 2
                                 + z_sigma.astype(jnp.float32) ** 2
                                 - jnp.log(1e-8 + z_sigma.astype(jnp.float32) ** 2)
                                 - 1.0)
            z = z_mean + z_sigma * noise
        else:
            reg = jnp.mean(z_mean.astype(jnp.float32) ** 2)
            z = z_mean + self.vae_default_std * noise
        r = nn.relu(nn.Dense(total, name="vae_fc3")(z))
        r = r.reshape((r.shape[0],) + tuple(fc_insize) + (self.smallest_filters,))
        r = conv1(bottom_width, use_bias=False, name="vae_fc_up_conv")(r)
        r = _make_upsample2x(bottom_width, self.upsample_mode,
                             name="vae_fc_upsample")(r)
        r = run_decoder(r, use_skips=False)
        recon = conv1(self.in_channels, name="vae_conv_final")(r)
        mse = jnp.mean((recon.astype(jnp.float32)
                        - net_input.astype(jnp.float32)) ** 2)
        if not train:
            return seg
        return seg, mse + reg
