"""SegResNetDS — MONAI's deep-supervision SegResNet, config-resolvable.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`); SegResNetDS is the
modern MONAI default (Auto3DSeg). Native Flax/NDHWC implementation of the
``monai.networks.nets.SegResNetDS`` topology:

- ``SegResBlock``: pre-activation residual (norm -> act -> conv3) x2 + identity;
  norm default "batch", act default "relu".
- encoder: init conv3 (no bias), per level ``blocks_down[i]`` SegResBlocks then
  a stride-2 conv3 downsample doubling width (downsample AFTER the blocks —
  unlike plain SegResNet which strides on level entry).
- decoder: per level a kernel-2 stride-2 transposed conv ("deconv" UpSample)
  halving width, additive skip, ``blocks_up[i]`` SegResBlocks (default 1 each).
- deep supervision: the last ``dsdepth`` decoder levels get 1-cubed heads.

Deep-supervision output convention: MONAI returns a *list* of tensors at
different scales and leaves the matching to ``DeepSupervisionLoss`` (which
interpolates each head to the target's shape). This framework's criterion
plumbing (`train/step.py` compute_criterion) expects heads stacked along axis 1
at full resolution (the DynUNet convention), so heads below full resolution are
trilinearly upsampled to full size before stacking — the same
interpolate-to-target MONAI's loss performs, moved into the model. With the
default ``dsdepth=1`` the output is a single tensor, exact MONAI parity.

``resolution`` (anisotropic kernel/stride selection) is not implemented — a
config passing it fails fast rather than silently training isotropically.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import PointwiseConv, conv3, transposed_conv
from unet3d_tpu.ops.interpolate import resize_ndhwc


def _norm(kind: str, channels: int, name: str, train: bool):
    kind = (kind or "batch").lower()
    if kind == "batch":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name=name)
    if kind == "instance":
        return nn.GroupNorm(num_groups=channels, use_bias=False,
                            use_scale=False, epsilon=1e-5, name=name)
    if kind == "group":
        return nn.GroupNorm(num_groups=min(8, channels), epsilon=1e-5, name=name)
    raise NotImplementedError(f"SegResNetDS norm={kind!r} not supported")


def _act(kind: str, x: jnp.ndarray) -> jnp.ndarray:
    kind = (kind or "relu").lower()
    if kind == "relu":
        return nn.relu(x)
    if kind == "leakyrelu":
        return nn.leaky_relu(x, 0.01)
    raise NotImplementedError(f"SegResNetDS act={kind!r} not supported")


class SegResBlock(nn.Module):
    """norm -> act -> conv3, twice, plus identity (monai SegResBlock)."""
    channels: int
    norm: str = "batch"
    act: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        x = _norm(self.norm, self.channels, "norm1", train)(x)
        x = _act(self.act, x)
        x = conv3(self.channels, 3, 1, use_bias=False, name="conv1")(x)
        x = _norm(self.norm, self.channels, "norm2", train)(x)
        x = _act(self.act, x)
        x = conv3(self.channels, 3, 1, use_bias=False, name="conv2")(x)
        return x + identity


class SegResNetDS(nn.Module):
    """MONAI SegResNetDS config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    init_filters: int = 32
    in_channels: int = 1
    out_channels: int = 2
    act: str = "relu"
    norm: str = "batch"
    blocks_down: Tuple[int, ...] = (1, 2, 2, 4)
    blocks_up: Optional[Tuple[int, ...]] = None
    dsdepth: int = 1
    upsample_mode: str = "deconv"
    resolution: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu SegResNetDS is 3D")
        if self.resolution is not None:
            raise NotImplementedError(
                "SegResNetDS anisotropic `resolution` kernels are not "
                "implemented; resample to isotropic spacing instead")
        if self.upsample_mode != "deconv":
            raise NotImplementedError(
                f"SegResNetDS upsample_mode={self.upsample_mode!r} not "
                "supported (deconv only)")

        n_levels = len(self.blocks_down)
        blocks_up = self.blocks_up or (1,) * (n_levels - 1)
        if len(blocks_up) != n_levels - 1:
            raise ValueError("len(blocks_up) must equal len(blocks_down) - 1")

        x = conv3(self.init_filters, 3, 1, use_bias=False, name="conv_init")(x)
        skips = []
        filters = self.init_filters
        for i, n_blocks in enumerate(self.blocks_down):
            for b in range(n_blocks):
                x = SegResBlock(filters, self.norm, self.act,
                                name=f"down{i}_block{b}")(x, train)
            skips.append(x)
            if i < n_levels - 1:
                # downsample AFTER blocks (monai segresnet_ds.SegResEncoder)
                x = conv3(filters * 2, 3, 2, use_bias=False,
                          name=f"down{i}_downsample")(x)
                filters *= 2

        up_skips = skips[:-1][::-1]
        heads = []
        for i, n_blocks in enumerate(blocks_up):
            filters //= 2
            x = transposed_conv(filters, 2, 2, name=f"up{i}_upsample")(x)
            x = x + up_skips[i]
            for b in range(n_blocks):
                x = SegResBlock(filters, self.norm, self.act,
                                name=f"up{i}_block{b}")(x, train)
            if len(blocks_up) - i <= self.dsdepth:
                heads.append(PointwiseConv(self.out_channels,
                                           name=f"up{i}_head")(x))
        heads.reverse()  # full-resolution head first
        if len(heads) == 1 or not train:
            return heads[0]
        full = heads[0].shape[1:4]
        stacked = [heads[0]] + [
            resize_ndhwc(h, full, mode="trilinear") for h in heads[1:]]
        return jnp.stack(stacked, axis=1)
