"""Registration networks: RegUNet / GlobalNet / LocalNet + a DDF warp helper.

Parity: the reference's model namespace exposes every `monai.networks.nets`
class (`/root/reference/unet3d/models/pytorch/__init__.py:1`); the
registration family is `monai.networks.nets.regunet` (DeepReg-derived,
Hu et al. 2018). Native Flax/NDHWC implementation of the topology:

- RegUNet: encoder of ``depth`` levels (conv block = conv3+BN+ReLU followed
  by a 2-conv residual block; max-pool 2 between levels), a bottom block,
  a transposed-conv decoder with additive (or concat) skips, and a
  RegistrationExtractionBlock output: for each level in ``extract_levels``
  a conv3 head to ``out_channels``, trilinearly resized to the input size,
  averaged over levels.
- GlobalNet: the RegUNet encoder + an affine head — flatten the bottom
  feature, Dense to ``spatial_dims*(spatial_dims+1)`` params with ZERO
  kernel init and IDENTITY bias init, and return the dense displacement
  field ``theta @ grid - grid`` (shape ``(N, D, H, W, 3)``; zero at init).
- LocalNet: RegUNet with a kernel-7 first encode block and extraction from
  ``extract_levels`` (additive skips).

``warp_image`` applies a DDF by elementwise coordinate add + gather
(ops/resample.sample_at_coords; coordinate math is multiply-add only, per
the TPU matmul-precision rule in CLAUDE.md — the GlobalNet theta@grid
product is computed as broadcast multiply-adds for the same reason).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import FastConv, conv1, transposed_conv
from unet3d_tpu.ops.interpolate import resize_ndhwc
from unet3d_tpu.ops.resample import sample_at_coords


def _bn(name: str, train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class ConvBNReLU(nn.Module):
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        x = FastConv(self.features, (k, k, k), use_bias=False, name="conv")(x)
        return nn.relu(_bn("bn", train)(x))


class ResidualConvBlock(nn.Module):
    """monai RegistrationResidualConvBlock: 2 convs, residual added before
    the final activation."""
    features: int
    kernel_size: int = 3
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        skip = x
        k = self.kernel_size
        for i in range(self.num_layers):
            x = FastConv(self.features, (k, k, k), use_bias=False,
                         name=f"conv{i}")(x)
            x = _bn(f"bn{i}", train)(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return nn.relu(x + skip)


class EncodeBlock(nn.Module):
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBNReLU(self.features, self.kernel_size, name="conv")(x, train)
        return ResidualConvBlock(self.features, self.kernel_size,
                                 name="residual")(x, train)


def _resize_trilinear(x: jnp.ndarray, out_spatial: Tuple[int, ...]) -> jnp.ndarray:
    """NDHWC trilinear resize (torch-interpolate semantics, incl. the border
    clamp torch applies — an unclamped local sampler here zero-padded the
    edges and diverged from torch, caught by the RegUNet transplant test)."""
    if tuple(x.shape[1:4]) == tuple(out_spatial):
        return x
    return resize_ndhwc(x, out_spatial, mode="trilinear")


class RegUNet(nn.Module):
    """monai.networks.nets.RegUNet config surface (spatial_dims fixed 3)."""
    spatial_dims: int = 3
    in_channels: int = 2           # fixed + moving image, channel-concat
    num_channel_initial: int = 16
    depth: int = 3
    out_channels: int = 3
    extract_levels: Optional[Tuple[int, ...]] = None
    pooling: bool = True
    concat_skip: bool = False
    encode_kernel_sizes: int = 3

    def _kernel_size(self, d: int) -> int:
        ks = self.encode_kernel_sizes
        return ks[d] if isinstance(ks, (tuple, list)) else ks

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu RegUNet is 3D")
        levels = tuple(self.extract_levels or (self.depth,))
        assert max(levels) <= self.depth
        widths = [self.num_channel_initial * 2 ** d
                  for d in range(self.depth + 1)]
        image_size = x.shape[1:4]

        skips = []
        for d in range(self.depth):
            x = EncodeBlock(widths[d], self._kernel_size(d),
                            name=f"encode_{d}")(x, train)
            skips.append(x)
            if self.pooling:
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            else:
                x = FastConv(widths[d], (3, 3, 3), strides=(2, 2, 2),
                             use_bias=False, name=f"pool_conv_{d}")(x)
        x = EncodeBlock(widths[self.depth], self._kernel_size(self.depth),
                        name="bottom")(x, train)

        outs = {self.depth: x}
        for i, d in enumerate(range(self.depth - 1, min(levels) - 1, -1)):
            x = transposed_conv(widths[d], 3, 2, output_padding=1,
                                use_bias=False, name=f"deconv_{d}")(x)
            x = nn.relu(_bn(f"deconv_bn_{d}", train)(x))
            skip = skips[d]
            if self.concat_skip:
                x = jnp.concatenate([x, skip], axis=-1)
            else:
                x = x + skip
            x = EncodeBlock(widths[d], name=f"decode_{d}")(x, train)
            outs[d] = x

        # RegistrationExtractionBlock: per-level conv head -> resize -> mean
        heads = []
        for level in levels:
            h = FastConv(self.out_channels, (3, 3, 3),
                         name=f"extract_{level}")(outs[level])
            heads.append(_resize_trilinear(h, image_size))
        return sum(heads) / len(heads)


class AffineHead(nn.Module):
    """Dense to 12 affine params: zero kernel, identity bias — the initial
    prediction is exactly the identity transform (MONAI GlobalNet init)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        flat = x.reshape(x.shape[0], -1)
        identity = jnp.asarray([1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0],
                               jnp.float32)
        theta = nn.Dense(12, kernel_init=nn.initializers.zeros,
                         bias_init=lambda *a, **k: identity,
                         name="fc")(flat)
        return theta.reshape(-1, 3, 4)


class GlobalNet(nn.Module):
    """monai.networks.nets.GlobalNet: encoder + affine head -> DDF.

    Returns the displacement field ``(N, D, H, W, 3)`` (voxel units, zero at
    initialization); apply with ``warp_image``.
    """
    spatial_dims: int = 3
    in_channels: int = 2
    num_channel_initial: int = 16
    depth: int = 3
    pooling: bool = True
    encode_kernel_sizes: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu GlobalNet is 3D")
        image_size = x.shape[1:4]
        for d in image_size:
            if d % (2 ** self.depth) != 0:
                raise ValueError(f"GlobalNet requires spatial dims divisible "
                                 f"by 2^depth={2 ** self.depth}, got {image_size}")
        widths = [self.num_channel_initial * 2 ** d
                  for d in range(self.depth + 1)]
        ks = self.encode_kernel_sizes
        for d in range(self.depth):
            k = ks[d] if isinstance(ks, (tuple, list)) else ks
            x = EncodeBlock(widths[d], k, name=f"encode_{d}")(x, train)
            if self.pooling:
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            else:
                x = FastConv(widths[d], (3, 3, 3), strides=(2, 2, 2),
                             use_bias=False, name=f"pool_conv_{d}")(x)
        x = EncodeBlock(widths[self.depth], name="bottom")(x, train)
        theta = AffineHead(name="affine_head")(x)  # (N, 3, 4)

        # grid of voxel coords (D, H, W, 3); theta@grid via multiply-adds
        axes = [jnp.arange(s, dtype=jnp.float32) for s in image_size]
        grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        gh = jnp.concatenate([grid, jnp.ones(image_size + (1,))], axis=-1)
        # (N,3,4) x (D,H,W,4) -> (N,D,H,W,3), elementwise form
        warped = jnp.sum(theta[:, None, None, None, :, :]
                         * gh[None, :, :, :, None, :], axis=-1)
        return warped - grid[None]


class LocalNet(RegUNet):
    """monai.networks.nets.LocalNet: kernel-7 first encode, additive skips,
    multi-level extraction (defaults to all levels up to depth)."""
    extract_levels: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        if self.extract_levels is None:
            object.__setattr__(self, "extract_levels",
                               tuple(range(self.depth + 1)))
        object.__setattr__(self, "encode_kernel_sizes",
                           (7,) + (3,) * self.depth)
        super().__post_init__()


def warp_image(image: jnp.ndarray, ddf: jnp.ndarray,
               mode: str = "trilinear") -> jnp.ndarray:
    """Warp NDHWC ``image`` by a voxel-unit displacement field
    ``ddf (N, D, H, W, 3)``: out(p) = image(p + ddf(p)). Zero padding
    outside the volume (monai.networks.blocks.Warp semantics)."""
    spatial = image.shape[1:4]
    axes = [jnp.arange(s, dtype=jnp.float32) for s in spatial]
    base = jnp.stack(jnp.meshgrid(*axes, indexing="ij"))  # (3, D, H, W)
    out = []
    for n in range(image.shape[0]):
        coords = base + jnp.transpose(ddf[n], (3, 0, 1, 2))
        vol = jnp.transpose(image[n], (3, 0, 1, 2))
        out.append(jnp.transpose(sample_at_coords(vol, coords, mode=mode),
                                 (1, 2, 3, 0)))
    return jnp.stack(out)
