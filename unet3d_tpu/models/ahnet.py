"""AHNet — Liu et al. 2018 anisotropic hybrid network (3D).

Parity: the reference resolves any ``monai.networks.nets`` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`); ``AHNet`` is one of
the namespace names. Native Flax/NDHWC implementation of MONAI's config
surface: ``layers`` (bottleneck counts), ``spatial_dims`` (3 only here),
``in_channels``/``out_channels``, ``psp_block_num`` (0..4), ``upsample_mode``
in {"transpose", "trilinear", "nearest"}. ``pretrained`` (2D-MRI transfer) is
rejected — there is no torch checkpoint to transfer from on TPU.

Architecture (paper-faithful; block-level hyperparameters follow Liu et al.
2018 §3 where MONAI's exact internals are not verifiable in this offline
image — divergences documented inline, same convention as SwinUNETR's
PatchMergingV2 note):

- **AH-ResNet encoder**: anisotropic stem conv (7,7,3)/(2,2,1) -> 64, BN+ReLU,
  3-cubed max-pool stride 2; four stages of ``Bottleneck3x3x1`` blocks
  (1x1x1 -> (3,3,1) -> 1x1x1, expansion 4) with a parallel (1,1,3) max-pool
  branch added after the spatial conv for through-plane context — MONAI's
  device for transferring 2D kernels to 3D. Stage strides (1,2,2,2) applied
  **in-plane only** — MONAI's Bottleneck3x3x1 strides are (s,s,1) — so the
  through-plane axis is reduced once (stem pool) and otherwise kept; the
  anisotropic axis is the LAST spatial dim, mirroring MONAI's (..., z) kernel
  tuples.
- **FCN decoder**: 1x1 projections of the four stage outputs to 64 channels,
  progressively upsampled (x2) and summed — the paper's feature-pyramid sum.
- **Pseudo-3D dense block**: 4 dense layers, growth 16: BN-ReLU-1x1 ->
  BN-ReLU-(3,3,1) -> BN-ReLU-(1,1,3) with the P3D residual sum of the two
  anisotropic paths, then 1x1 back to the growth width; dense concatenation.
- **PSP head**: ``psp_block_num`` anisotropic pyramid levels — in-plane pool
  by 2**(i+1), pointwise conv to one channel, upsample back — concatenated
  onto the dense features (64 + 16*4 + psp channels), final 1x1 conv and a x4
  upsample to input resolution.

Input spatial dims must be divisible by 32 in-plane and 2 through-plane.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(name: str, train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


def _max_pool(x, window, strides, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) + tuple(window) + (1,), (1,) + tuple(strides) + (1,),
        ((0, 0),) + tuple(padding) + ((0, 0),))


def _upsample(x: jnp.ndarray, scale: Tuple[int, int, int], mode: str,
              features: int, name: str) -> jnp.ndarray:
    if mode == "transpose":
        return nn.ConvTranspose(features, kernel_size=tuple(scale),
                                strides=tuple(scale), name=name)(x)
    new_shape = (x.shape[0],) + tuple(
        s * f for s, f in zip(x.shape[1:4], scale)) + (x.shape[4],)
    method = "trilinear" if mode == "trilinear" else "nearest"
    return jax.image.resize(x, new_shape, method=method)


class Bottleneck3x3x1(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # anisotropic downsampling: AH-Net only strides in-plane (MONAI's
        # Bottleneck3x3x1 conv2 stride is (s, s, 1) in 3D)
        s = (self.stride, self.stride, 1)
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(_bn("bn1", train)(out))
        # explicit symmetric pads: XLA "SAME" places strided pads lo=0/hi=1,
        # which shifts vs torch Conv3d(padding=(1,1,0)) (see FastConv note)
        out = nn.Conv(self.planes, (3, 3, 1), strides=s,
                      padding=((1, 1), (1, 1), (0, 0)),
                      use_bias=False, name="conv2")(out)
        # through-plane context: parallel (1,1,3) max-pool summed in (the 2D
        # kernel's z-extension in MONAI's AHNet)
        out = out + _max_pool(out, (1, 1, 3), (1, 1, 1),
                              ((0, 0), (0, 0), (1, 1)))
        out = nn.relu(_bn("bn2", train)(out))
        out = nn.Conv(self.planes * 4, (1, 1, 1), use_bias=False,
                      name="conv3")(out)
        out = _bn("bn3", train)(out)
        residual = x
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1, 1), strides=s,
                               use_bias=False, name="down_conv")(x)
            residual = _bn("down_bn", train)(residual)
        return nn.relu(out + residual)


class Pseudo3DLayer(nn.Module):
    growth_rate: int = 16
    bn_size: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inter = self.bn_size * self.growth_rate
        y = nn.relu(_bn("bn1", train)(x))
        y = nn.Conv(inter, (1, 1, 1), use_bias=False, name="conv1")(y)
        y = nn.relu(_bn("bn2", train)(y))
        y2d = nn.Conv(inter, (3, 3, 1), padding="SAME", use_bias=False,
                      name="conv2d")(y)
        z = nn.relu(_bn("bn3", train)(y2d))
        z1d = nn.Conv(inter, (1, 1, 3), padding="SAME", use_bias=False,
                      name="conv1d")(z)
        y = y2d + z1d  # P3D-B residual combination of the anisotropic paths
        y = nn.relu(_bn("bn4", train)(y))
        y = nn.Conv(self.growth_rate, (1, 1, 1), use_bias=False,
                    name="conv_out")(y)
        return jnp.concatenate([x, y], axis=-1)


class PSP(nn.Module):
    """Anisotropic pyramid pooling: in-plane pools of 4/8/16/32."""
    psp_block_num: int
    upsample_mode: str = "transpose"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        outs = []
        for i in range(self.psp_block_num):
            # clamp each level to the feature extent: the deepest levels
            # degrade to global in-plane pooling on small inputs
            kh = min(2 ** (i + 1), x.shape[1])
            kw = min(2 ** (i + 1), x.shape[2])
            p = _max_pool(x, (kh, kw, 1), (kh, kw, 1), ((0, 0), (0, 0), (0, 0)))
            p = nn.Conv(1, (1, 1, 1), name=f"proj{i}")(p)
            p = _upsample(p, (kh, kw, 1), self.upsample_mode, 1, f"up{i}")
            outs.append(p)
        return jnp.concatenate(outs, axis=-1)


class AHNet(nn.Module):
    """MONAI ``AHNet`` config surface (spatial_dims fixed to 3)."""
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    psp_block_num: int = 4
    upsample_mode: str = "transpose"
    pretrained: bool = False
    progress: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("AHNet here is the 3D TPU path; "
                                      "use a 2D net for spatial_dims=2")
        if self.pretrained:
            raise NotImplementedError(
                "AHNet(pretrained=True) transfers torch MRI weights; no torch "
                "checkpoint exists on this TPU-native path")
        if not 0 <= self.psp_block_num <= 4:
            raise ValueError("psp_block_num must be in 0..4")
        for i, d in enumerate(x.shape[1:4]):
            need = 2 if i == 2 else 32
            if d % need:
                raise ValueError(f"AHNet: spatial dim {i} = {d} must be "
                                 f"divisible by {need}")
        # torch Conv3d(padding=(3,3,1)) symmetric stem pads (strided SAME
        # would shift in-plane by one voxel vs torch)
        h = nn.Conv(64, (7, 7, 3), strides=(2, 2, 1),
                    padding=((3, 3), (3, 3), (1, 1)),
                    use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn0", train)(h))
        h = _max_pool(h, (3, 3, 3), (2, 2, 2), ((1, 1), (1, 1), (1, 1)))

        feats = []
        planes = (64, 128, 256, 512)
        for li, (n_blocks, p) in enumerate(zip(self.layers, planes)):
            for b in range(n_blocks):
                stride = 2 if (li > 0 and b == 0) else 1
                down = b == 0  # channel growth (and stride) on the first block
                h = Bottleneck3x3x1(p, stride, down,
                                    name=f"layer{li + 1}_{b}")(h, train)
            feats.append(h)

        # FCN feature-pyramid decoder: project every stage to 64 and sum up.
        y = nn.Conv(64, (1, 1, 1), name="proj4")(feats[3])
        for li in (2, 1, 0):
            y = _upsample(y, (2, 2, 1), self.upsample_mode, 64, f"up{li + 1}")
            y = y + nn.Conv(64, (1, 1, 1), name=f"proj{li + 1}")(feats[li])

        for i in range(4):
            y = Pseudo3DLayer(name=f"dense{i}")(y, train)

        if self.psp_block_num > 0:
            psp = PSP(self.psp_block_num, self.upsample_mode, name="psp")(
                y, train)
            y = jnp.concatenate([psp, y], axis=-1)
        y = nn.Conv(self.out_channels, (1, 1, 1), name="final_conv")(y)
        # back to input resolution: undo stem conv (2,2,1) + stem pool (2,2,2)
        return _upsample(y, (4, 4, 2), self.upsample_mode, self.out_channels,
                         "final_up")
