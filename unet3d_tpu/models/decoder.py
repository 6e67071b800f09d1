"""Decoders: mirrored, Myronenko, skip-concat U-Net, basic.

Parity: `unet3d/models/pytorch/classification/decoder.py` and the U-Net decoder of
`unet3d/models/pytorch/segmentation/unet.py:19-44` — with the reference's two
latent bugs fixed on purpose (SURVEY.md §2.4): the missing ``F`` import in
``UNetDecoder.forward`` and the ``kernal_size`` typo in ``MyronenkoDecoder``.

Upsampling is either 1x1x1 conv + trilinear interpolate (align_corners=False) or a
ConvTranspose (kernel 3, stride 2, torch padding 1 -> out = 2*in - 1), selected by
``use_transposed_convolutions`` exactly as in `decoder.py:85-106`.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import MyronenkoLayer, conv1, transposed_conv
from unet3d_tpu.ops.interpolate import upsample_ndhwc


def _center_pad_to(x: jnp.ndarray, target_spatial: Tuple[int, int, int]) -> jnp.ndarray:
    """Center pad-or-crop NDHWC spatial dims to ``target_spatial``.

    Reference ``F.pad`` (`unet.py:38-41`) accepts NEGATIVE pads, which crop —
    hit when interpolation upsampling overshoots an odd-sized skip (e.g. skip
    7 vs upsampled 8); jnp.pad would raise, so cropping is applied first."""
    slices = [slice(None)]
    pads = [(0, 0)]
    for s, t in zip(x.shape[1:4], target_spatial):
        diff = t - s
        if diff < 0:
            # crop: F.pad negative semantics. torch pads (diff//2, diff-diff//2);
            # floor division makes the START pad the more negative one, so the
            # larger crop (ceil(|diff|/2)) comes off the start of the dim.
            lo = -(diff // 2)
            slices.append(slice(lo, lo + t))
            pads.append((0, 0))
        else:
            slices.append(slice(None))
            pads.append((diff // 2, diff - diff // 2))
    slices.append(slice(None))
    pads.append((0, 0))
    x = x[tuple(slices)]
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return x


class MirroredDecoder(nn.Module):
    """Decoder mirroring the Myronenko encoder level-by-level (`decoder.py:78-131`)."""
    base_width: int = 32
    layer_blocks: Tuple[int, ...] = (1, 1, 1, 1)
    upsampling_scale: int = 2
    feature_reduction_scale: int = 2
    upsampling_mode: str = "trilinear"
    align_corners: bool = False
    layer_widths: Optional[Tuple[int, ...]] = None
    use_transposed_convolutions: bool = False
    kernel_size: int = 3
    # U-Net mode: concat skip connections (UNetDecoder, `unet.py:19-44`)
    skip_connections: bool = False

    def calculate_layer_widths(self, depth: int) -> Tuple[int, int]:
        """(in_width, out_width) at a given depth (`decoder.py:108-118`, doubled
        input for skip concat per `unet.py:20-25`)."""
        if self.layer_widths is not None:
            out_width = int(self.layer_widths[depth])
            in_width = int(self.layer_widths[depth + 1])
        else:
            if depth > 0:
                out_width = int(self.base_width * (self.feature_reduction_scale ** (depth - 1)))
                in_width = out_width * self.feature_reduction_scale
            else:
                out_width = self.base_width
                in_width = self.base_width
        if self.skip_connections and depth != len(self.layer_blocks) - 1:
            in_width *= 2
        return in_width, out_width

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        inputs: Optional[List[jnp.ndarray]] = None
        if self.skip_connections:
            inputs = list(x)
            x = inputs[0]
        n = len(self.layer_blocks)
        for i, n_blocks in enumerate(self.layer_blocks):
            depth = n - (i + 1)
            in_width, out_width = self.calculate_layer_widths(depth)
            if depth != 0:
                x = MyronenkoLayer(n_blocks=n_blocks, planes=in_width,
                                   kernel_size=self.kernel_size, name=f"layer{i}")(x, train=train)
                if self.use_transposed_convolutions:
                    x = transposed_conv(out_width, self.kernel_size,
                                        self.upsampling_scale, name=f"up{i}")(x)
                else:
                    x = conv1(out_width, use_bias=False, name=f"pre{i}")(x)
                    x = upsample_ndhwc(x, self.upsampling_scale, self.upsampling_mode,
                                       self.align_corners)
                if inputs is not None:
                    skip = inputs[i + 1]
                    x = _center_pad_to(x, skip.shape[1:4])
                    x = jnp.concatenate([x, skip], axis=-1)
            else:
                x = MyronenkoLayer(n_blocks=n_blocks, planes=out_width,
                                   kernel_size=self.kernel_size, name=f"layer{i}")(x, train=train)
        return x


class UNetDecoder(MirroredDecoder):
    """Skip-concat decoder (`unet.py:19-44`); input-width doubling handled by
    ``calculate_layer_widths``."""
    skip_connections: bool = True


class MyronenkoDecoder(nn.Module):
    """Non-mirrored decoder: upsample first, then blocks (`decoder.py:36-75`)."""
    base_width: int = 32
    layer_blocks: Tuple[int, ...] = (1, 1, 1)
    upsampling_scale: int = 2
    feature_reduction_scale: int = 2
    upsampling_mode: str = "trilinear"
    align_corners: bool = False
    layer_widths: Optional[Tuple[int, ...]] = None
    use_transposed_convolutions: bool = False
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        n = len(self.layer_blocks)
        for i, n_blocks in enumerate(self.layer_blocks):
            depth = n - (i + 1)
            if self.layer_widths is not None:
                out_width = int(self.layer_widths[depth])
            else:
                out_width = int(self.base_width * (self.feature_reduction_scale ** depth))
            # NOTE: reference `decoder.py:55-63` swaps the two branches relative to
            # MirroredDecoder; behavioral intent (conv1+interp vs transposed) is kept.
            if self.use_transposed_convolutions:
                x = transposed_conv(out_width, self.kernel_size,
                                    self.upsampling_scale, name=f"up{i}")(x)
            else:
                x = conv1(out_width, use_bias=False, name=f"pre{i}")(x)
                x = upsample_ndhwc(x, self.upsampling_scale, self.upsampling_mode,
                                   self.align_corners)
            x = MyronenkoLayer(n_blocks=n_blocks, planes=out_width,
                               kernel_size=self.kernel_size, name=f"layer{i}")(x, train=train)
        return x
