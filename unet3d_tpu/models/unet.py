"""Skip-connected U-Net assembled from Myronenko encoder/decoder.

Parity: `unet3d/models/pytorch/segmentation/unet.py:47-70` (UNet3D,
AutoImplantUNet with residual y - x output and raw ``test`` path), with the
reference's missing-import bug in the decoder fixed (SURVEY.md §2.4).
``AutocastUNet`` exists for API parity; on TPU mixed precision is handled by the
trainer's bf16 compute dtype, not per-model autocast.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.decoder import UNetDecoder
from unet3d_tpu.models.layers import conv1
from unet3d_tpu.models.myronenko import MyronenkoEncoder
from unet3d_tpu.models.variational import _activation


class UNet3D(nn.Module):
    n_features: int = 1
    base_width: int = 32
    encoder_blocks: Tuple[int, ...] = (1, 2, 2, 4)
    decoder_blocks: Optional[Tuple[int, ...]] = None
    feature_dilation: int = 2
    downsampling_stride: int = 2
    interpolation_mode: str = "trilinear"
    n_outputs: int = 1
    layer_widths: Optional[Tuple[int, ...]] = None
    activation: Optional[str] = None
    use_transposed_convolutions: bool = False
    kernel_size: int = 3

    def _forward(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        skips = MyronenkoEncoder(base_width=self.base_width,
                                 layer_blocks=tuple(self.encoder_blocks),
                                 feature_dilation=self.feature_dilation,
                                 downsampling_stride=self.downsampling_stride,
                                 layer_widths=self.layer_widths,
                                 kernel_size=self.kernel_size,
                                 collect_skips=True, name="encoder")(x, train=train)
        blocks = self.decoder_blocks or tuple([1] * len(self.encoder_blocks))
        y = UNetDecoder(base_width=self.base_width, layer_blocks=tuple(blocks),
                        upsampling_scale=self.downsampling_stride,
                        feature_reduction_scale=self.feature_dilation,
                        upsampling_mode=self.interpolation_mode,
                        layer_widths=self.layer_widths,
                        use_transposed_convolutions=self.use_transposed_convolutions,
                        kernel_size=self.kernel_size, name="decoder")(skips, train=train)
        y = conv1(self.n_outputs, use_bias=False, name="final_convolution")(y)
        act = _activation(self.activation)
        return act(y) if act else y

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self._forward(x, train)


class AutocastUNet(UNet3D):
    """API-parity alias (`unet.py:53-58`); precision policy lives in the trainer."""
    pass


class AutoImplantUNet(UNet3D):
    """Residual-output U-Net: forward returns y - x (`unet.py:61-70`)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 test: bool = False) -> jnp.ndarray:
        y = self._forward(x, train)
        if test:
            return y  # `.test()` returns the raw network output (`unet.py:69-70`)
        return y - x
