"""BasicUNetPlusPlus — MONAI's UNet++ on BasicUNet blocks, config-resolvable.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`). Native Flax/NDHWC
implementation of ``monai.networks.nets.BasicUNetPlusPlus`` (Zhou et al. 2018
nested U-Net) on the same TwoConv/max-pool/UpCat blocks as BasicUNet
(models/basicunet.py):

- encoder column x_{i,0} like BasicUNet; nested columns x_{i,j} where each
  UpCat upsamples x_{i+1,j-1} and concatenates ALL previous same-row features
  x_{i,0..j-1}; top-row UpCats do not halve the upsample width
  (MONAI ``halves=False``).
- four pointwise heads on x_{0,1..4}.

Deep-supervision output convention (matches models/segresnet_ds.py): MONAI
returns a list of tensors; jit-traced pytree outputs must have static
structure, so with ``deep_supervision`` in train mode the four full-resolution
heads are stacked along axis 1, and eval (or ``deep_supervision=False``)
returns only the final head x_{0,4}.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.basicunet import TwoConv, UpCat, _max_pool2
from unet3d_tpu.models.layers import conv1


class BasicUNetPlusPlus(nn.Module):
    """MONAI BasicUNetPlusPlus config surface (spatial_dims fixed to 3)."""
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 2
    features: Tuple[int, ...] = (32, 32, 64, 128, 256, 32)
    deep_supervision: bool = False
    dropout: float = 0.0
    upsample: str = "deconv"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu BasicUNetPlusPlus is 3D")
        fea, dr = self.features, self.dropout
        x_0_0 = TwoConv(fea[0], dr, name="conv_0_0")(x, train)
        x_1_0 = TwoConv(fea[1], dr, name="conv_1_0")(_max_pool2(x_0_0), train)
        x_0_1 = UpCat(fea[1], fea[0], dr, name="upcat_0_1")(x_1_0, x_0_0, train)

        x_2_0 = TwoConv(fea[2], dr, name="conv_2_0")(_max_pool2(x_1_0), train)
        x_1_1 = UpCat(fea[2] // 2, fea[1], dr, name="upcat_1_1")(
            x_2_0, x_1_0, train)
        x_0_2 = UpCat(fea[1], fea[0], dr, name="upcat_0_2")(
            x_1_1, jnp.concatenate([x_0_0, x_0_1], axis=-1), train)

        x_3_0 = TwoConv(fea[3], dr, name="conv_3_0")(_max_pool2(x_2_0), train)
        x_2_1 = UpCat(fea[3] // 2, fea[2], dr, name="upcat_2_1")(
            x_3_0, x_2_0, train)
        x_1_2 = UpCat(fea[2] // 2, fea[1], dr, name="upcat_1_2")(
            x_2_1, jnp.concatenate([x_1_0, x_1_1], axis=-1), train)
        x_0_3 = UpCat(fea[1], fea[0], dr, name="upcat_0_3")(
            x_1_2, jnp.concatenate([x_0_0, x_0_1, x_0_2], axis=-1), train)

        x_4_0 = TwoConv(fea[4], dr, name="conv_4_0")(_max_pool2(x_3_0), train)
        x_3_1 = UpCat(fea[4] // 2, fea[3], dr, name="upcat_3_1")(
            x_4_0, x_3_0, train)
        x_2_2 = UpCat(fea[3] // 2, fea[2], dr, name="upcat_2_2")(
            x_3_1, jnp.concatenate([x_2_0, x_2_1], axis=-1), train)
        x_1_3 = UpCat(fea[2] // 2, fea[1], dr, name="upcat_1_3")(
            x_2_2, jnp.concatenate([x_1_0, x_1_1, x_1_2], axis=-1), train)
        x_0_4 = UpCat(fea[1], fea[5], dr, name="upcat_0_4")(
            x_1_3, jnp.concatenate([x_0_0, x_0_1, x_0_2, x_0_3], axis=-1),
            train)

        out = conv1(self.out_channels, name="final_conv_0_4")(x_0_4)
        if self.deep_supervision:
            # heads are created unconditionally so init(train=False) and a
            # later train-mode apply see the same parameter tree
            heads = [conv1(self.out_channels, name=f"final_conv_0_{j}")(feat)
                     for j, feat in ((1, x_0_1), (2, x_0_2), (3, x_0_3))]
            if train:
                return jnp.stack(heads + [out], axis=1)
        return out
