"""Standalone ``ViT`` / ``ViTAutoEnc``, config-resolvable by MONAI names.

Parity: the reference's model namespace exposes every `monai.networks.nets`
class (`/root/reference/unet3d/models/pytorch/__init__.py:1`), including the
vision transformers (monai/networks/nets/vit.py, vitautoenc.py). UNETR
(models/unetr.py) already carries the transformer stack as its backbone;
these classes expose it standalone with MONAI's call contracts:

- ViT: conv patch embedding + learned position embedding + ``num_layers``
  TransformerBlocks, returning ``(tokens_or_logits, hidden_states)``. With
  ``classification=True`` a cls token is prepended and the head is
  Dense(num_classes) over the cls token with an optional ``post_activation``
  (MONAI default "Tanh").
- ViTAutoEnc: same encoder; the normalized tokens are reshaped back onto the
  patch grid and upsampled with TWO transposed convs (MONAI hardcodes
  kernel = stride = 4 for both, i.e. x16 total — valid only for its default
  16-cubed patches; here the per-axis factors are the generalized
  decomposition ``s1*s2 = patch`` with ``s1 = min(4, patch)`` so other patch
  sizes still reconstruct the input extent): hidden -> ``deconv_chns`` ->
  ``out_channels``. Returns ``(reconstruction, hidden_states)``.

All matmuls are MXU-shaped (token x hidden dense contractions); bf16-safe.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.layers import transposed_conv
from unet3d_tpu.models.unetr import TransformerBlock


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * 3


class ViT(nn.Module):
    """monai.networks.nets.ViT config surface (spatial_dims fixed to 3)."""
    in_channels: int = 1
    img_size: Tuple[int, ...] = (96, 96, 96)
    patch_size: Tuple[int, ...] = (16, 16, 16)
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    classification: bool = False
    num_classes: int = 2
    dropout_rate: float = 0.0
    post_activation: Optional[str] = "Tanh"
    spatial_dims: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu ViT is 3D")
        p = _triple(self.patch_size)
        x = nn.Conv(self.hidden_size, p, strides=p, padding="VALID",
                    name="patch_embedding")(x)
        n, gd, gh, gw, c = x.shape
        x = x.reshape(n, gd * gh * gw, c)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, gd * gh * gw, c))
        x = x + pos.astype(x.dtype)
        if self.classification:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.hidden_size))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (n, 1, c)), x], axis=1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        states = []
        for i in range(self.num_layers):
            x = TransformerBlock(self.hidden_size, self.mlp_dim,
                                 self.num_heads, self.dropout_rate,
                                 name=f"block{i}")(x, train)
            states.append(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.classification:
            logits = nn.Dense(self.num_classes,
                              name="classification_head")(x[:, 0])
            if (self.post_activation or "").lower() == "tanh":
                logits = nn.tanh(logits)
            return logits, states
        return x, states


class ViTAutoEnc(nn.Module):
    """monai.networks.nets.ViTAutoEnc config surface (spatial_dims fixed 3)."""
    in_channels: int = 1
    img_size: Tuple[int, ...] = (96, 96, 96)
    patch_size: Tuple[int, ...] = (16, 16, 16)
    out_channels: int = 1
    deconv_chns: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    dropout_rate: float = 0.0
    spatial_dims: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu ViTAutoEnc is 3D")
        p = _triple(self.patch_size)
        x = nn.Conv(self.hidden_size, p, strides=p, padding="VALID",
                    name="patch_embedding")(x)
        n, gd, gh, gw, c = x.shape
        x = x.reshape(n, gd * gh * gw, c)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, gd * gh * gw, c))
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        states = []
        for i in range(self.num_layers):
            x = TransformerBlock(self.hidden_size, self.mlp_dim,
                                 self.num_heads, self.dropout_rate,
                                 name=f"block{i}")(x, train)
            states.append(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = x.reshape(n, gd, gh, gw, c)
        # MONAI: conv3d_transpose (hidden -> deconv_chns) then
        # conv3d_transpose_1 (deconv_chns -> out_channels), kernel == stride
        s1 = tuple(min(4, v) for v in p)
        s2 = tuple(v // a for v, a in zip(p, s1))
        x = transposed_conv(self.deconv_chns, s1, s1,
                            name="conv3d_transpose")(x)
        x = transposed_conv(self.out_channels, s2, s2,
                            name="conv3d_transpose_1")(x)
        return x, states
