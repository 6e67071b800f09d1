"""UNETR — transformer-encoder U-Net, config-resolvable by its MONAI name.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`); UNETR is the most
requested transformer segmenter. This is a native Flax/NDHWC implementation of
the MONAI ``UNETR`` topology (Hatamizadeh et al., WACV 2022):

- ViT encoder: conv patch embedding (k = s = ``patch_size``), learnable
  positional embeddings, ``num_layers`` pre-norm transformer blocks
  (LN -> MHSA -> residual, LN -> GELU MLP -> residual), hidden states tapped
  every ``num_layers // 4`` blocks.
- Conv decoder: the tapped sequence states are reshaped back onto the
  (D/p, H/p, W/p) grid and progressively deconvolved (UnetrPrUpBlock), then
  merged top-down with transposed-conv + concat + conv blocks (UnetrUpBlock,
  reusing the DynUNet blocks), ending in a 1-cubed head.

Transformer compute is pure MXU food: attention over (img/patch)^3 tokens
(216 for 96-cubed inputs) with hidden 768 runs as dense matmuls; the einsum
formulation keeps everything channels-last.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from unet3d_tpu.models.dynunet import UnetBasicBlock, UnetResBlock
from unet3d_tpu.models.layers import PointwiseConv, _triple, transposed_conv


class SelfAttention(nn.Module):
    """MONAI SABlock conventions: bias-free packed qkv, BIASED out projection
    (flax MultiHeadDotProductAttention(use_bias=False) would drop the
    out-projection bias MONAI keeps), scale = head_dim^-0.5."""
    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        heads = self.num_heads
        head_dim = self.hidden_size // heads
        qkv = nn.Dense(3 * self.hidden_size, use_bias=False, name="qkv")(x)
        n, t, _ = qkv.shape
        qkv = qkv.reshape(n, t, 3, heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (N, T, H, hd)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, x.dtype))
        attn = nn.softmax(attn, axis=-1)
        if self.dropout_rate:
            attn = nn.Dropout(self.dropout_rate,
                              deterministic=not train)(attn)
        y = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, -1)
        y = nn.Dense(self.hidden_size, use_bias=True, name="out_proj")(y)
        if self.dropout_rate:
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


class TransformerBlock(nn.Module):
    hidden_size: int
    mlp_dim: int
    num_heads: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = SelfAttention(self.hidden_size, self.num_heads,
                          self.dropout_rate, name="attn")(h, train)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, name="mlp1")(h)
        # exact erf GELU (torch/MONAI default); flax defaults to tanh approx
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(self.hidden_size, name="mlp2")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return x + h


class ViT(nn.Module):
    """Patch-embedding + transformer stack returning all block outputs."""
    hidden_size: int
    mlp_dim: int
    num_layers: int
    num_heads: int
    patch_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.hidden_size, (p, p, p), strides=(p, p, p),
                    padding="VALID", name="patch_embedding")(x)
        n, gd, gh, gw, c = x.shape
        x = x.reshape(n, gd * gh * gw, c)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, gd * gh * gw, c))
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        states = []
        for i in range(self.num_layers):
            x = TransformerBlock(self.hidden_size, self.mlp_dim, self.num_heads,
                                 self.dropout_rate, name=f"block{i}")(x, train)
            states.append(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x, states


class UnetrPrUpBlock(nn.Module):
    """Progressive deconv chain projecting a ViT state to a skip resolution."""
    out_channels: int
    num_layer: int
    kernel_size: Union[int, Sequence[int]] = 3
    res_block: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = transposed_conv(self.out_channels, 2, 2, use_bias=False,
                            name="transp_conv_init")(x)
        block = UnetResBlock if self.res_block else UnetBasicBlock
        for i in range(self.num_layer):
            x = transposed_conv(self.out_channels, 2, 2, use_bias=False,
                                name=f"transp_{i}")(x)
            x = block(self.out_channels, self.kernel_size, 1,
                      name=f"conv_{i}")(x)
        return x


class UnetrUpBlock(nn.Module):
    """Transposed-conv upsample + skip concat + conv block (decoder rung)."""
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    res_block: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = transposed_conv(self.out_channels, 2, 2, use_bias=False,
                            name="transp_conv")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        block = UnetResBlock if self.res_block else UnetBasicBlock
        return block(self.out_channels, self.kernel_size, 1,
                     name="conv_block")(x)


class UNETR(nn.Module):
    """MONAI UNETR config surface (spatial_dims fixed to 3, NDHWC)."""
    in_channels: int = 1
    out_channels: int = 2
    img_size: Union[int, Tuple[int, int, int]] = 96
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    dropout_rate: float = 0.0
    res_block: bool = True
    spatial_dims: int = 3

    # MONAI UNETR hardcodes the 16-cubed patch: the decoder's deconv-chain
    # depths (3/2/1 per skip) are built around grid = img/16
    patch_size: int = 16

    def _grid(self):
        img = _triple(self.img_size)
        p = self.patch_size
        if any(s % p for s in img):
            raise ValueError(f"img_size {img} not divisible by patch {p}")
        return tuple(s // p for s in img)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu UNETR is 3D")
        grid = self._grid()
        if tuple(x.shape[1:4]) != _triple(self.img_size):
            raise ValueError(f"UNETR built for img_size {_triple(self.img_size)}, "
                             f"got input spatial {x.shape[1:4]}")

        seq, states = ViT(self.hidden_size, self.mlp_dim, self.num_layers,
                          self.num_heads, self.patch_size, self.dropout_rate,
                          name="vit")(x, train)

        def proj(z):
            n = z.shape[0]
            return z.reshape(n, *grid, self.hidden_size)

        # MONAI taps hidden_states_out[3]/[6]/[9] — the outputs of blocks
        # 4/7/10 — i.e. states[tap]/[2*tap]/[3*tap] here (states[i] is the
        # output of 0-indexed block i)
        tap = self.num_layers // 4
        fs = self.feature_size
        block = UnetResBlock if self.res_block else UnetBasicBlock
        enc1 = block(fs, 3, 1, name="encoder1")(x)
        enc2 = UnetrPrUpBlock(fs * 2, num_layer=2, res_block=self.res_block,
                              name="encoder2")(proj(states[tap]), train)
        enc3 = UnetrPrUpBlock(fs * 4, num_layer=1, res_block=self.res_block,
                              name="encoder3")(proj(states[2 * tap]), train)
        enc4 = UnetrPrUpBlock(fs * 8, num_layer=0, res_block=self.res_block,
                              name="encoder4")(proj(states[3 * tap]), train)
        dec4 = proj(seq)
        dec3 = UnetrUpBlock(fs * 8, res_block=self.res_block,
                            name="decoder5")(dec4, enc4)
        dec2 = UnetrUpBlock(fs * 4, res_block=self.res_block,
                            name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(fs * 2, res_block=self.res_block,
                            name="decoder3")(dec2, enc2)
        out = UnetrUpBlock(fs, res_block=self.res_block,
                           name="decoder2")(dec1, enc1)
        return PointwiseConv(self.out_channels, name="out")(out)
