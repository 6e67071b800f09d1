"""SwinUNETR — Hatamizadeh et al. 2022, config-resolvable by its MONAI name.

Parity: the reference resolves any `monai.networks.nets` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`). Native Flax/NDHWC
implementation of the ``monai.networks.nets.SwinUNETR`` topology:

- Swin Transformer 3D encoder: conv patch embedding (k = s = 2), 4 stages of
  ``depths`` SwinTransformerBlocks alternating window / shifted-window MSA
  with learned relative-position bias, PatchMerging (2x2x2 concat -> LN ->
  linear) between stages; hidden states tapped after the embedding and every
  stage.
- UNETR-style conv decoder: UnetResBlocks on the input and each tapped state,
  transposed-conv + concat + UnetResBlock rungs back to full resolution
  (blocks shared with models/unetr.py / models/dynunet.py), pointwise head.

TPU notes: window partitioning is pure reshape/transpose; shifted windows use
jnp.roll; the boundary attention mask and relative-position index are
precomputed in numpy at trace time (static shapes), so the attention itself
is dense batched einsum MXU work at (n_windows, window_volume, C).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.models.dynunet import UnetResBlock
from unet3d_tpu.models.layers import PointwiseConv, _triple
from unet3d_tpu.models.unetr import UnetrUpBlock


def _window_partition(x: jnp.ndarray, ws: Tuple[int, int, int]) -> jnp.ndarray:
    """(n, d, h, w, c) -> (n * n_windows, prod(ws), c)."""
    n, d, h, w, c = x.shape
    x = x.reshape(n, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(-1, ws[0] * ws[1] * ws[2], c)


def _window_reverse(x: jnp.ndarray, ws: Tuple[int, int, int],
                    dims: Tuple[int, int, int, int]) -> jnp.ndarray:
    n, d, h, w = dims
    x = x.reshape(n, d // ws[0], h // ws[1], w // ws[2], ws[0], ws[1], ws[2], -1)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6, 7))
    return x.reshape(n, d, h, w, x.shape[-1])


def _relative_position_index(ws: Tuple[int, int, int]) -> np.ndarray:
    """Flattened pairwise relative-position -> bias-table row (static numpy)."""
    coords = np.stack(np.meshgrid(np.arange(ws[0]), np.arange(ws[1]),
                                  np.arange(ws[2]), indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws[0] - 1
    rel[:, :, 1] += ws[1] - 1
    rel[:, :, 2] += ws[2] - 1
    rel[:, :, 0] *= (2 * ws[1] - 1) * (2 * ws[2] - 1)
    rel[:, :, 1] *= (2 * ws[2] - 1)
    return rel.sum(-1)


def _shift_attn_mask(dims: Tuple[int, int, int], ws: Tuple[int, int, int],
                     shift: Tuple[int, int, int]) -> np.ndarray:
    """Swin boundary mask for shifted windows: -inf between regions that were
    not neighbors before the roll. Returns (n_windows, vol, vol) float32."""
    img = np.zeros(dims, np.int32)
    cnt = 0
    for sd in (slice(0, -ws[0]), slice(-ws[0], -shift[0]), slice(-shift[0], None)):
        for sh in (slice(0, -ws[1]), slice(-ws[1], -shift[1]), slice(-shift[1], None)):
            for sw in (slice(0, -ws[2]), slice(-ws[2], -shift[2]), slice(-shift[2], None)):
                img[sd, sh, sw] = cnt
                cnt += 1
    d, h, w = dims
    win = img.reshape(d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2])
    win = win.transpose(0, 2, 4, 1, 3, 5).reshape(-1, ws[0] * ws[1] * ws[2])
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    qkv_bias: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None,
                 train: bool = False) -> jnp.ndarray:
        bw, nvol, c = x.shape
        head_dim = self.dim // self.num_heads
        ws = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1), self.num_heads))
        index = _relative_position_index(ws)  # static (vol, vol)
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(bw, nvol, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i] for i in range(3))
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        bias = table[index.reshape(-1)].reshape(nvol, nvol, -1)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, nvol, nvol)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, self.num_heads, nvol, nvol)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bw, nvol, c)
        y = nn.Dense(self.dim, name="proj")(y)
        # MONAI routes drop_rate to the attention output projection too
        return nn.Dropout(self.dropout_rate, deterministic=not train)(y)


class SwinTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift: bool = False
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n, d, h, w, c = x.shape
        ws = tuple(min(wsi, s) for wsi, s in zip(self.window_size, (d, h, w)))
        shift = tuple(wsi // 2 if (self.shift and s > wsi) else 0
                      for wsi, s in zip(ws, (d, h, w)))
        pad = tuple((-s) % wsi for s, wsi in zip((d, h, w), ws))

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if any(pad):
            y = jnp.pad(y, ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)))
        dims = (n, d + pad[0], h + pad[1], w + pad[2])
        if any(shift):
            y = jnp.roll(y, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            mask = jnp.asarray(_shift_attn_mask(dims[1:], ws, shift))
        else:
            mask = None
        win = _window_partition(y, ws)
        win = WindowAttention(c, self.num_heads, ws,
                              dropout_rate=self.dropout_rate,
                              name="attn")(win, mask, train)
        y = _window_reverse(win, ws, dims)
        if any(shift):
            y = jnp.roll(y, shift, axis=(1, 2, 3))
        if any(pad):
            y = y[:, :d, :h, :w]
        x = shortcut + y

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp1")(y)
        y = nn.gelu(y, approximate=False)  # torch-exact erf GELU
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Dense(c, name="mlp2")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2x2 neighborhood concat -> LayerNorm -> linear to 2*dim.

    This is MONAI's ``PatchMergingV2`` (all 8 distinct octants, the
    recommended ``downsample="mergingv2"``); MONAI's legacy v1 default
    duplicates two octants and omits two — intentionally not replicated."""
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, d, h, w, c = x.shape
        pad = (d % 2, h % 2, w % 2)
        if any(pad):
            x = jnp.pad(x, ((0, 0), (0, pad[0]), (0, pad[1]), (0, pad[2]), (0, 0)))
            d, h, w = d + pad[0], h + pad[1], w + pad[2]
        x = x.reshape(n, d // 2, 2, h // 2, 2, w // 2, 2, c)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
        x = x.reshape(n, d // 2, h // 2, w // 2, 8 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinUNETR(nn.Module):
    """MONAI SwinUNETR config surface (spatial_dims fixed to 3)."""
    img_size: Sequence[int] = (96, 96, 96)  # accepted for parity; not binding
    in_channels: int = 1
    out_channels: int = 2
    feature_size: int = 24
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 2
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    spatial_dims: int = 3
    norm_name: str = "instance"
    use_checkpoint: bool = False
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu SwinUNETR is 3D")
        spatial = x.shape[1:4]
        down = self.patch_size * (2 ** len(self.depths))
        if any(s % down for s in spatial):
            raise ValueError(
                f"SwinUNETR input spatial dims {spatial} must be divisible by "
                f"patch_size * 2^n_stages = {down}")
        ws = _triple(self.window_size)
        x_in = x

        # patch embedding (conv k = s = patch_size)
        p = _triple(self.patch_size)
        h = nn.Conv(self.feature_size, p, strides=p, padding="VALID",
                    name="patch_embed")(x)
        h = nn.Dropout(self.drop_rate, deterministic=not train)(h)  # pos_drop
        hidden = [h]
        dim = self.feature_size
        for stage, depth in enumerate(self.depths):
            for b in range(depth):
                h = SwinTransformerBlock(
                    dim, self.num_heads[stage], ws, shift=(b % 2 == 1),
                    mlp_ratio=self.mlp_ratio, dropout_rate=self.drop_rate,
                    name=f"stage{stage}_block{b}")(h, train)
            h = PatchMerging(dim, name=f"merge{stage}")(h)
            dim *= 2
            hidden.append(h)
        # hidden: [/2 f, /4 2f, /8 4f, /16 8f, /32 16f]
        if self.normalize:
            # MONAI proj_out: parameterless channel layer_norm on every
            # tapped state before the conv decoder (normalize=True default)
            def tap(hh):
                mean = jnp.mean(hh.astype(jnp.float32), axis=-1, keepdims=True)
                var = jnp.var(hh.astype(jnp.float32), axis=-1, keepdims=True)
                return ((hh.astype(jnp.float32) - mean)
                        * jax.lax.rsqrt(var + 1e-5)).astype(hh.dtype)
            hidden = [tap(hh) for hh in hidden]

        f = self.feature_size
        enc0 = UnetResBlock(f, name="encoder1")(x_in)
        enc1 = UnetResBlock(f, name="encoder2")(hidden[0])
        enc2 = UnetResBlock(2 * f, name="encoder3")(hidden[1])
        enc3 = UnetResBlock(4 * f, name="encoder4")(hidden[2])
        dec4 = UnetResBlock(16 * f, name="encoder10")(hidden[4])
        d3 = UnetrUpBlock(8 * f, name="decoder5")(dec4, hidden[3])
        d2 = UnetrUpBlock(4 * f, name="decoder4")(d3, enc3)
        d1 = UnetrUpBlock(2 * f, name="decoder3")(d2, enc2)
        d0 = UnetrUpBlock(f, name="decoder2")(d1, enc1)
        out = UnetrUpBlock(f, name="decoder1")(d0, enc0)
        return PointwiseConv(self.out_channels, name="out")(out)
