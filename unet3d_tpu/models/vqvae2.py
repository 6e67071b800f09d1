"""3D VQ-VAE-2: two-level vector-quantized autoencoder with EMA codebooks.

Parity: `unet3d/models/pytorch/autoencoder/vqvae2.py` (3D port of the
sonnet/rosinality VQ-VAE-2): bottom stride-4 and top stride-2 encoders,
straight-through estimator, EMA codebook updates, top decoder feeding the bottom
quantizer, joint decoder. NDHWC layout (the reference permutes to channels-last
for quantization anyway — on TPU we simply stay there).

Codebook state (embed / cluster_size / embed_avg) lives in the ``codebook``
variable collection and is EMA-updated when called with ``train=True`` and
``mutable=["codebook"]`` — the Flax analog of torch buffers mutated in forward.
The distance argmin + segment-sum ride the MXU as plain matmuls.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet3d_tpu.models.layers import transposed_conv


class Quantize(nn.Module):
    """EMA vector quantizer (`vqvae2.py:26-71`)."""
    dim: int
    n_embed: int
    decay: float = 0.99
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        embed = self.variable("codebook", "embed",
                              lambda: jax.random.normal(
                                  self.make_rng("params") if self.has_rng("params")
                                  else jax.random.PRNGKey(0),
                                  (self.dim, self.n_embed)))
        cluster_size = self.variable("codebook", "cluster_size",
                                     lambda: jnp.zeros((self.n_embed,)))
        # materialize a distinct buffer: aliasing embed would break jit donation
        embed_avg = self.variable("codebook", "embed_avg",
                                  lambda: jnp.array(embed.value, copy=True))

        flatten = x.reshape(-1, self.dim)
        dist = (jnp.sum(flatten ** 2, axis=1, keepdims=True)
                - 2.0 * flatten @ embed.value
                + jnp.sum(embed.value ** 2, axis=0, keepdims=True))
        embed_ind = jnp.argmin(dist, axis=1)
        embed_onehot = jax.nn.one_hot(embed_ind, self.n_embed, dtype=flatten.dtype)
        embed_ind = embed_ind.reshape(x.shape[:-1])
        quantize = self.embed_code(embed_ind, embed.value)

        if train and not self.is_initializing():
            new_cluster = cluster_size.value * self.decay + \
                (1 - self.decay) * jnp.sum(embed_onehot, axis=0)
            embed_sum = flatten.T @ embed_onehot
            new_avg = embed_avg.value * self.decay + (1 - self.decay) * embed_sum
            n = jnp.sum(new_cluster)
            normalized_cluster = ((new_cluster + self.eps)
                                  / (n + self.n_embed * self.eps) * n)
            cluster_size.value = new_cluster
            embed_avg.value = new_avg
            embed.value = new_avg / normalized_cluster[None, :]

        diff = jnp.mean((jax.lax.stop_gradient(quantize) - x) ** 2)
        quantize = x + jax.lax.stop_gradient(quantize - x)  # straight-through
        return quantize, diff, embed_ind

    @staticmethod
    def embed_code(embed_id: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(embed.T, embed_id, axis=0)


class ResBlock(nn.Module):
    channel: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # the reference's ReLU(inplace=True) mutates its input, so the
        # residual it adds is relu(x), not x (`vqvae2.py:78-88`)
        out = nn.relu(x)
        res = out
        out = nn.Conv(self.channel, (3, 3, 3), padding="SAME", name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(x.shape[-1], (1, 1, 1), padding="VALID", name="conv2")(out)
        return res + out


class Encoder(nn.Module):
    """stride-4 or stride-2 downsampling stack (`vqvae2.py:92-120`)."""
    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad1 = ((1, 1),) * 3  # torch Conv3d(4, stride=2, padding=1)
        if self.stride == 4:
            x = nn.Conv(self.channel // 2, (4, 4, 4), strides=(2, 2, 2),
                        padding=pad1, name="down1")(x)
            x = nn.relu(x)
            x = nn.Conv(self.channel, (4, 4, 4), strides=(2, 2, 2),
                        padding=pad1, name="down2")(x)
            x = nn.relu(x)
            x = nn.Conv(self.channel, (3, 3, 3), padding="SAME", name="conv")(x)
        elif self.stride == 2:
            x = nn.Conv(self.channel // 2, (4, 4, 4), strides=(2, 2, 2),
                        padding=pad1, name="down1")(x)
            x = nn.relu(x)
            x = nn.Conv(self.channel, (3, 3, 3), padding="SAME", name="conv")(x)
        else:
            raise ValueError(f"Unsupported stride {self.stride}")
        for i in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, name=f"res{i}")(x)
        return nn.relu(x)


class Decoder(nn.Module):
    """Mirror of Encoder (`vqvae2.py:123-155`)."""
    out_channel: int
    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.channel, (3, 3, 3), padding="SAME", name="conv")(x)
        for i in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, name=f"res{i}")(x)
        x = nn.relu(x)
        if self.stride == 4:
            x = transposed_conv(self.channel // 2, 4, 2, name="up1")(x)
            x = nn.relu(x)
            x = transposed_conv(self.out_channel, 4, 2, name="up2")(x)
        elif self.stride == 2:
            x = transposed_conv(self.out_channel, 4, 2, name="up1")(x)
        else:
            raise ValueError(f"Unsupported stride {self.stride}")
        return x


class VQVAE(nn.Module):
    """Two-level VQ-VAE (`vqvae2.py:158-232`); returns (reconstruction, diff)."""
    in_channel: int = 3
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    decay: float = 0.99

    def setup(self):
        self.enc_b = Encoder(self.channel, self.n_res_block, self.n_res_channel,
                             stride=4)
        self.enc_t = Encoder(self.channel, self.n_res_block, self.n_res_channel,
                             stride=2)
        self.quantize_conv_t = nn.Conv(self.embed_dim, (1, 1, 1), padding="VALID")
        self.quantize_t = Quantize(self.embed_dim, self.n_embed, self.decay)
        self.dec_t = Decoder(self.embed_dim, self.channel, self.n_res_block,
                             self.n_res_channel, stride=2)
        self.quantize_conv_b = nn.Conv(self.embed_dim, (1, 1, 1), padding="VALID")
        self.quantize_b = Quantize(self.embed_dim, self.n_embed, self.decay)
        self.upsample_t = transposed_conv(self.embed_dim, 4, 2)
        self.dec = Decoder(self.in_channel, self.channel, self.n_res_block,
                           self.n_res_channel, stride=4)

    def encode(self, x: jnp.ndarray, train: bool = False):
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)
        quant_t, diff_t, id_t = self.quantize_t(self.quantize_conv_t(enc_t),
                                                train=train)
        dec_t = self.dec_t(quant_t)
        enc_b = jnp.concatenate([dec_t, enc_b], axis=-1)
        quant_b, diff_b, id_b = self.quantize_b(self.quantize_conv_b(enc_b),
                                                train=train)
        return quant_t, quant_b, diff_t + diff_b, id_t, id_b

    def decode(self, quant_t: jnp.ndarray, quant_b: jnp.ndarray) -> jnp.ndarray:
        upsampled = self.upsample_t(quant_t)
        quant = jnp.concatenate([upsampled, quant_b], axis=-1)
        return self.dec(quant)

    def decode_code(self, code_t: jnp.ndarray, code_b: jnp.ndarray) -> jnp.ndarray:
        embed_t = self.variables["codebook"]["quantize_t"]["embed"]
        embed_b = self.variables["codebook"]["quantize_b"]["embed"]
        return self.decode(Quantize.embed_code(code_t, embed_t),
                           Quantize.embed_code(code_b, embed_b))

    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        quant_t, quant_b, diff, _, _ = self.encode(x, train=train)
        return self.decode(quant_t, quant_b), diff
