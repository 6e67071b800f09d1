"""QuickNAT — Roy et al. 2019 slice-wise brain segmentation net.

Parity: the reference resolves any ``monai.networks.nets`` class by config name
(`/root/reference/unet3d/models/pytorch/__init__.py:1`); ``Quicknat`` is one of
the namespace names. Native Flax/NHWC implementation of MONAI's surface:

- Encoder: 4 dense blocks (two 5x5 convs with dense input concatenation plus a
  1x1 bottleneck conv, each conv followed by instance-norm + PReLU), each
  followed by 2x2 max-pool *with indices*.
- Bottleneck dense block.
- Decoder: 4 stages of max-**unpooling** (scatter through the stored argmax
  mask — the TPU-native formulation of torch's ``MaxUnpool2d``), concatenation
  with the encoder skip, dense block.
- Classifier: ``kernel_c`` (1x1) conv to ``num_classes``.
- Optional squeeze-and-excitation per block: ``se_block`` in
  {"None", "CSE", "SSE", "CSSE"} (channel / spatial / concurrent SE, Roy et
  al. 2018), matching MONAI's enum surface.

QuickNAT is a 2D (slice-wise) network in MONAI. Host layout here is
channel-first volumes; this module accepts NHWC 4-D input directly, and folds
the depth axis of a 5-D NDHWC volume into the batch — exactly how QuickNAT is
applied to volumes in practice (per-slice), and the batched layout the MXU
wants.

Max-unpooling note: with ``pool == stride_pool`` (MONAI's default 2/2) the
unpool of a value tensor ``v`` given the pooled input's argmax one-hot mask
``m`` is ``repeat(v, 2, axes=HW) * m`` — a fused elementwise op on TPU instead
of a scatter.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    """torch.nn.PReLU with a single learnable slope (init 0.25)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("alpha", nn.initializers.constant(0.25), (1,), x.dtype)
        return jnp.where(x >= 0, x, a * x)


def _in_norm(name: str) -> nn.GroupNorm:
    # InstanceNorm == GroupNorm with one group per channel (no running stats).
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, name=name)


class _ChannelSE(nn.Module):
    """Channel squeeze-and-excitation (cSE), reduction ratio 2 (MONAI default)."""
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Dense(max(self.channels // 2, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, name="fc2")(s)
        return x * nn.sigmoid(s)


class _SpatialSE(nn.Module):
    """Spatial squeeze-and-excitation (sSE): 1x1 conv -> sigmoid gate."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = nn.Conv(1, (1, 1), name="squeeze")(x)
        return x * nn.sigmoid(g)


class _SEGate(nn.Module):
    kind: str
    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "CSE":
            return _ChannelSE(self.channels, name="cse")(x)
        if self.kind == "SSE":
            return _SpatialSE(name="sse")(x)
        if self.kind == "CSSE":
            return jnp.maximum(_ChannelSE(self.channels, name="cse")(x),
                               _SpatialSE(name="sse")(x))
        return x


class DenseBlock2D(nn.Module):
    """QuickNAT dense block: 5x5 convs with dense concat + 1x1 bottleneck.

    o1 = ADN(conv5(x)); o2 = ADN(conv5([x, o1])); out = ADN(conv1([x, o1, o2]))
    — the paper's (and MONAI ConvDenseBlock's) two dense 5x5 stages feeding a
    pointwise bottleneck back to ``num_filters`` channels.
    """
    num_filters: int = 64
    kernel_size: int = 5
    se_block: str = "None"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = (self.kernel_size, self.kernel_size)
        o1 = nn.Conv(self.num_filters, k, padding="SAME", name="conv0")(x)
        o1 = PReLU(name="act0")(_in_norm("norm0")(o1))
        o2 = nn.Conv(self.num_filters, k, padding="SAME",
                     name="conv1")(jnp.concatenate([x, o1], axis=-1))
        o2 = PReLU(name="act1")(_in_norm("norm1")(o2))
        out = nn.Conv(self.num_filters, (1, 1),
                      name="conv2")(jnp.concatenate([x, o1, o2], axis=-1))
        out = PReLU(name="act2")(_in_norm("norm2")(out))
        return _SEGate(self.se_block, self.num_filters, name="se")(out)


def _pool_with_mask(x: jnp.ndarray, pool: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2D max-pool (kernel == stride == ``pool``) returning the argmax mask.

    The mask plays the role of torch ``return_indices=True``: it is 1 exactly
    at each window's (first) maximum, so unpooling is a masked block-repeat.
    """
    n, h, w, c = x.shape
    blocks = x.reshape(n, h // pool, pool, w // pool, pool, c)
    pooled = blocks.max(axis=(2, 4))
    # First-max tiebreak (torch returns the first flat index): mask the max,
    # then keep only the first True in each window via cumulative sums.
    is_max = (blocks == pooled[:, :, None, :, None, :])
    # reorder window dims to a flat (pool*pool) axis in row-major order
    flat = is_max.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // pool, w // pool, pool * pool, c)
    first = jnp.cumsum(flat, axis=3) == 1
    mask = (flat & first).reshape(n, h // pool, w // pool, pool, pool, c)
    mask = mask.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
    return pooled, mask.astype(x.dtype)


def _unpool(x: jnp.ndarray, mask: jnp.ndarray, pool: int) -> jnp.ndarray:
    up = jnp.repeat(jnp.repeat(x, pool, axis=1), pool, axis=2)
    return up * mask


class Quicknat(nn.Module):
    """MONAI ``Quicknat`` config surface (act/norm pinned to PReLU/instance).

    Accepts NHWC (slices) or NDHWC (volume; depth folded into batch, restored
    on output).
    """
    num_classes: int = 33
    num_channels: int = 1
    num_filters: int = 64
    kernel_size: int = 5
    kernel_c: int = 1
    stride_conv: int = 1
    pool: int = 2
    stride_pool: int = 2
    se_block: str = "None"
    drop_out: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.pool != self.stride_pool:
            raise NotImplementedError(
                "Quicknat: only pool == stride_pool (non-overlapping pooling) "
                "is supported on TPU")
        volume_depth = None
        if x.ndim == 5:  # NDHWC volume -> slice-wise batch
            volume_depth = x.shape[1]
            x = x.reshape((-1,) + x.shape[2:])
        if x.shape[1] % self.pool ** 4 or x.shape[2] % self.pool ** 4:
            raise ValueError(
                f"Quicknat: spatial dims {x.shape[1:3]} must be divisible by "
                f"pool**4 = {self.pool ** 4}")

        def block(name: str) -> DenseBlock2D:
            return DenseBlock2D(self.num_filters, self.kernel_size,
                                self.se_block, name=name)

        skips, masks = [], []
        h = x
        for i in range(4):
            h = block(f"enc{i}")(h, train)
            if self.drop_out > 0:
                h = nn.Dropout(self.drop_out, deterministic=not train)(h)
            skips.append(h)
            h, m = _pool_with_mask(h, self.pool)
            masks.append(m)
        h = block("bottleneck")(h, train)
        for i in reversed(range(4)):
            h = _unpool(h, masks[i], self.pool)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = block(f"dec{i}")(h, train)
            if self.drop_out > 0:
                h = nn.Dropout(self.drop_out, deterministic=not train)(h)
        out = nn.Conv(self.num_classes, (self.kernel_c, self.kernel_c),
                      strides=(self.stride_conv,) * 2, name="classifier")(h)
        if volume_depth is not None:
            out = out.reshape((-1, volume_depth) + out.shape[1:])
        return out
