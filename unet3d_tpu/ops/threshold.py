"""Foreground thresholding — the ``select_fn`` of foreground cropping.

Parity: `unet3d/utils/threshold.py:6-15` (per-channel percentile, any-channel OR).
"""
from __future__ import annotations

import jax.numpy as jnp


def percentile_threshold(image: jnp.ndarray, percentile: float) -> jnp.ndarray:
    """Foreground mask for a channel-first image ``(C, D, H, W)``.

    A voxel is foreground when ANY channel exceeds that channel's ``percentile``
    quantile. Returns shape ``(1, D, H, W)`` (keepdim, like the reference).
    """
    image = jnp.asarray(image)
    flat = image.reshape(image.shape[:-3] + (-1,))
    cutoffs = jnp.percentile(flat.astype(jnp.float32), percentile * 100.0, axis=-1)
    mask = image > cutoffs[..., None, None, None].astype(image.dtype)
    return jnp.any(mask, axis=-4, keepdims=True)
