"""Evaluation metrics: per-channel Dice and friends.

The reference evaluates Dice externally (its published BraTS numbers come from
challenge submissions); this module provides the on-device metric so Dice
parity can be measured in-framework (BASELINE.md target: Dice parity with the
torch reference on BraTS whole-case).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def dice_score(pred: jnp.ndarray, target: jnp.ndarray, threshold: Optional[float] = 0.5,
               smooth: float = 1e-5, axis=None) -> jnp.ndarray:
    """Per-channel Dice of channel-last tensors ``(..., C)``.

    ``threshold`` binarizes predictions (None keeps soft Dice); reduction is
    over every axis except channels.
    """
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if threshold is not None:
        pred = (pred > threshold).astype(jnp.float32)
    if axis is None:
        axis = tuple(range(pred.ndim - 1))
    intersection = jnp.sum(pred * target, axis=axis)
    denom = jnp.sum(pred, axis=axis) + jnp.sum(target, axis=axis)
    return (2.0 * intersection + smooth) / (denom + smooth)


def mean_dice(pred: jnp.ndarray, target: jnp.ndarray, **kwargs) -> jnp.ndarray:
    return jnp.mean(dice_score(pred, target, **kwargs))


def hausdorff_like_surface_error(pred: jnp.ndarray, target: jnp.ndarray,
                                 threshold: float = 0.5) -> jnp.ndarray:
    """Cheap surface-disagreement proxy: fraction of boundary voxels present in
    exactly one mask (a jittable stand-in for Hausdorff-style metrics)."""
    from unet3d_tpu.ops.one_hot import estimate_binary_contour
    p = pred > threshold
    t = target > threshold
    cp = estimate_binary_contour(p)
    ct = estimate_binary_contour(t)
    disagree = jnp.logical_xor(cp, ct).sum()
    total = jnp.maximum(cp.sum() + ct.sum(), 1)
    return disagree / total
