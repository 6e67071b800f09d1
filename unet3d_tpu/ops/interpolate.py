"""Separable NDHWC resize (trilinear/nearest) for on-device feature maps.

Used by decoder upsampling (`unet3d/models/pytorch/classification/decoder.py:
56,105` F.interpolate) and DynUNet deep-supervision head upsampling. Trilinear
interpolation is separable, so each spatial axis is interpolated with two takes
and a lerp — far cheaper than 8-corner gathers and fuses cleanly in XLA.

Coordinate rules match torch.nn.functional.interpolate (see ops/resample.py).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _axis_coords(s_in: int, s_out: int, mode: str, align_corners: bool) -> np.ndarray:
    v = np.arange(s_out, dtype=np.float64)
    if mode == "nearest":
        return np.clip(np.floor(v * (s_in / s_out)), 0, s_in - 1)
    if mode == "nearest-exact":
        return np.clip(np.floor((v + 0.5) * (s_in / s_out)), 0, s_in - 1)
    if align_corners:
        return v * ((s_in - 1) / max(s_out - 1, 1))
    return np.clip((v + 0.5) * (s_in / s_out) - 0.5, 0, s_in - 1)


def resize_ndhwc(x: jnp.ndarray, out_spatial: Sequence[int], mode: str = "trilinear",
                 align_corners: bool = False) -> jnp.ndarray:
    """Resize ``(N, D, H, W, C)`` to spatial ``out_spatial`` (static shapes)."""
    out_spatial = tuple(int(s) for s in out_spatial)
    nearest = mode in ("nearest", "nearest-exact")
    for i, (s_in, s_out) in enumerate(zip(x.shape[1:4], out_spatial)):
        axis = i + 1
        if s_in == s_out:
            continue
        coords = _axis_coords(s_in, s_out, mode, align_corners)
        if nearest:
            x = jnp.take(x, jnp.asarray(coords.astype(np.int32)), axis=axis)
        else:
            lo = np.floor(coords).astype(np.int32)
            hi = np.minimum(lo + 1, s_in - 1)
            frac = (coords - lo).astype(np.float32)
            shape = [1] * x.ndim
            shape[axis] = s_out
            w = jnp.asarray(frac).reshape(shape)
            x = (jnp.take(x, jnp.asarray(lo), axis=axis) * (1.0 - w)
                 + jnp.take(x, jnp.asarray(hi), axis=axis) * w)
    return x


def upsample_ndhwc(x: jnp.ndarray, scale: int = 2, mode: str = "trilinear",
                   align_corners: bool = False) -> jnp.ndarray:
    """scale_factor-style upsample (torch semantics: out = floor(in * scale))."""
    out_spatial = tuple(int(s * scale) for s in x.shape[1:4])
    return resize_ndhwc(x, out_spatial, mode=mode, align_corners=align_corners)
