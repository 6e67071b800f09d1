"""Foreground cropping and pad-or-crop.

TPU-native equivalents of the reference's cropping stack: the vendored nilearn
bbox crop (`unet3d/utils/nilearn_custom_utils/nilearn_utils.py:9-101`) and the
MONAI ``CropForegroundD``/``ResizeWithPadOrCropD`` stages of the dataset pipeline
(`unet3d/datasets/segmentation.py:55-70`).

Bbox discovery produces data-dependent shapes, so it runs eagerly (tiny reductions;
cheap on host or device); the fixed-shape ``pad_or_crop`` is jit-friendly.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from unet3d_tpu.ops import affine as affine_ops
from unet3d_tpu.ops.threshold import percentile_threshold


def foreground_slices(data, rtol: float = 1e-8, percentile: Optional[float] = None,
                      pad: int = 1) -> Optional[Tuple[slice, slice, slice]]:
    """Spatial bbox slices of the foreground of a channel-first ``(C, D, H, W)`` array.

    ``percentile`` given -> per-channel percentile threshold
    (`nilearn_utils.py:42-49`); otherwise |x| > rtol * max|x| (`:51-54`). The bbox is
    expanded by ``pad`` voxels and clipped to the volume. Returns None when no
    foreground exists (reference then leaves the image uncropped).
    """
    arr = np.asarray(data)
    if percentile is not None:
        cutoffs = np.percentile(arr, percentile, axis=tuple(range(1, arr.ndim)))
        passes = arr > cutoffs.reshape((-1,) + (1,) * (arr.ndim - 1))
    else:
        infinity_norm = max(-float(arr.min()), float(arr.max()))
        passes = (arr < -rtol * infinity_norm) | (arr > rtol * infinity_norm)
    if passes.ndim == 4:
        passes = np.any(passes, axis=0)
    if not passes.any():
        return None
    coords = np.stack(np.where(passes))
    start = coords.min(axis=1)
    end = coords.max(axis=1) + 1
    if pad > 0:
        start = np.maximum(start - pad, 0)
        end = np.minimum(end + pad, passes.shape)
    return tuple(slice(int(s), int(e)) for s, e in zip(start, end))


def crop_img(data, affine: np.ndarray, rtol: float = 1e-8,
             percentile: Optional[float] = None, pad: int = 1,
             return_slices: bool = False):
    """Crop zero/below-threshold borders, keeping ``pad`` voxels of margin.

    Returns ``(cropped, new_affine)`` (or the slices). Parity: `nilearn_utils.py:9-101`
    including the origin translation of `image_slices_to_affine`.
    """
    slices = foreground_slices(data, rtol=rtol, percentile=percentile, pad=pad)
    if slices is None:
        return (data, np.asarray(affine)) if not return_slices else None
    if return_slices:
        return slices
    arr = np.asarray(data)
    cropped = arr[(slice(None),) + slices] if arr.ndim == 4 else arr[slices]
    new_affine = affine_ops.crop_affine(affine, [s.start for s in slices])
    return cropped, new_affine


def _percentile_threshold_np(image: np.ndarray, percentile: float) -> np.ndarray:
    """numpy twin of ops/threshold.percentile_threshold — raw volumes have
    per-case shapes, and a jnp version would force one XLA compile per case."""
    flat = image.reshape(image.shape[:-3] + (-1,))
    cutoffs = np.percentile(flat.astype(np.float32), percentile * 100.0, axis=-1)
    mask = image > cutoffs[..., None, None, None].astype(image.dtype)
    return np.any(mask, axis=-4, keepdims=True)


def crop_foreground(image, affine: np.ndarray, label=None,
                    foreground_percentile: float = 0.1, margin: int = 1):
    """MONAI ``CropForegroundD``-equivalent: bbox of ``percentile_threshold`` mask
    with ``margin``, applied to image (and label). Returns (image, affine, label, slices).

    Parity: `unet3d/datasets/segmentation.py:55-58` + `unet3d/utils/threshold.py:6-15`.
    """
    mask = _percentile_threshold_np(np.asarray(image), foreground_percentile)
    slices = foreground_slices(mask.astype(np.uint8), rtol=0.5, pad=margin)
    if slices is None:
        return image, np.asarray(affine), label, tuple(slice(0, s) for s in image.shape[-3:])
    image = np.asarray(image)[(slice(None),) + slices]
    if label is not None:
        label = np.asarray(label)[(slice(None),) + slices]
    new_affine = affine_ops.crop_affine(affine, [s.start for s in slices])
    return image, new_affine, label, slices


def get_background_values(data, axis=(-3, -2, -1)) -> np.ndarray:
    """Per-channel background estimate = the mode-ish corner value (the minimum
    along the spatial axes), used to zero-shift before geometric ops.

    Parity: `unet3d/utils/nilearn_custom_utils/nilearn_utils.py:104-131`
    (run_with_background_correction's background estimation).
    """
    arr = np.asarray(data)
    return arr.min(axis=tuple(a if a >= 0 else arr.ndim + a for a in axis),
                   keepdims=True)


def run_with_background_correction(func, data, background=None, axis=(-3, -2, -1),
                                   **kwargs):
    """Subtract background -> run func -> add background back
    (parity: `nilearn_utils.py:104-131`)."""
    arr = np.asarray(data)
    if background is None:
        background = get_background_values(arr, axis=axis)
    out = func(arr - background, **kwargs)
    return np.asarray(out) + background


def pad_or_crop(data, target_shape: Sequence[int], affine: Optional[np.ndarray] = None,
                mode: str = "constant", value: float = 0.0):
    """Center pad-or-crop a channel-first array to ``target_shape``.

    MONAI ``ResizeWithPadOrCropD`` semantics (`unet3d/datasets/segmentation.py:69-70`):
    symmetric split with the extra voxel at the end; affine origin shifted by the
    crop/pad offset so world coordinates stay registered.
    """
    arr = np.asarray(data)
    spatial = arr.shape[-3:]
    target = tuple(int(t) for t in target_shape)
    # Crop first where too big. MONAI CenterSpatialCrop starts at
    # s//2 - t//2 (center minus half-roi), NOT (s-t)//2 — they differ by one
    # voxel when s is even and t is odd.
    crop_start = [max(s // 2 - t // 2, 0) for s, t in zip(spatial, target)]
    slices = tuple(slice(cs, cs + min(s, t))
                   for cs, s, t in zip(crop_start, spatial, target))
    arr = arr[(slice(None),) * (arr.ndim - 3) + slices]
    # Pad where too small
    pad_before = [max((t - s) // 2, 0) for s, t in zip(spatial, target)]
    pad_after = [t - s2 - pb for t, s2, pb in
                 zip(target, arr.shape[-3:], pad_before)]
    pad_width = [(0, 0)] * (arr.ndim - 3) + [(pb, pa) for pb, pa in zip(pad_before, pad_after)]
    if any(pb or pa for pb, pa in pad_width):
        arr = np.pad(arr, pad_width, mode=mode if mode != "constant" else "constant",
                     constant_values=value if mode == "constant" else 0)
    if affine is None:
        return arr
    offset = [cs - pb for cs, pb in zip(crop_start, pad_before)]
    return arr, affine_ops.crop_affine(affine, offset)
