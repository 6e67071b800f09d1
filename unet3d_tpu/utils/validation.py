"""Input-validation helpers with instructive error messages.

Parity with the reference's error contracts: geometry-dependent operations must
fail loudly and helpfully when handed bare arrays without affine metadata
(`unet3d/predict/volumetric.py:11-51`, `unet3d/utils/augment.py:17-32`,
exercised by `test/test_predict_volumetric.py:74-141` and
`test/test_augment_validation.py`).
"""
from __future__ import annotations

from typing import Any


def validate_has_affine(image: Any, context: str = "operation") -> None:
    """Raise a TypeError naming the problem when ``image`` lacks an affine."""
    if not hasattr(image, "affine"):
        raise TypeError(
            f"Input image does not have 'affine' attribute. Expected a Volume "
            f"with affine metadata for {context}, but got {type(image).__name__}. "
            "Load images through unet3d_tpu.data.load_image (or wrap arrays in "
            "unet3d_tpu.data.Volume) so the voxel-to-world affine is preserved.")


def validate_batch_item(batch: dict, key: str, context: str = "prediction") -> None:
    """Raise a KeyError with guidance when a loader batch misses a field."""
    if key not in batch:
        raise KeyError(
            f"Batch is missing the '{key}' entry required for {context}. "
            f"Available keys: {sorted(batch.keys())}. Batches must come from the "
            "unet3d_tpu data loader, which carries image/affine/source_filename "
            "(and label during training).")


def validate_spatial_volume(data: Any, context: str = "operation") -> None:
    """Raise a TypeError when data is not a channel-first 3D volume."""
    ndim = getattr(data, "ndim", None)
    if ndim is None or ndim < 3 or ndim > 4:
        raise TypeError(
            f"Expected a (C, D, H, W) or (D, H, W) volume for {context}, got "
            f"{type(data).__name__} with ndim={ndim}. Channel-first layout is "
            "the host-side convention throughout unet3d_tpu.")
