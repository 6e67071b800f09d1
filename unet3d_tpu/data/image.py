"""Affine-carrying volume container — the framework's L0 data type.

TPU-native replacement for the reference's ``Image(MetaTensor)``
(`unet3d/utils/image.py:5-33`): a lightweight host-side container of
``(C, D, H, W)`` array + 4x4 voxel->world affine + metadata. The array may be
numpy or a jax.Array; device math happens in ops/* on the raw array, keeping this
class free of framework state.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np

from unet3d_tpu.ops import affine as affine_ops


@dataclass
class Volume:
    data: Any  # (C, D, H, W) channel-first (or (D, H, W))
    affine: np.ndarray
    meta: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        self.affine = np.asarray(self.affine, dtype=np.float64)

    @property
    def shape(self):
        return tuple(self.data.shape)

    @property
    def spatial_shape(self):
        return tuple(self.data.shape[-3:])

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def spacing(self) -> np.ndarray:
        return affine_ops.get_spacing_from_affine(self.affine)

    def make_similar(self, data, affine: Optional[np.ndarray] = None,
                     copy_meta: bool = True) -> "Volume":
        """New Volume with this one's affine/meta unless overridden.

        Parity: `unet3d/utils/image.py:7-24`.
        """
        if affine is None:
            affine = self.affine
        meta = dict(self.meta) if copy_meta else {}
        return Volume(data=data, affine=np.asarray(affine, dtype=np.float64), meta=meta)

    def astype(self, dtype) -> "Volume":
        return self.make_similar(np.asarray(self.data).astype(dtype))

    def to_filename(self, filename: str) -> None:
        """Write as NIfTI: channels moved last and squeezed (`unet3d/utils/image.py:26-33`)."""
        from unet3d_tpu.data import nifti
        arr = np.asarray(self.data)
        if arr.ndim > 3:
            arr = np.moveaxis(arr, 0, -1)
        nifti.save(filename, np.squeeze(arr), self.affine)
