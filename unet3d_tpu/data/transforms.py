"""Random augmentation registry with MONAI-compatible names and kwargs.

The reference wires config-listed augmentations straight to ``monai.transforms``
by name (`unet3d/datasets/segmentation.py:72-92`; e.g.
`examples/sppin/sppin_config.json` uses RandFlipD / RandRotateD /
RandScaleIntensityD / RandShiftIntensityD / RandGaussianNoiseD). Here each name
maps to a host-parameterized, device-executed transform: random draw happens on
the host per sample (numpy RNG), the voxel math runs as jitted JAX ops so the
whole augment+normalize stage stays on device.

Transforms operate on channel-first ``(C, D, H, W)`` float arrays. Spatial
transforms apply the same distortion to image and label (MONAI dict-transform
behavior with keys=("image", "label")); intensity transforms touch the image only.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from unet3d_tpu.ops.resample import resample_transform

Array = jnp.ndarray


class Transform:
    """Base: ``__call__(rng, image, label) -> (image, label)``."""
    spatial = False

    def __call__(self, rng: np.random.RandomState, image, label):
        raise NotImplementedError


def _triple_range(value) -> Tuple[float, float, float]:
    if isinstance(value, (int, float)):
        return (float(value),) * 3
    out = tuple(float(v) for v in value)
    return out + (0.0,) * (3 - len(out))


def _range_pair(value) -> Tuple[float, float]:
    """MONAI range semantics for one parameter: scalar r -> U(-r, r);
    pair (a, b) -> U(a, b)."""
    if value is None:
        return (0.0, 0.0)
    if isinstance(value, (int, float)):
        return (-float(value), float(value))
    vals = [float(v) for v in value]
    if len(vals) == 1:
        return (-vals[0], vals[0])
    return (vals[0], vals[1])


def _param_ranges(value, n: int):
    """MONAI RandAffine range semantics: a SCALAR applies to the first
    parameter only (remaining parameters stay 0); a sequence maps per
    parameter, each element scalar r -> U(-r, r) or pair (a, b) -> U(a, b)."""
    if value is None:
        value = ()
    if isinstance(value, (int, float)):
        value = (float(value),)
    pairs = [_range_pair(v) for v in tuple(value)[:n]]
    return pairs + [(0.0, 0.0)] * (n - len(pairs))


def _center_transform(matrix: np.ndarray, shape: Sequence[int]) -> np.ndarray:
    """Lift a 3x3 voxel-space linear map to a 4x4 transform about the volume center."""
    center = (np.asarray(shape, dtype=np.float64) - 1.0) / 2.0
    t = np.eye(4)
    t[:3, :3] = matrix
    t[:3, 3] = center - matrix @ center
    return t


def _apply_spatial(image, label, transform: np.ndarray, mode: str, label_mode: str,
                   clip_to_edge: bool = False):
    """dst-voxel -> src-voxel resample of image (+label) with a shared transform.

    ``clip_to_edge`` clamps source coordinates to the volume (border/edge
    padding instead of zero fill)."""
    tr = jnp.asarray(transform)
    shape = tuple(image.shape[-3:])
    clip = (jnp.asarray([s - 1 for s in shape], jnp.float32)
            if clip_to_edge else None)
    image = resample_transform(jnp.asarray(image), tr, shape, mode=mode,
                               clip_max=clip)
    if label is not None:
        label = resample_transform(jnp.asarray(label, dtype=jnp.float32), tr, shape,
                                   mode=label_mode, clip_max=clip)
    return image, label


class RandFlipD(Transform):
    """MONAI RandFlipd: flip listed spatial axes with probability ``prob``."""
    spatial = True

    def __init__(self, prob: float = 0.1, spatial_axis=None):
        self.prob = prob
        if spatial_axis is None:
            spatial_axis = (0, 1, 2)
        self.axes = (spatial_axis,) if isinstance(spatial_axis, int) else tuple(spatial_axis)

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        axes = tuple(a + 1 for a in self.axes)  # channel-first offset
        image = jnp.flip(image, axis=axes)
        if label is not None:
            label = jnp.flip(label, axis=axes)
        return image, label


class RandRotate90D(Transform):
    """MONAI RandRotate90d: k in 1..max_k quarter turns in a spatial plane."""
    spatial = True

    def __init__(self, prob: float = 0.1, max_k: int = 3, spatial_axes=(0, 1)):
        self.prob = prob
        self.max_k = max_k
        self.spatial_axes = tuple(spatial_axes)

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        k = rng.randint(1, self.max_k + 1)
        axes = tuple(a + 1 for a in self.spatial_axes)
        image = jnp.rot90(image, k=k, axes=axes)
        if label is not None:
            label = jnp.rot90(label, k=k, axes=axes)
        return image, label


def _rotation_matrix(angles: Sequence[float]) -> np.ndarray:
    ax, ay, az = angles
    rx = np.array([[1, 0, 0],
                   [0, math.cos(ax), -math.sin(ax)],
                   [0, math.sin(ax), math.cos(ax)]])
    ry = np.array([[math.cos(ay), 0, math.sin(ay)],
                   [0, 1, 0],
                   [-math.sin(ay), 0, math.cos(ay)]])
    rz = np.array([[math.cos(az), -math.sin(az), 0],
                   [math.sin(az), math.cos(az), 0],
                   [0, 0, 1]])
    return rx @ ry @ rz


class RandRotateD(Transform):
    """MONAI RandRotated: per-axis uniform angles, rotate about the center,
    keep_size, zero padding."""
    spatial = True

    def __init__(self, prob: float = 0.1, range_x=0.0, range_y=0.0, range_z=0.0,
                 mode: str = "bilinear", label_mode: Optional[str] = None,
                 keep_size: bool = True):
        self.prob = prob
        # MONAI: scalar r -> U(-r, r); pair (a, b) -> U(a, b) per axis
        self.ranges = (_range_pair(range_x), _range_pair(range_y),
                       _range_pair(range_z))
        self.mode = "trilinear" if mode == "bilinear" else mode
        self.label_mode = label_mode or self.mode
        del keep_size  # always keep size (MONAI default)

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        angles = [rng.uniform(lo, hi) if hi > lo else lo
                  for lo, hi in self.ranges]
        rot = _rotation_matrix(angles)
        # dst->src mapping is the inverse rotation
        transform = _center_transform(rot.T, image.shape[-3:])
        return _apply_spatial(image, label, transform, self.mode, self.label_mode)


class RandZoomD(Transform):
    """MONAI RandZoomd with keep_size: scale about the center."""
    spatial = True

    def __init__(self, prob: float = 0.1, min_zoom: float = 0.9, max_zoom: float = 1.1,
                 mode: str = "bilinear", label_mode: Optional[str] = None,
                 keep_size: bool = True):
        self.prob = prob
        self.min_zoom = min_zoom
        self.max_zoom = max_zoom
        self.mode = "trilinear" if mode in ("bilinear", "area") else mode
        self.label_mode = label_mode or self.mode

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        zoom = rng.uniform(self.min_zoom, self.max_zoom)
        transform = _center_transform(np.eye(3) / zoom, image.shape[-3:])
        # MONAI keep_size pads zoomed-out volumes with EDGE values, not zeros:
        # clamping source coords to the volume reproduces that border behavior
        return _apply_spatial(image, label, transform, self.mode,
                              self.label_mode, clip_to_edge=True)


class RandAffineD(Transform):
    """MONAI RandAffined: rotation + scale + translation in one resample."""
    spatial = True

    def __init__(self, prob: float = 0.1, rotate_range=0.0, scale_range=0.0,
                 translate_range=0.0, shear_range=0.0, mode: str = "bilinear",
                 label_mode: Optional[str] = None, padding_mode: str = "zeros"):
        self.prob = prob
        # MONAI semantics: scalar range -> FIRST parameter only; sequences map
        # per parameter with scalar -> U(-r, r), pair -> U(a, b)
        self.rotate_range = _param_ranges(rotate_range, 3)
        self.scale_range = _param_ranges(scale_range, 3)
        self.translate_range = _param_ranges(translate_range, 3)
        self.shear_range = _param_ranges(shear_range, 6)
        self.mode = "trilinear" if mode == "bilinear" else mode
        self.label_mode = label_mode or self.mode

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        sample = lambda pairs: [rng.uniform(lo, hi) if hi > lo else lo
                                for lo, hi in pairs]
        angles = sample(self.rotate_range)
        scales = [1.0 + v for v in sample(self.scale_range)]
        trans = sample(self.translate_range)
        sh = sample(self.shear_range)
        # MONAI create_shear (3D): [[1, s0, s1], [s2, 1, s3], [s4, s5, 1]];
        # grid composition order rotate @ shear @ scale (translation separate)
        shear = np.array([[1.0, sh[0], sh[1]],
                          [sh[2], 1.0, sh[3]],
                          [sh[4], sh[5], 1.0]])
        fwd = _rotation_matrix(angles) @ shear @ np.diag(scales)
        transform = _center_transform(np.linalg.inv(fwd), image.shape[-3:])
        transform[:3, 3] -= np.asarray(trans)
        return _apply_spatial(image, label, transform, self.mode, self.label_mode)


class RandScaleIntensityD(Transform):
    """MONAI RandScaleIntensityd: x * (1 + U(-factors, factors))."""

    def __init__(self, prob: float = 0.1, factors=0.1):
        self.prob = prob
        self.factors = (-factors, factors) if isinstance(factors, (int, float)) \
            else tuple(factors)

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        factor = rng.uniform(*self.factors)
        return jnp.asarray(image) * (1.0 + factor), label


class RandShiftIntensityD(Transform):
    """MONAI RandShiftIntensityd: x + U(-offsets, offsets)."""

    def __init__(self, prob: float = 0.1, offsets=0.1):
        self.prob = prob
        self.offsets = (-offsets, offsets) if isinstance(offsets, (int, float)) \
            else tuple(offsets)

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        offset = rng.uniform(*self.offsets)
        return jnp.asarray(image) + offset, label


class RandGaussianNoiseD(Transform):
    """MONAI RandGaussianNoised: additive N(mean, std')."""

    def __init__(self, prob: float = 0.1, mean: float = 0.0, std: float = 0.1,
                 sample_std: bool = True):
        self.prob = prob
        self.mean = mean
        self.std = std
        self.sample_std = sample_std

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        std = rng.uniform(0, self.std) if self.sample_std else self.std
        noise = rng.normal(self.mean, std, size=image.shape).astype(np.float32)
        return jnp.asarray(image) + jnp.asarray(noise), label


def gaussian_kernel1d(sigma: float, truncated: float = 4.0) -> np.ndarray:
    radius = max(int(truncated * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def separable_gaussian_blur(image: Array, sigmas: Sequence[float],
                            pad_mode: str = "edge") -> Array:
    """Separable gaussian blur of a channel-first volume.

    ``pad_mode``: "edge" (replicate, the MONAI GaussianSmooth analog) or
    "zero" (scipy ``gaussian_filter(mode="constant")`` parity, used by the
    elastic-deformation field).
    """
    out = jnp.asarray(image, dtype=jnp.float32)
    for axis, sigma in enumerate(sigmas):
        if sigma <= 0:
            continue
        k = jnp.asarray(gaussian_kernel1d(sigma))
        r = (len(k) - 1) // 2
        ax = axis + 1
        pads = [(0, 0)] * out.ndim
        pads[ax] = (r, r)
        padded = jnp.pad(out, pads,
                         mode="edge" if pad_mode == "edge" else "constant")
        acc = jnp.zeros_like(out)
        for i in range(len(k)):
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(i, i + out.shape[ax])
            acc = acc + k[i] * padded[tuple(sl)]
        out = acc
    return out


class RandGaussianSmoothD(Transform):
    """MONAI RandGaussianSmoothd: per-axis sigma sampled uniformly."""

    def __init__(self, prob: float = 0.1, sigma_x=(0.25, 1.5), sigma_y=(0.25, 1.5),
                 sigma_z=(0.25, 1.5)):
        self.prob = prob
        self.sigmas = (tuple(sigma_x), tuple(sigma_y), tuple(sigma_z))

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        sigmas = [rng.uniform(lo, hi) for lo, hi in self.sigmas]
        return separable_gaussian_blur(image, sigmas), label


class RandAdjustContrastD(Transform):
    """MONAI RandAdjustContrastd: gamma correction with gamma ~ U(range)."""

    def __init__(self, prob: float = 0.1, gamma=(0.5, 4.5)):
        self.prob = prob
        self.gamma = (0.5, gamma) if isinstance(gamma, (int, float)) else tuple(gamma)

    def __call__(self, rng, image, label):
        if rng.rand() >= self.prob:
            return image, label
        gamma = rng.uniform(*self.gamma)
        img = jnp.asarray(image, dtype=jnp.float32)
        vmin = jnp.min(img)
        vrange = jnp.max(img) - vmin
        eps = 1e-7
        return ((img - vmin) / (vrange + eps)) ** gamma * (vrange + eps) + vmin, label


class RandSpatialCropD(Transform):
    """MONAI RandSpatialCropd(random_size=False): random fixed-size crop.

    The shape stage of patch training (`unet3d/datasets/segmentation.py:60-63`).
    """
    spatial = True

    def __init__(self, roi_size: Sequence[int], random_size: bool = False):
        if random_size:
            raise NotImplementedError("random_size=True is not supported")
        self.roi_size = tuple(int(s) for s in roi_size)

    def __call__(self, rng, image, label):
        spatial = image.shape[-3:]
        starts = [rng.randint(0, max(s - r, 0) + 1)
                  for s, r in zip(spatial, self.roi_size)]
        slices = tuple(slice(st, st + min(r, s))
                       for st, r, s in zip(starts, self.roi_size, spatial))
        image = image[(slice(None),) + slices]
        if label is not None:
            label = label[(slice(None),) + slices]
        return image, label


TRANSFORM_REGISTRY: Dict[str, type] = {
    "RandFlipD": RandFlipD,
    "RandRotate90D": RandRotate90D,
    "RandRotateD": RandRotateD,
    "RandZoomD": RandZoomD,
    "RandAffineD": RandAffineD,
    "RandScaleIntensityD": RandScaleIntensityD,
    "RandShiftIntensityD": RandShiftIntensityD,
    "RandGaussianNoiseD": RandGaussianNoiseD,
    "RandGaussianSmoothD": RandGaussianSmoothD,
    "RandAdjustContrastD": RandAdjustContrastD,
    "RandSpatialCropD": RandSpatialCropD,
}
# MONAI accepts both the "...D" and "...d" dictionary-transform spellings.
TRANSFORM_REGISTRY.update({k[:-1] + "d": v for k, v in list(TRANSFORM_REGISTRY.items())})


def build_transform(spec: dict) -> Transform:
    """Config entry {"name": ..., **kwargs} -> transform instance.

    Parity: `unet3d/datasets/segmentation.py:72-75,89-92` (getattr by name with
    the remaining keys as kwargs).
    """
    name = spec["name"]
    if name not in TRANSFORM_REGISTRY:
        raise ValueError(f"Augmentation {name} is not supported")
    kwargs = {k: v for k, v in spec.items() if k != "name"}
    return TRANSFORM_REGISTRY[name](**kwargs)
