"""Legacy-path augmentation library: affine-space augs, the 48-element
rotation/flip permutation group, elastic deformation, noise and blur.

Parity: `unet3d/utils/augment.py` (the pre-MONAI augmentation menu that still
backs the reference's tests and legacy paths). Host math (keys, affines, random
draws) is numpy; voxel math (resample/gather/blur) is jnp and jit-backed via
ops/resample.

Layout: channel-first ``(C, D, H, W)`` arrays + 4x4 affines, explicit
numpy RandomState instead of global RNG.
"""
from __future__ import annotations

import functools as _functools
import random as _random
from typing import Iterable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from unet3d_tpu.ops import affine as affine_ops
from unet3d_tpu.ops.resample import resample, sample_at_coords
from unet3d_tpu.data.transforms import separable_gaussian_blur

Key = Tuple[Tuple[int, int, int], int, int, int, int]


# --------------------------------------------------------------------- flips
def flip_image(data, axis):
    """Flip spatial axes of a channel-first array (`augment.py:35-38`);
    ``axis`` indexes the array dims directly like torch.flip."""
    return np.flip(np.asarray(data), axis=tuple(axis) if isinstance(axis, (list, tuple))
                   else axis).copy()


def random_boolean(rng: Optional[np.random.RandomState] = None) -> bool:
    rng = rng or np.random
    return bool(rng.choice([True, False]))


def random_flip_dimensions(n_dimensions: int,
                           rng: Optional[np.random.RandomState] = None):
    """Parity: `augment.py:41-46`."""
    return [dim for dim in range(n_dimensions) if random_boolean(rng)]


def random_scale_factor(n_dim: int = 3, mean: float = 1.0, std: float = 0.25,
                        rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    rng = rng or np.random
    return rng.normal(mean, std, size=n_dim)


# --------------------------------------------- affine-space scale / translate
def find_center(affine: np.ndarray, shape: Sequence[int], ndim: int = 3) -> np.ndarray:
    """World coordinate of the volume center (`augment.py:345-347`)."""
    center_voxel = np.asarray(shape[:ndim], dtype=np.float64) / 2.0
    return (np.asarray(affine) @ np.concatenate([center_voxel, [1.0]]))[:ndim]


def scale_affine(affine: np.ndarray, shape: Sequence[int], scale, ndim: int = 3) -> np.ndarray:
    """Zoom about the image center, keeping the grid shape (`augment.py:354-387`):
    scale > 1 zooms in (smaller spacing window), scale < 1 zooms out."""
    if not isinstance(scale, Iterable):
        scale = np.ones(ndim) * scale
    scale = np.asarray(scale, dtype=np.float64)
    affine = np.asarray(affine, dtype=np.float64).copy()
    center = find_center(affine, shape, ndim=ndim)
    origin = affine[:ndim, ndim]
    t = np.eye(ndim + 1)
    t[:ndim, ndim] = (center - origin) * (1 - 1 / scale)
    affine = t @ affine
    s = np.diag(np.concatenate([1 / scale, [1.0]]))
    return affine @ s


def scale_image(data, affine: np.ndarray, scale, interpolation: str = "linear"):
    """Resample onto the zoomed grid (`augment.py:349-352`)."""
    data = np.asarray(data)
    new_affine = scale_affine(affine, data.shape[-3:], scale)
    return np.asarray(resample(data, affine, new_affine, data.shape[-3:],
                               mode=interpolation))


def translate_affine(affine: np.ndarray, shape, translation_scales) -> np.ndarray:
    """Translate by a fraction of the image extent per axis (`augment.py:280-296`)."""
    affine = np.asarray(affine, dtype=np.float64).copy()
    spacing = affine_ops.get_spacing_from_affine(affine)
    extent = np.asarray(shape[-3:], dtype=np.float64) * spacing
    affine[:3, 3] = affine[:3, 3] + np.asarray(translation_scales) * extent
    return affine


def translate_image(data, affine: np.ndarray, translation_scales,
                    interpolation: str = "linear"):
    """Parity: `augment.py:299-314`."""
    data = np.asarray(data)
    target_affine = translate_affine(affine, data.shape, translation_scales)
    return np.asarray(resample(data, affine, target_affine, data.shape[-3:],
                               mode=interpolation))


def affine_swap_axis(affine: np.ndarray, shape, axis: int = 1) -> np.ndarray:
    """Flip one DATA axis (channel-first: 1..3 spatial) in affine space
    (`augment.py:429-434`, from MONAI Flip).

    The reference's default ``axis=0`` maps to ``sp=-1`` and corrupts the
    homogeneous row (both tuple assignments land on ``mat[-1,-1]``); here the
    channel axis is rejected instead.
    """
    if axis < 1:
        raise ValueError(
            "affine_swap_axis flips data axes 1..3 (channel-first spatial); "
            f"axis={axis} would index the affine's homogeneous row")
    affine = np.asarray(affine, dtype=np.float64)
    mat = np.eye(len(affine))
    sp = axis - 1
    mat[sp, sp], mat[sp, -1] = -1.0, shape[axis] - 1
    return affine @ mat


# ----------------------------------------------------------------- composite
def distort_image(data, affine, flip_axis=None, scale_factor=None,
                  translation_scale=None, interpolation: str = "linear"):
    """translate -> flip -> scale, like `augment.py:58-64`. Returns data only
    (all distortions resample back onto the original grid)."""
    data = np.asarray(data)
    if translation_scale is not None:
        data = translate_image(data, affine, translation_scale, interpolation)
    if flip_axis:
        # flip_axis lists spatial dims (0..2); +1 skips the channel dim
        data = flip_image(data, [a + 1 for a in flip_axis])
    if scale_factor is not None:
        data = scale_image(data, affine, scale_factor, interpolation)
    return data


def augment_data(data, truth, affine, scale_deviation=None, flip=False,
                 noise_factor=None, translation_deviation=None,
                 interpolation: str = "linear",
                 rng: Optional[np.random.RandomState] = None):
    """Same random distortion for image and truth, nearest for truth.

    Parity: `augment.py:67-105`.
    """
    rng = rng or np.random.RandomState()
    data = np.asarray(data, dtype=np.float32)
    truth = np.asarray(truth)
    scale_factor = random_scale_factor(3, std=scale_deviation, rng=rng) \
        if scale_deviation else None
    flip_axis = random_flip_dimensions(3, rng=rng) if flip else None
    translation_scale = random_scale_factor(3, mean=0.0, std=translation_deviation,
                                            rng=rng) if translation_deviation else None
    out = distort_image(data, affine, flip_axis=flip_axis, scale_factor=scale_factor,
                        translation_scale=translation_scale,
                        interpolation=interpolation)
    if noise_factor is not None:
        out = np.asarray(add_noise(out, sigma_factor=noise_factor, rng=rng))
    truth_out = distort_image(truth[None] if truth.ndim == 3 else truth, affine,
                              flip_axis=flip_axis, scale_factor=scale_factor,
                              translation_scale=translation_scale,
                              interpolation="nearest")
    if truth.ndim == 3:
        truth_out = truth_out[0]
    return out, truth_out


def add_noise(data, mean: float = 0.0, sigma_factor: float = 0.1,
              rng: Optional[np.random.RandomState] = None):
    """Additive gaussian noise scaled by the data std (`augment.py:266-277`)."""
    rng = rng or np.random
    data = np.asarray(data, dtype=np.float32)
    sigma = abs(float(np.std(data)) * sigma_factor)
    return data + rng.normal(mean, sigma, size=data.shape).astype(np.float32)


# ----------------------------------------------------- 48-permutation group
def permute_data(data, key: Key):
    """Apply a rotation/flip/transpose permutation to (C, D, H, W) data.

    Parity: `augment.py:155-197` (including 2-tuple backward-compat rotations).
    """
    data = np.asarray(data).copy()
    rotation, flip_x, flip_y, flip_z, transpose = key
    if len(rotation) == 2:
        rotate_x, (rotate_y, rotate_z) = 0, rotation
    else:
        rotate_x, rotate_y, rotate_z = rotation
    if rotate_x:
        data = np.rot90(data, rotate_x, axes=(2, 3))
    if rotate_y:
        data = np.rot90(data, rotate_y, axes=(1, 3))
    if rotate_z:
        data = np.rot90(data, rotate_z, axes=(1, 2))
    if flip_x:
        data = np.flip(data, axis=1)
    if flip_y:
        data = np.flip(data, axis=2)
    if flip_z:
        data = np.flip(data, axis=3)
    if transpose:
        data = np.swapaxes(data, 2, 3)
    return np.ascontiguousarray(data)


def generate_permutation_keys():
    """The 48 unique rotation/reflection permutations of a cube.

    Parity contract (`augment.py:108-144` and `test/test_augment.py:46-54`):
    exactly 48 keys, each realizing a distinct permutation.
    """
    base = np.arange(4 * 4 * 4, dtype=np.int64).reshape(1, 4, 4, 4)
    seen = set()
    keys = []
    for rx in range(4):
        for ry in range(4):
            for rz in range(4):
                for fx in (0, 1):
                    for fy in (0, 1):
                        for fz in (0, 1):
                            key = ((rx, ry, rz), fx, fy, fz, 0)
                            sig = permute_data(base, key).tobytes()
                            if sig not in seen:
                                seen.add(sig)
                                keys.append(key)
                                if len(keys) == 48:
                                    return set(keys)
    return set(keys)


@_functools.lru_cache(maxsize=1)
def _sorted_permutation_keys():
    return tuple(sorted(generate_permutation_keys()))


def random_permutation_key(rng=None) -> Key:
    # cached: regenerating the 48-key group per draw cost ~64 array ops
    keys = _sorted_permutation_keys()
    if rng is not None:
        return keys[rng.randint(len(keys))]
    return _random.choice(keys)


def random_permutation_x_y(x_data, y_data, channel_axis: int = 0, rng=None):
    """Same random permutation for image and label (`augment.py:201-214`)."""
    key = random_permutation_key(rng)
    if channel_axis != 0:
        return [np.moveaxis(permute_data(np.moveaxis(d, channel_axis, 0), key), 0,
                            channel_axis) for d in (x_data, y_data)]
    return permute_data(x_data, key), permute_data(y_data, key)


def reverse_permutation_key(key: Key) -> Key:
    rotation = key[0]
    if len(rotation) == 2:
        ry, rz = rotation
        rotation_inv = (0, -ry, -rz)
    else:
        rx, ry, rz = rotation
        rotation_inv = (-rx, -ry, -rz)
    return rotation_inv, key[1], key[2], key[3], key[4]


def reverse_permute_data(data, key: Key):
    """Invert `permute_data` (`augment.py:219-251`)."""
    (rx, ry, rz), flip_x, flip_y, flip_z, transpose = reverse_permutation_key(key)
    data = np.asarray(data).copy()
    if transpose:
        data = np.swapaxes(data, 2, 3)
    if flip_z:
        data = np.flip(data, axis=3)
    if flip_y:
        data = np.flip(data, axis=2)
    if flip_x:
        data = np.flip(data, axis=1)
    if rz:
        data = np.rot90(data, rz, axes=(1, 2))
    if ry:
        data = np.rot90(data, ry, axes=(1, 3))
    if rx:
        data = np.rot90(data, rx, axes=(2, 3))
    return np.ascontiguousarray(data)


# --------------------------------------------------------- elastic + blur
def elastic_transform(image, alpha: float, sigma: float, target_image,
                      rng: Optional[np.random.RandomState] = None):
    """Simard-2003 elastic deformation, shared displacement for image + target.

    Parity: `augment.py:390-411` — gaussian-smoothed uniform displacement field
    scaled by alpha, trilinear warp with reflected boundaries. The smoothing and
    the warp run on device (separable blur + gather); the reference used scipy.
    ``image``/``target_image`` are channel-first (C, D, H, W).
    """
    rng = rng or np.random.RandomState(None)
    image = np.asarray(image, dtype=np.float32)
    target_image = np.asarray(target_image, dtype=np.float32)
    spatial = image.shape[-3:]

    def displacement():
        field = (rng.rand(*spatial).astype(np.float32) * 2.0 - 1.0)
        # reference: gaussian_filter(..., mode="constant", cval=0) — zero
        # padding attenuates the displacement toward the volume boundary
        smoothed = separable_gaussian_blur(jnp.asarray(field[None]),
                                           (sigma, sigma, sigma),
                                           pad_mode="zero")[0]
        return smoothed * alpha

    dz, dy, dx = displacement(), displacement(), displacement()
    gz, gy, gx = jnp.meshgrid(jnp.arange(spatial[0], dtype=jnp.float32),
                              jnp.arange(spatial[1], dtype=jnp.float32),
                              jnp.arange(spatial[2], dtype=jnp.float32),
                              indexing="ij")
    coords = jnp.stack([gz + dz, gy + dy, gx + dx])
    # scipy map_coordinates mode='reflect' = half-sample symmetric: reflect
    # about -0.5 and s-0.5 (NOT whole-sample 'mirror' about the end pixels)
    for i, s in enumerate(spatial):
        c = coords[i]
        c = jnp.where(c < 0, -1.0 - c, c)
        c = jnp.where(c > s - 1, 2.0 * s - 1.0 - c, c)
        coords = coords.at[i].set(jnp.clip(c, 0, s - 1))
    warped = np.asarray(sample_at_coords(jnp.asarray(image), coords))
    warped_target = np.asarray(sample_at_coords(jnp.asarray(target_image), coords))
    return warped, warped_target


def smooth_img(data, affine, fwhm):
    """Gaussian smooth with sigma = fwhm / spacing (`augment.py:414-419`)."""
    sigma = np.asarray(fwhm, dtype=np.float64) / \
        affine_ops.get_spacing_from_affine(affine)
    if sigma.ndim == 0:
        sigma = np.repeat(sigma, 3)
    return np.asarray(separable_gaussian_blur(jnp.asarray(np.asarray(data,
                                                                     np.float32)),
                                              tuple(float(s) for s in sigma)))


def random_blur(data, affine, mean: float, std: float,
                rng: Optional[np.random.RandomState] = None):
    """Random-FWHM blur in millimeters (`augment.py:422-426`)."""
    rng = rng or np.random
    return smooth_img(data, affine, np.abs(rng.normal(mean, std, size=3)))
