"""On-device grid resampling: affine resample + resize, trilinear/nearest.

TPU-native replacement for the reference's resampling stack
(`unet3d/utils/resample.py:50-84` wrapping MONAI ``SpatialResample``, and MONAI
``ResizeD``'s torch ``interpolate`` path used at `unet3d/datasets/segmentation.py:60-70`).

Numerics notes (the parity-critical part):

* ``SpatialResample`` builds a normalized theta for ``grid_sample`` from the voxel
  transform ``M = inv(src_affine) @ dst_affine``; the align_corners normalization
  applied when building theta is exactly inverted when ``grid_sample`` converts the
  normalized grid back to voxel coordinates, so the effective mapping is
  ``v_src = M @ v_dst`` for either align_corners setting. We therefore sample source
  voxel coordinates directly.
* ``torch.nn.functional.interpolate`` (MONAI Resize): for ``align_corners=False``
  (the MONAI default) the mapping is ``v_in = (v_out + 0.5) * S_in/S_out - 0.5``;
  for ``True`` it is ``v_in = v_out * (S_in-1)/(S_out-1)``. Legacy ``nearest`` mode
  uses ``v_in = floor(v_out * S_in/S_out)`` with no half-voxel shift.
* Out-of-bounds reads contribute zeros (``padding_mode="zeros"``).

All functions operate on channel-first ``(C, D, H, W)`` arrays (the host data-API
layout) and are jit-compatible: output shape is static, the transform matrix is a
traced value.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.ops import affine as affine_ops

_TRILINEAR_MODES = ("trilinear", "linear", "bilinear")
_NEAREST_MODES = ("nearest", "nearest-exact")


def _flat_gather(data_flat: jnp.ndarray, z, y, x, shape) -> jnp.ndarray:
    """Gather data_flat[(C, D*H*W)] at integer voxel coords with zero padding."""
    d, h, w = shape
    in_bounds = (
        (z >= 0) & (z <= d - 1) & (y >= 0) & (y <= h - 1) & (x >= 0) & (x <= w - 1)
    )
    zc = jnp.clip(z, 0, d - 1)
    yc = jnp.clip(y, 0, h - 1)
    xc = jnp.clip(x, 0, w - 1)
    flat = (zc * h + yc) * w + xc
    vals = jnp.take(data_flat, flat.reshape(-1), axis=1)
    vals = vals.reshape((data_flat.shape[0],) + flat.shape)
    return jnp.where(in_bounds[None], vals, jnp.zeros((), dtype=data_flat.dtype))


def sample_at_coords(data: jnp.ndarray, coords: jnp.ndarray, mode: str = "trilinear") -> jnp.ndarray:
    """Sample ``data (C, D, H, W)`` at float source-voxel ``coords (3, *out_shape)``.

    Returns ``(C, *out_shape)``. Zero padding outside the volume.
    """
    shape = data.shape[-3:]
    data_flat = data.reshape(data.shape[0], -1)
    cz, cy, cx = coords[0], coords[1], coords[2]
    if mode == "nearest_floor":
        # torch legacy-nearest: floor of the (pre-scaled) source coordinate
        z = jnp.floor(cz).astype(jnp.int32)
        y = jnp.floor(cy).astype(jnp.int32)
        x = jnp.floor(cx).astype(jnp.int32)
        return _flat_gather(data_flat, z, y, x, shape)
    if mode in _NEAREST_MODES:
        z = jnp.round(cz).astype(jnp.int32)
        y = jnp.round(cy).astype(jnp.int32)
        x = jnp.round(cx).astype(jnp.int32)
        return _flat_gather(data_flat, z, y, x, shape)
    if mode not in _TRILINEAR_MODES:
        raise ValueError(f"Unsupported interpolation mode: {mode}")
    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fz = (cz - z0).astype(data_flat.dtype)
    fy = (cy - y0).astype(data_flat.dtype)
    fx = (cx - x0).astype(data_flat.dtype)
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    out = jnp.zeros((data.shape[0],) + coords.shape[1:], dtype=data_flat.dtype)
    for dz in (0, 1):
        wz = fz if dz else (1.0 - fz)
        for dy in (0, 1):
            wy = fy if dy else (1.0 - fy)
            for dx in (0, 1):
                wx = fx if dx else (1.0 - fx)
                corner = _flat_gather(data_flat, z0 + dz, y0 + dy, x0 + dx, shape)
                out = out + corner * (wz * wy * wx)[None]
    return out


def _dst_voxel_grid(dst_shape) -> jnp.ndarray:
    """Integer voxel-center grid of a destination volume, shape (3, *dst_shape)."""
    d, h, w = dst_shape
    gz = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 0)
    gy = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 2)
    return jnp.stack([gz, gy, gx])


@partial(jax.jit, static_argnames=("dst_shape", "mode", "reflect"))
def resample_transform(data: jnp.ndarray, transform: jnp.ndarray, dst_shape: tuple,
                       mode: str = "trilinear", clip_max=None,
                       reflect: bool = False) -> jnp.ndarray:
    """Resample with a 4x4 dst-voxel -> src-voxel ``transform``.

    ``transform`` may be a traced array (one compilation serves all affines of a
    given shape pair). ``clip_max`` (traced, shape (3,)) clamps source
    coordinates to [0, clip_max] per axis — used by the bucketed resize, where
    the physical extent is smaller than the padded array. ``reflect`` folds
    out-of-volume coordinates back by mirroring about the border voxel centers
    (torch grid_sample ``padding_mode="reflection"`` with align_corners=True —
    the MONAI RandAffined default).
    """
    grid = _dst_voxel_grid(dst_shape)  # (3, D, H, W)
    rot = transform[:3, :3].astype(jnp.float32)
    trans = transform[:3, 3].astype(jnp.float32)
    # Elementwise multiply-adds, NOT a dot: MXU matmuls run at reduced default
    # precision on TPU, which is unacceptable for sampling coordinates.
    coords = jnp.stack([
        rot[i, 0] * grid[0] + rot[i, 1] * grid[1] + rot[i, 2] * grid[2] + trans[i]
        for i in range(3)
    ])
    if reflect:
        # fold c into [0, L] with period 2L: r = L - |mod(c, 2L) - L|
        last = jnp.asarray([max(s - 1, 0) for s in data.shape[-3:]],
                           jnp.float32)[:, None, None, None]
        period = jnp.maximum(2.0 * last, 1.0)  # L=0 axes: coords clip to 0
        coords = last - jnp.abs(jnp.mod(coords, period) - last)
        coords = jnp.clip(coords, 0.0, last)
    if clip_max is not None:
        clip_max = jnp.asarray(clip_max, jnp.float32)
        coords = jnp.clip(coords, 0.0, clip_max[:, None, None, None])
    return sample_at_coords(data, coords, mode=mode)


def _bucket(size: int, granularity: int = 32) -> int:
    return ((size + granularity - 1) // granularity) * granularity


def resize_bucketed(data, true_shape, out_shape: tuple, mode: str = "trilinear",
                    align_corners: bool = False, granularity: int = 32):
    """torch-interpolate resize where only a *bucketed* input shape is compiled.

    Per-case medical volumes (especially after foreground cropping) all have
    different shapes; jitting `resize` directly recompiles per case. Here the
    input is zero-padded up to the next ``granularity`` multiple per axis and
    the true shape enters as traced values inside the sampling transform — one
    XLA program serves every case in the same bucket (the static-shapes
    strategy from SURVEY.md §7).
    """
    data = np.asarray(data)
    true_shape = tuple(int(s) for s in true_shape)
    out_shape = tuple(int(s) for s in out_shape)
    padded_shape = tuple(_bucket(s, granularity) for s in true_shape)
    pad = [(0, 0)] * (data.ndim - 3) + [(0, p - s) for p, s in
                                        zip(padded_shape, true_shape)]
    padded = np.pad(data, pad)
    ts = jnp.asarray(true_shape, jnp.float32)
    os_ = jnp.asarray(out_shape, jnp.float32)
    if mode in _NEAREST_MODES:
        # torch legacy nearest: src = floor(v * in/out);
        # nearest-exact: src = floor((v + 0.5) * in/out) = floor(v*s + 0.5*s)
        scale = ts / os_
        transform = jnp.zeros((4, 4)).at[3, 3].set(1.0)
        for i in range(3):
            transform = transform.at[i, i].set(scale[i])
            if mode == "nearest-exact":
                transform = transform.at[i, 3].set(0.5 * scale[i])
        out = resample_transform(jnp.asarray(padded), transform, out_shape,
                                 mode="nearest_floor", clip_max=ts - 1)
        return out
    if align_corners:
        scale = (ts - 1) / jnp.maximum(os_ - 1, 1)
        offset = jnp.zeros(3)
    else:
        scale = ts / os_
        offset = 0.5 * scale - 0.5
    transform = jnp.zeros((4, 4)).at[3, 3].set(1.0)
    for i in range(3):
        transform = transform.at[i, i].set(scale[i])
        transform = transform.at[i, 3].set(offset[i])
    return resample_transform(jnp.asarray(padded), transform, out_shape,
                              mode=mode, clip_max=ts - 1)


def resample(data, src_affine, dst_affine, dst_shape, mode: str = "trilinear",
             align_corners: bool = True, margin: float = 1e-6):
    """Resample a channel-first volume onto the grid of ``(dst_affine, dst_shape)``.

    Parity: `unet3d/utils/resample.py:50-71` including the identity short-circuit
    when affines match within ``margin`` and shapes are equal. ``align_corners`` is
    accepted for API parity; see module docstring for why it does not alter the
    voxel mapping.
    """
    del align_corners
    src_affine = np.asarray(src_affine, dtype=np.float64)
    dst_affine = np.asarray(dst_affine, dtype=np.float64)
    dst_shape = tuple(int(s) for s in dst_shape)
    if (np.all(np.abs(src_affine - dst_affine) < margin)
            and tuple(data.shape[-3:]) == dst_shape):
        return data
    transform = affine_ops.voxel_to_voxel_transform(src_affine, dst_affine)
    return resample_transform(jnp.asarray(data), jnp.asarray(transform), dst_shape, mode=mode)


def resample_to_img(data, src_affine, target_affine, target_shape, mode: str = "trilinear"):
    """Parity: `unet3d/utils/resample.py:82-84` (resample onto another image's grid)."""
    return resample(data, src_affine, target_affine, target_shape, mode=mode)


@partial(jax.jit, static_argnames=("out_shape", "mode", "align_corners"))
def resize(data: jnp.ndarray, out_shape: tuple, mode: str = "trilinear",
           align_corners: bool = False) -> jnp.ndarray:
    """Resize ``(C, D, H, W)`` to ``(C, *out_shape)`` with torch-interpolate semantics.

    TPU-native equivalent of MONAI ``ResizeD`` (`unet3d/datasets/segmentation.py:66-68`;
    trilinear for images, nearest for one-hot labels).
    """
    in_shape = data.shape[-3:]
    out_shape = tuple(int(s) for s in out_shape)
    axes_coords = []
    for s_in, s_out in zip(in_shape, out_shape):
        v = jnp.arange(s_out, dtype=jnp.float32)
        if mode in _NEAREST_MODES:
            if mode == "nearest":
                # torch legacy nearest: floor(v * scale), no center shift
                c = jnp.floor(v * (s_in / s_out))
            else:
                c = jnp.floor((v + 0.5) * (s_in / s_out))
            c = jnp.clip(c, 0, s_in - 1)
        elif align_corners:
            c = v * ((s_in - 1) / max(s_out - 1, 1))
        else:
            c = (v + 0.5) * (s_in / s_out) - 0.5
        axes_coords.append(c)
    cz = axes_coords[0][:, None, None]
    cy = axes_coords[1][None, :, None]
    cx = axes_coords[2][None, None, :]
    coords = jnp.stack([
        jnp.broadcast_to(cz, out_shape),
        jnp.broadcast_to(cy, out_shape),
        jnp.broadcast_to(cx, out_shape),
    ])
    if mode in _NEAREST_MODES:
        # Indices are already exact integers; nearest gather without rounding drift.
        return sample_at_coords(data, coords, mode="nearest")
    # Interior resize never samples out of bounds; torch clamps the +1 neighbor at the
    # upper edge (weight ~0 there), and negative coords at the lower edge clamp to 0.
    clamped = jnp.stack([
        jnp.clip(coords[0], 0.0, in_shape[0] - 1),
        jnp.clip(coords[1], 0.0, in_shape[1] - 1),
        jnp.clip(coords[2], 0.0, in_shape[2] - 1),
    ])
    return sample_at_coords(data, clamped, mode=mode)


def resample_image_to_spacing(data, affine, new_spacing, mode: str = "trilinear"):
    """Resample to a new voxel spacing; returns (data, new_affine).

    Parity: `unet3d/utils/resample.py:26-41` — new shape = floor(extent/new_spacing
    + eps), field-of-view center preserved via `adjust_affine_spacing`.
    """
    affine = np.asarray(affine, dtype=np.float64)
    new_spacing = np.asarray(new_spacing, dtype=np.float64)
    current_spacing = affine_ops.get_spacing_from_affine(affine)
    new_affine = affine_ops.adjust_affine_spacing(affine, new_spacing, spacing=current_spacing)
    extent = affine_ops.get_extent_from_shape(data.shape, affine)
    # reference adds exactly float64 eps (`unet3d/utils/resample.py:33-35`)
    new_shape = tuple(int(s) for s in
                      np.floor(extent / new_spacing + np.finfo(np.float64).eps))
    out = resample(data, affine, new_affine, new_shape, mode=mode)
    return out, new_affine
