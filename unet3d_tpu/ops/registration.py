"""Rigid intra-subject registration, TPU-native (gradient descent on jit).

Replaces the reference's external ANTs dependency: the SPPIN container entry
registers every modality to T1 with ``ants.registration(type_of_transform=
"QuickRigid")`` (`/root/reference/examples/sppin/process.py:219-226`) — the
one preprocessing step the round-2 review listed as an external-tool gap.

Design (classical multi-resolution intensity registration, differentiably):

- 6-DOF rigid transform in *physical* space: ``x_m = R(r) (x_f - c) + c + t``
  with ``R`` the Rodrigues rotation of an axis-angle vector ``r`` and ``c``
  the fixed volume's physical center. The dst-voxel -> src-voxel sampling
  matrix ``A_m^-1 T A_f`` is built inside jit from the traced parameters, so
  one compilation serves the whole optimization.
- Similarity: negative normalized cross-correlation (same-modality) or
  Parzen-window mutual information with triangular (linear-interp) soft
  binning — both smooth in the parameters; the trilinear resampler
  (`ops/resample.sample_at_coords`) provides the gradient path.
- Multi-resolution pyramid (trilinear-downsampled levels) with Adam; the
  translation is parameterized in ~10 mm units so one learning rate serves
  rotation (radians) and translation. Initialization aligns intensity
  centers of mass.

All compute is jit-compiled elementwise/gather work (no data-dependent
Python control flow); each (level shape, metric) pair compiles once.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import optax

from unet3d_tpu.ops.resample import resample_transform, resize

_T_SCALE = 10.0  # translation parameter unit (mm)


def _rotation_matrix(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues axis-angle -> 3x3 rotation (jnp, differentiable at 0)."""
    theta2 = jnp.sum(rotvec ** 2)
    theta = jnp.sqrt(theta2 + 1e-12)
    k = rotvec / theta
    kx, ky, kz = k[0], k[1], k[2]
    K = jnp.array([[0.0, -kz, ky],
                   [kz, 0.0, -kx],
                   [-ky, kx, 0.0]])
    s = jnp.sin(theta)
    cc = jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1.0 - cc) * (K @ K)
    # near theta=0 the series is numerically exact enough; blend for safety
    R0 = jnp.eye(3) + K * theta  # first-order
    return jnp.where(theta < 1e-5, R0, R)


def _physical_transform(params, center: jnp.ndarray) -> jnp.ndarray:
    """4x4 fixed-physical -> moving-physical rigid transform."""
    R = _rotation_matrix(params["rot"])
    t = params["t"] * _T_SCALE
    top = jnp.concatenate([R, (center + t - R @ center)[:, None]], axis=1)
    return jnp.concatenate([top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)


def normalized_cross_correlation(a: jnp.ndarray, b: jnp.ndarray,
                                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Global NCC in [−1, 1] (optionally masked)."""
    a = a.reshape(-1).astype(jnp.float32)
    b = b.reshape(-1).astype(jnp.float32)
    if mask is not None:
        w = mask.reshape(-1).astype(jnp.float32)
        n = jnp.sum(w) + 1e-6
        ma, mb = jnp.sum(a * w) / n, jnp.sum(b * w) / n
        da, db = (a - ma) * w, (b - mb) * w
    else:
        da, db = a - a.mean(), b - b.mean()
    num = jnp.sum(da * db)
    den = jnp.sqrt(jnp.sum(da * da) * jnp.sum(db * db)) + 1e-6
    return num / den


def mutual_information(a: jnp.ndarray, b: jnp.ndarray, bins: int = 32,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Parzen-window MI with triangular soft binning (differentiable).

    Intensities are min-max normalized per call; the joint histogram is one
    (N, bins) x (N, bins) matmul — MXU-shaped.
    """
    a = a.reshape(-1).astype(jnp.float32)
    b = b.reshape(-1).astype(jnp.float32)
    w = (mask.reshape(-1).astype(jnp.float32) if mask is not None
         else jnp.ones_like(a))

    def soft_bin(x):
        lo, hi = jnp.min(x), jnp.max(x)
        x01 = (x - lo) / (hi - lo + 1e-6)
        pos = x01 * (bins - 1)
        centers = jnp.arange(bins, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - centers[None]))

    wa = soft_bin(a) * w[:, None]
    wb = soft_bin(b)
    joint = wa.T @ wb
    joint = joint / (jnp.sum(joint) + 1e-6)
    pa = joint.sum(axis=1, keepdims=True)
    pb = joint.sum(axis=0, keepdims=True)
    return jnp.sum(joint * (jnp.log(joint + 1e-9)
                            - jnp.log(pa + 1e-9) - jnp.log(pb + 1e-9)))


def _center_of_mass_phys(data: np.ndarray, affine: np.ndarray) -> np.ndarray:
    v = np.asarray(data, dtype=np.float64)
    v = v - v.min()
    total = v.sum() + 1e-9
    idx = [np.arange(s, dtype=np.float64) for s in v.shape]
    com = [float((v.sum(axis=tuple(a for a in range(3) if a != ax)) *
                  idx[ax]).sum() / total) for ax in range(3)]
    return (affine @ np.array(com + [1.0]))[:3]


@partial(jax.jit, static_argnames=("shape", "metric", "bins", "n_iters", "lr"))
def _optimize_level(fixed, moving, fixed_affine, moving_affine_inv, center,
                    params0, shape: tuple, metric: str = "mi", bins: int = 32,
                    n_iters: int = 50, lr: float = 0.03):
    """Adam loop over the rigid parameters at one pyramid level."""
    fixed_affine = fixed_affine.astype(jnp.float32)
    moving_affine_inv = moving_affine_inv.astype(jnp.float32)

    def loss_fn(params):
        T = _physical_transform(params, center)
        M = moving_affine_inv @ T @ fixed_affine  # dst voxel -> src voxel
        warped = resample_transform(moving[None], M, shape)[0]
        if metric == "ncc":
            return -normalized_cross_correlation(fixed, warped)
        return -mutual_information(fixed, warped, bins=bins)

    tx = optax.adam(lr)

    def body(carry, _):
        params, opt_state = carry
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    (params, _), losses = jax.lax.scan(
        body, (params0, tx.init(params0)), None, length=n_iters)
    return params, losses


def register_rigid(fixed, fixed_affine: np.ndarray, moving,
                   moving_affine: np.ndarray, metric: str = "mi",
                   levels: Sequence[int] = (4, 2, 1),
                   iters: Sequence[int] = (80, 40, 20),
                   lr: float = 0.03, bins: int = 32,
                   init_com: bool = True
                   ) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Register ``moving`` to ``fixed`` with a 6-DOF rigid transform.

    Args: single-channel volumes ``(D, H, W)`` (numpy or jnp) + 4x4 affines.
    Returns ``(warped, transform, info)``: the moving volume resampled onto
    the fixed grid (the ANTs ``warpedmovout`` analog), the 4x4
    fixed-physical -> moving-physical rigid transform, and a dict with the
    final parameters and per-level loss curves.
    """
    fixed = np.asarray(fixed, dtype=np.float32)
    moving = np.asarray(moving, dtype=np.float32)
    fixed_affine = np.asarray(fixed_affine, dtype=np.float64)
    moving_affine = np.asarray(moving_affine, dtype=np.float64)
    if fixed.ndim != 3 or moving.ndim != 3:
        raise ValueError("register_rigid takes single-channel (D, H, W) volumes")

    center = jnp.asarray(
        (fixed_affine @ np.array(list((np.array(fixed.shape) - 1) / 2.0)
                                 + [1.0]))[:3], jnp.float32)
    t0 = np.zeros(3)
    if init_com:
        t0 = (_center_of_mass_phys(moving, moving_affine)
              - _center_of_mass_phys(fixed, fixed_affine)) / _T_SCALE
    params = {"rot": jnp.zeros(3, jnp.float32),
              "t": jnp.asarray(t0, jnp.float32)}

    moving_j = jnp.asarray(moving)
    minv = np.linalg.inv(moving_affine)
    loss_curves = []
    for level, n_iter in zip(levels, iters):
        if level > 1:
            shape = tuple(max(4, s // level) for s in fixed.shape)
            fixed_l = np.asarray(resize(jnp.asarray(fixed)[None], shape))[0]
            # resize uses torch-interpolate half-pixel sampling: small voxel v
            # sits at big voxel (v + 0.5) * scale - 0.5 — fold that exact
            # mapping into the level's affine so coarse levels optimize the
            # same physical objective as the full-resolution level
            scale = np.array(fixed.shape, np.float64) / np.array(shape)
            lift = np.eye(4)
            lift[:3, :3] = np.diag(scale)
            lift[:3, 3] = 0.5 * scale - 0.5
            aff_l = fixed_affine @ lift
        else:
            shape, fixed_l, aff_l = fixed.shape, fixed, fixed_affine
        params, losses = _optimize_level(
            jnp.asarray(fixed_l), moving_j, jnp.asarray(aff_l),
            jnp.asarray(minv), center, params, tuple(shape), metric=metric,
            bins=bins, n_iters=int(n_iter), lr=float(lr))
        loss_curves.append(np.asarray(losses))

    T = np.asarray(_physical_transform(
        {k: np.asarray(v) for k, v in params.items()}, np.asarray(center)),
        dtype=np.float64)
    M = minv @ T @ fixed_affine
    warped = np.asarray(resample_transform(moving_j[None], jnp.asarray(M),
                                           tuple(fixed.shape))[0])
    info = {"rot": np.asarray(params["rot"]),
            "t": np.asarray(params["t"]) * _T_SCALE,
            "loss_curves": loss_curves}
    return warped, T, info
