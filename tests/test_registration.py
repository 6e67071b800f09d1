"""Rigid registration: recover a known synthetic transform (NCC and MI).

TPU-native replacement for the reference's ANTs QuickRigid preprocessing
(`/root/reference/examples/sppin/process.py:219-226`).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.ops.registration import (mutual_information,
                                         normalized_cross_correlation,
                                         register_rigid, _rotation_matrix)
from unet3d_tpu.ops.resample import resample_transform

SHAPE = (24, 24, 24)
SPACING = 2.0


def _fixed_volume():
    rng = np.random.RandomState(0)
    z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in SHAPE],
                          indexing="ij")
    c = (np.array(SHAPE) - 1) / 2
    # anisotropic blob + off-center lobe: rotation is observable
    v = np.exp(-(((z - c[0]) / 6) ** 2 + ((y - c[1]) / 4) ** 2
                 + ((x - c[2]) / 3) ** 2))
    v += 0.7 * np.exp(-(((z - c[0] - 5) / 2.5) ** 2 + ((y - c[1]) / 2.5) ** 2
                        + ((x - c[2] - 4) / 2.5) ** 2))
    v += rng.rand(*SHAPE).astype(np.float32) * 0.01
    return v.astype(np.float32)


def _true_transform(affine):
    """Rigid fixed-phys -> moving-phys: small rotation about the volume
    center + translation (same parameterization the optimizer uses)."""
    rot = np.array([0.08, -0.05, 0.1])
    t = np.array([3.0, -2.0, 4.0])
    R = np.asarray(_rotation_matrix(jnp.asarray(rot, jnp.float32)),
                   dtype=np.float64)
    c = (affine @ np.array(list((np.array(SHAPE) - 1) / 2.0) + [1.0]))[:3]
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = c + t - R @ c
    return T, rot, t


def _make_pair():
    affine = np.diag([SPACING, SPACING, SPACING, 1.0])
    fixed = _fixed_volume()
    T, rot, t = _true_transform(affine)
    # moving(v) = fixed at phys T^-1 A v  =>  warped-by-T equals fixed exactly
    M = np.linalg.inv(affine) @ np.linalg.inv(T) @ affine
    moving = np.asarray(resample_transform(jnp.asarray(fixed)[None],
                                           jnp.asarray(M), SHAPE)[0])
    return fixed, moving, affine, T, rot, t


@pytest.mark.parametrize("metric", ["ncc", "mi"])
def test_register_rigid_recovers_known_transform(metric):
    fixed, moving, affine, T_true, rot_true, t_true = _make_pair()
    if metric == "mi":
        # simulate a modality change: monotone nonlinear intensity remap
        moving = np.exp(1.5 * moving).astype(np.float32) - 1.0

    warped, T, info = register_rigid(fixed, affine, moving, affine,
                                     metric=metric, levels=(2, 1),
                                     iters=(120, 60), lr=0.02)
    assert np.allclose(info["rot"], rot_true, atol=0.03), info["rot"]
    assert np.allclose(info["t"], t_true, atol=1.0), info["t"]

    if metric == "ncc":
        # geometry recovered => warped matches fixed away from the border
        inner = (slice(4, -4),) * 3
        ncc = float(normalized_cross_correlation(
            jnp.asarray(warped[inner]), jnp.asarray(fixed[inner])))
        assert ncc > 0.98, ncc


def test_register_rigid_identity_is_stable():
    fixed = _fixed_volume()
    affine = np.diag([SPACING, SPACING, SPACING, 1.0])
    warped, T, info = register_rigid(fixed, affine, fixed.copy(), affine,
                                     metric="ncc", levels=(2,), iters=(40,),
                                     lr=0.01)
    assert np.linalg.norm(info["rot"]) < 0.02
    assert np.linalg.norm(info["t"]) < 1.0
    assert np.allclose(T[:3, :3], np.eye(3), atol=0.03)


def test_metric_values_sane():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(10, 10, 10).astype(np.float32))
    assert float(normalized_cross_correlation(a, a)) == pytest.approx(1.0, abs=1e-4)
    assert float(normalized_cross_correlation(a, -a)) == pytest.approx(-1.0, abs=1e-4)
    mi_self = float(mutual_information(a, a))
    b = jnp.asarray(rng.rand(10, 10, 10).astype(np.float32))
    mi_rand = float(mutual_information(a, b))
    # independent data: small (finite-sample Parzen bias ~bins^2/2N), and
    # far below the self-MI
    assert mi_rand < 0.5 * mi_self
    assert mi_rand < 0.4
