"""Geometry tests, modeled on the reference's synthetic-volume suite
(`test/test_utils.py:21-101`): exact asserts on affine algebra."""
import numpy as np
import pytest

from unet3d_tpu.ops import affine as affine_ops


def test_spacing_from_affine():
    affine = np.diag([2.0, 3.0, 4.0, 1.0])
    np.testing.assert_allclose(affine_ops.get_spacing_from_affine(affine), [2, 3, 4])


def test_spacing_with_rotation():
    theta = np.pi / 6
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1.0]])
    affine = np.eye(4)
    affine[:3, :3] = rot @ np.diag([2.0, 3.0, 4.0])
    np.testing.assert_allclose(affine_ops.get_spacing_from_affine(affine), [2, 3, 4])


def test_set_affine_spacing():
    affine = np.diag([1.0, 1.0, 1.0, 1.0])
    new = affine_ops.set_affine_spacing(affine, [2.0, 2.0, 2.0])
    np.testing.assert_allclose(affine_ops.get_spacing_from_affine(new), [2, 2, 2])


def test_resize_affine_preserves_extent_center():
    # Resizing a 4-voxel 1mm grid to 2 voxels doubles spacing and keeps the
    # field-of-view center fixed (reference test_utils.py:32-39 semantics).
    affine = np.eye(4)
    shape = (4, 4, 4)
    target = (2, 2, 2)
    new_affine = affine_ops.resize_affine(affine, shape, target)
    np.testing.assert_allclose(affine_ops.get_spacing_from_affine(new_affine), [2, 2, 2])
    # center of the FOV: affine @ center_voxel must be preserved
    old_center = affine @ np.array([1.5, 1.5, 1.5, 1.0])
    new_center = new_affine @ np.array([0.5, 0.5, 0.5, 1.0])
    np.testing.assert_allclose(old_center, new_center)


def test_resize_affine_noop():
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    out = affine_ops.resize_affine(affine, (8, 8, 8), (8, 8, 8))
    np.testing.assert_array_equal(out, affine)


def test_crop_affine_translates_origin():
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    affine[:3, 3] = [10.0, 20.0, 30.0]
    new = affine_ops.crop_affine(affine, [1, 2, 3])
    np.testing.assert_allclose(new[:3, 3], [12.0, 24.0, 36.0])
    np.testing.assert_allclose(new[:3, :3], affine[:3, :3])


def test_voxel_to_voxel_transform_identity():
    affine = np.diag([2.0, 3.0, 4.0, 1.0])
    t = affine_ops.voxel_to_voxel_transform(affine, affine)
    np.testing.assert_allclose(t, np.eye(4), atol=1e-12)


def test_is_diag_and_assert():
    assert affine_ops.is_diag(np.diag([1, 2, 3]))
    bad = np.eye(4)
    bad[0, 1] = 0.5
    with pytest.raises(NotImplementedError):
        affine_ops.assert_affine_is_diagonal(bad)
