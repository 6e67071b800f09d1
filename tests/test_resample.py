"""Resampling parity tests — the #1 numeric-parity risk (SURVEY.md §7).

Golden checks against torch CPU (`torch.nn.functional.interpolate` and
`grid_sample`) which is exactly what MONAI's Resize/SpatialResample call into.
"""
import numpy as np
import pytest

from unet3d_tpu.ops import resample as rs
from unet3d_tpu.ops import affine as affine_ops

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def rand_volume(shape=(2, 9, 10, 11), seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(*shape).astype(np.float32)


def test_resize_trilinear_matches_torch():
    x = rand_volume()
    out = np.asarray(rs.resize(x, (12, 7, 14), mode="trilinear", align_corners=False))
    ref = F.interpolate(torch.from_numpy(x)[None], size=(12, 7, 14), mode="trilinear",
                        align_corners=False)[0].numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_resize_trilinear_align_corners_matches_torch():
    x = rand_volume(seed=1)
    out = np.asarray(rs.resize(x, (5, 6, 7), mode="trilinear", align_corners=True))
    ref = F.interpolate(torch.from_numpy(x)[None], size=(5, 6, 7), mode="trilinear",
                        align_corners=True)[0].numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_resize_nearest_matches_torch():
    x = rand_volume(seed=2)
    out = np.asarray(rs.resize(x, (13, 5, 8), mode="nearest"))
    ref = F.interpolate(torch.from_numpy(x)[None], size=(13, 5, 8), mode="nearest")[0].numpy()
    np.testing.assert_array_equal(out, ref)


def test_resize_upsample_downsample_roundtrip_constant():
    x = np.ones((1, 8, 8, 8), dtype=np.float32) * 3.0
    out = np.asarray(rs.resize(x, (16, 16, 16), mode="trilinear"))
    np.testing.assert_allclose(out, 3.0, atol=1e-6)


def test_identity_resample_shortcircuit():
    x = rand_volume()
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    out = rs.resample(x, affine, affine, x.shape[-3:])
    assert out is x  # identity short-circuit (unet3d/utils/resample.py:65-67)


def test_resample_pure_translation():
    # Shifting the target grid by exactly one voxel reproduces a shifted array
    x = rand_volume((1, 6, 6, 6), seed=3)
    src = np.eye(4)
    dst = np.eye(4)
    dst[:3, 3] = [1.0, 0.0, 0.0]
    out = np.asarray(rs.resample(x, src, dst, (6, 6, 6)))
    np.testing.assert_allclose(out[0, :5], x[0, 1:], atol=1e-6)
    np.testing.assert_allclose(out[0, 5], 0.0, atol=1e-6)  # zero padding


def test_resample_matches_grid_sample():
    # General affine: compare against torch grid_sample(align_corners=True) with
    # the theta built the same way MONAI SpatialResample does.
    x = rand_volume((1, 8, 9, 10), seed=4)
    src = np.diag([1.3, 0.9, 1.1, 1.0])
    src[:3, 3] = [2.0, -3.0, 1.0]
    theta = np.pi / 7
    rot = np.array([[np.cos(theta), -np.sin(theta), 0, 0.5],
                    [np.sin(theta), np.cos(theta), 0, -1.0],
                    [0, 0, 1.0, 2.0],
                    [0, 0, 0, 1.0]])
    dst = rot @ np.diag([1.5, 1.5, 1.5, 1.0])
    dst_shape = (7, 8, 6)
    out = np.asarray(rs.resample(x, src, dst, dst_shape, mode="trilinear"))

    # torch reference: voxel transform M maps dst voxel (z,y,x order) -> src voxel
    m = affine_ops.voxel_to_voxel_transform(src, dst)
    zz, yy, xx = np.meshgrid(np.arange(dst_shape[0]), np.arange(dst_shape[1]),
                             np.arange(dst_shape[2]), indexing="ij")
    vox = np.stack([zz, yy, xx, np.ones_like(zz)]).reshape(4, -1)
    src_vox = (m @ vox)[:3]
    # grid_sample wants normalized (x, y, z) order coords
    in_shape = x.shape[-3:]
    norm = [2 * src_vox[i] / (in_shape[i] - 1) - 1 for i in range(3)]
    grid = np.stack([norm[2], norm[1], norm[0]], axis=-1).reshape(
        1, *dst_shape, 3).astype(np.float32)
    ref = F.grid_sample(torch.from_numpy(x)[None], torch.from_numpy(grid),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=True)[0].numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_resample_to_spacing_intensity_preserved():
    # Downsampling a constant image must preserve intensity (reference
    # test_utils.py:86-101 asserts intensity scaling behavior on the diagonal).
    x = np.full((1, 8, 8, 8), 7.0, dtype=np.float32)
    affine = np.eye(4)
    out, new_affine = rs.resample_image_to_spacing(x, affine, [2.0, 2.0, 2.0])
    assert out.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(affine_ops.get_spacing_from_affine(new_affine), [2, 2, 2])
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_resize_ndhwc_matches_torch():
    # decoder upsampling path (ops/interpolate) vs torch interpolate
    from unet3d_tpu.ops.interpolate import resize_ndhwc, upsample_ndhwc
    x = rand_volume((1, 6, 7, 8), seed=9)  # (C, D, H, W)
    x_ndhwc = np.moveaxis(x, 0, -1)[None]
    out = np.asarray(resize_ndhwc(jnp_asarray(x_ndhwc), (12, 14, 16),
                                  mode="trilinear", align_corners=False))
    ref = F.interpolate(torch.from_numpy(x)[None], size=(12, 14, 16),
                        mode="trilinear", align_corners=False)[0].numpy()
    np.testing.assert_allclose(np.moveaxis(out[0], -1, 0), ref, atol=2e-5)
    up = np.asarray(upsample_ndhwc(jnp_asarray(x_ndhwc), scale=2))
    ref2 = F.interpolate(torch.from_numpy(x)[None], scale_factor=2,
                         mode="trilinear", align_corners=False)[0].numpy()
    np.testing.assert_allclose(np.moveaxis(up[0], -1, 0), ref2, atol=2e-5)


def test_resize_ndhwc_nearest_matches_torch():
    from unet3d_tpu.ops.interpolate import resize_ndhwc
    x = rand_volume((2, 5, 6, 7), seed=10)
    x_ndhwc = np.moveaxis(x, 0, -1)[None]
    out = np.asarray(resize_ndhwc(jnp_asarray(x_ndhwc), (9, 4, 13), mode="nearest"))
    ref = F.interpolate(torch.from_numpy(x)[None], size=(9, 4, 13),
                        mode="nearest")[0].numpy()
    np.testing.assert_array_equal(np.moveaxis(out[0], -1, 0), ref)


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def test_bucketed_nearest_exact_matches_resize():
    """nearest-exact in the bucketed path must use the +0.5 center shift like
    resize(); the legacy-nearest floor formula is one voxel off."""
    import numpy as np

    from unet3d_tpu.ops.resample import resize, resize_bucketed

    data = np.arange(4 * 4 * 4, dtype=np.float32).reshape(1, 4, 4, 4)
    ref = np.asarray(resize(data, (2, 2, 2), mode="nearest-exact"))
    out = np.asarray(resize_bucketed(data, (4, 4, 4), (2, 2, 2),
                                     mode="nearest-exact", granularity=4))
    np.testing.assert_array_equal(out, ref)
