"""Legacy augmentation library tests — property-style, mirroring
`test/test_augment.py` (48-element permutation group; scale-down border zeros)."""
import numpy as np
import pytest

from unet3d_tpu.ops import augment


def test_permutation_group_has_48_unique_elements():
    keys = augment.generate_permutation_keys()
    assert len(keys) == 48
    base = np.arange(4 ** 3).reshape(1, 4, 4, 4)
    outputs = {augment.permute_data(base, key).tobytes() for key in keys}
    assert len(outputs) == 48  # every key realizes a distinct permutation


def test_permute_reverse_roundtrip_all_keys():
    data = np.random.RandomState(0).rand(2, 4, 4, 4).astype(np.float32)
    for key in augment.generate_permutation_keys():
        out = augment.permute_data(data, key)
        back = augment.reverse_permute_data(out, key)
        np.testing.assert_array_equal(back, data)


def test_permute_backward_compatible_2tuple():
    data = np.random.RandomState(1).rand(1, 4, 4, 4).astype(np.float32)
    out_2 = augment.permute_data(data, ((1, 2), 0, 1, 0, 0))
    out_3 = augment.permute_data(data, ((0, 1, 2), 0, 1, 0, 0))
    np.testing.assert_array_equal(out_2, out_3)


def test_random_permutation_x_y_same_key():
    x = np.random.RandomState(2).rand(1, 4, 4, 4).astype(np.float32)
    rng = np.random.RandomState(3)
    xp, yp = augment.random_permutation_x_y(x, x.copy(), rng=rng)
    np.testing.assert_array_equal(xp, yp)


def test_scale_down_zeroes_borders():
    # Zooming out (scale < 1) brings zero padding into the borders
    # (reference test_augment.py:21-44 semantics for diagonal affines).
    data = np.ones((1, 8, 8, 8), dtype=np.float32)
    out = augment.scale_image(data, np.eye(4), scale=0.5)
    assert out[0, 0, 0, 0] == 0.0
    assert out[0, 4, 4, 4] == pytest.approx(1.0, abs=1e-5)


def test_scale_up_preserves_constant():
    data = np.full((1, 8, 8, 8), 3.0, dtype=np.float32)
    out = augment.scale_image(data, np.eye(4), scale=2.0)
    np.testing.assert_allclose(out, 3.0, atol=1e-5)


def test_scale_affine_preserves_center():
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    shape = (8, 8, 8)
    scaled = augment.scale_affine(affine, shape, 2.0)
    np.testing.assert_allclose(augment.find_center(scaled, shape),
                               augment.find_center(affine, shape))


def test_translate_image_shifts_content():
    data = np.zeros((1, 8, 8, 8), dtype=np.float32)
    data[0, 4, 4, 4] = 1.0
    # translate the grid one voxel forward (1/8 extent): content shifts backward
    out = augment.translate_image(data, np.eye(4), [1.0 / 8, 0, 0])
    assert out[0, 3, 4, 4] == pytest.approx(1.0, abs=1e-5)


def test_add_noise_scales_with_std():
    rng = np.random.RandomState(0)
    data = rng.rand(2, 8, 8, 8).astype(np.float32) * 10
    noisy = augment.add_noise(data, sigma_factor=0.1, rng=np.random.RandomState(1))
    resid = noisy - data
    assert abs(resid.std() - 0.1 * data.std()) < 0.05


def test_augment_data_same_distortion_for_truth():
    rng = np.random.RandomState(5)
    data = np.random.RandomState(0).rand(2, 8, 8, 8).astype(np.float32)
    truth = (data[0] > 0.5).astype(np.float32)
    out, truth_out = augment.augment_data(data, truth, np.eye(4), flip=True, rng=rng)
    assert out.shape == data.shape
    assert truth_out.shape == truth.shape
    assert set(np.unique(truth_out)).issubset({0.0, 1.0})  # nearest for truth


def test_elastic_transform_shapes_and_identity_limit():
    img = np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32)
    tgt = (img > 0.5).astype(np.float32)
    out, tout = augment.elastic_transform(img, alpha=0.0, sigma=1.0, target_image=tgt,
                                          rng=np.random.RandomState(1))
    np.testing.assert_allclose(out, img, atol=1e-5)  # alpha=0 -> identity
    out2, _ = augment.elastic_transform(img, alpha=3.0, sigma=2.0, target_image=tgt,
                                        rng=np.random.RandomState(1))
    assert out2.shape == img.shape
    assert not np.allclose(out2, img)


def test_smooth_img_reduces_variance():
    data = np.random.RandomState(0).rand(1, 12, 12, 12).astype(np.float32)
    smoothed = augment.smooth_img(data, np.eye(4), fwhm=3.0)
    assert smoothed.std() < data.std()
    # means approximately preserved
    assert abs(smoothed.mean() - data.mean()) < 0.05


def test_affine_swap_axis_preserves_world_positions():
    # axis indexes channel-first data dims (reference contract: sp = axis - 1),
    # so axis=1 flips the first spatial axis.
    affine = np.diag([2.0, 1.0, 1.0, 1.0])
    shape = (1, 4, 8, 8)  # (C, D, H, W)
    swapped = augment.affine_swap_axis(affine, shape, axis=1)
    # voxel 0 in the flipped image = voxel shape-1 in the original
    orig = affine @ np.array([3, 0, 0, 1.0])
    new = swapped @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(orig, new)
