"""Cropping tests, modeled on `test/test_utils.py:21-30,62-73` (bbox -> affine
translation, 4D channel-first crop)."""
import numpy as np

from unet3d_tpu.ops import crop
from unet3d_tpu.ops.threshold import percentile_threshold


def test_crop_img_bbox_and_affine():
    data = np.zeros((1, 10, 10, 10), dtype=np.float32)
    data[0, 3:6, 4:7, 5:8] = 1.0
    affine = np.diag([2.0, 2.0, 2.0, 1.0])
    cropped, new_affine = crop.crop_img(data, affine, pad=0)
    assert cropped.shape == (1, 3, 3, 3)
    np.testing.assert_allclose(new_affine[:3, 3], [6.0, 8.0, 10.0])


def test_crop_img_pad_margin():
    data = np.zeros((1, 10, 10, 10), dtype=np.float32)
    data[0, 3:6, 3:6, 3:6] = 1.0
    cropped, _ = crop.crop_img(data, np.eye(4), pad=1)
    assert cropped.shape == (1, 5, 5, 5)


def test_crop_img_no_foreground_returns_input():
    data = np.zeros((1, 4, 4, 4), dtype=np.float32)
    out, affine = crop.crop_img(data, np.eye(4))
    assert out.shape == data.shape


def test_crop_img_edge_clipping():
    data = np.zeros((1, 4, 4, 4), dtype=np.float32)
    data[0, 0, 0, 0] = 1.0
    cropped, _ = crop.crop_img(data, np.eye(4), pad=2)
    assert cropped.shape == (1, 3, 3, 3)  # clipped at the volume edge


def test_percentile_threshold_any_channel():
    img = np.zeros((2, 4, 4, 4), dtype=np.float32)
    img[0, 1, 1, 1] = 10.0
    img[1, 2, 2, 2] = 10.0
    mask = np.asarray(percentile_threshold(img, 0.9))
    assert mask.shape == (1, 4, 4, 4)
    assert mask[0, 1, 1, 1] and mask[0, 2, 2, 2]


def test_crop_foreground_applies_to_label():
    img = np.zeros((1, 10, 10, 10), dtype=np.float32)
    img[0, 4:7, 4:7, 4:7] = 5.0
    lbl = np.ones((2, 10, 10, 10), dtype=np.float32)
    out_img, new_affine, out_lbl, slices = crop.crop_foreground(
        img, np.eye(4), label=lbl, foreground_percentile=0.1, margin=1)
    assert out_img.shape[-3:] == out_lbl.shape[-3:]
    assert out_img.shape[-3:] == (5, 5, 5)  # 3 + 2*margin
    np.testing.assert_allclose(new_affine[:3, 3], [3.0, 3.0, 3.0])


def test_pad_or_crop_pads_small():
    data = np.ones((1, 4, 4, 4), dtype=np.float32)
    out, affine = crop.pad_or_crop(data, (8, 8, 8), affine=np.eye(4))
    assert out.shape == (1, 8, 8, 8)
    assert out.sum() == 4 ** 3
    # origin moved backward by the pad amount
    np.testing.assert_allclose(affine[:3, 3], [-2.0, -2.0, -2.0])


def test_pad_or_crop_crops_large():
    data = np.zeros((1, 8, 8, 8), dtype=np.float32)
    data[0, 2:6, 2:6, 2:6] = 1.0
    out, affine = crop.pad_or_crop(data, (4, 4, 4), affine=np.eye(4))
    assert out.shape == (1, 4, 4, 4)
    assert out.sum() == 4 ** 3  # centered crop captured the cube
    np.testing.assert_allclose(affine[:3, 3], [2.0, 2.0, 2.0])


def test_pad_or_crop_mixed():
    data = np.ones((1, 10, 4, 10), dtype=np.float32)
    out = crop.pad_or_crop(data, (4, 8, 4))
    assert out.shape == (1, 4, 8, 4)


def test_background_correction_roundtrip():
    data = np.random.RandomState(0).rand(2, 4, 4, 4).astype(np.float32) + 5.0
    out = crop.run_with_background_correction(lambda a: a * 1.0, data)
    np.testing.assert_allclose(out, data, atol=1e-6)
    bg = crop.get_background_values(data)
    assert bg.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(bg[:, 0, 0, 0], data.min(axis=(1, 2, 3)))
