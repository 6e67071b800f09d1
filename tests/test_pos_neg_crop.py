"""RandCropByPosNegLabelD — MONAI pos/neg-balanced patch sampling semantics.

Replicates monai.transforms.RandCropByPosNegLabeld behavior
(map_binary_to_indices / generate_pos_neg_label_crop_centers /
correct_crop_centers) on synthetic volumes; the reference resolves this
name through monai.transforms (`unet3d/datasets/segmentation.py:72-75`).
"""
import numpy as np
import pytest

from unet3d_tpu.data.transforms import (RandCropByPosNegLabelD,
                                        build_transform)


def _vol(spatial=(12, 10, 14), fg_box=((4, 7), (3, 6), (5, 9))):
    rng = np.random.RandomState(0)
    img = rng.rand(2, *spatial).astype(np.float32) + 0.5  # all > threshold 0
    lbl = np.zeros((1, *spatial), np.float32)
    (d0, d1), (h0, h1), (w0, w1) = fg_box
    lbl[0, d0:d1, h0:h1, w0:w1] = 1.0
    return img, lbl


def test_pos_only_centers_land_on_foreground():
    img, lbl = _vol()
    t = RandCropByPosNegLabelD(spatial_size=(4, 4, 4), pos=1.0, neg=0.0,
                               num_samples=8)
    rng = np.random.RandomState(1)
    for im, lb in t.samples(rng, img, lbl):
        assert np.asarray(im).shape == (2, 4, 4, 4)
        # a pos crop centered on a fg voxel must contain foreground
        assert np.asarray(lb).sum() > 0


def test_neg_only_centers_land_on_background():
    img, lbl = _vol()
    t = RandCropByPosNegLabelD(spatial_size=(2, 2, 2), pos=0.0, neg=1.0,
                               num_samples=8)
    rng = np.random.RandomState(2)
    for im, lb in t.samples(rng, img, lbl):
        # the CENTER voxel of a neg crop is background; with a 2^3 roi the
        # center voxel (start + size//2) is inside the crop
        arr = np.asarray(lb)
        assert arr[0, 1, 1, 1] == 0.0


def test_multichannel_label_drops_background_channel():
    """MONAI map_binary_to_indices: one-hot labels drop channel 0."""
    img, _ = _vol()
    lbl = np.zeros((2, 12, 10, 14), np.float32)
    lbl[0] = 1.0  # "background" channel everywhere
    lbl[1, 6, 5, 7] = 1.0  # single true-foreground voxel
    t = RandCropByPosNegLabelD(spatial_size=(4, 4, 4), pos=1.0, neg=0.0,
                               num_samples=4)
    rng = np.random.RandomState(3)
    for im, lb in t.samples(rng, img, lbl):
        # every pos center must be THE channel-1 voxel -> crop contains it
        assert np.asarray(lb)[1].sum() == 1.0


def test_empty_foreground_falls_back_to_background_with_warning():
    img, lbl = _vol()
    lbl[:] = 0.0
    t = RandCropByPosNegLabelD(spatial_size=(4, 4, 4), pos=1.0, neg=1.0,
                               num_samples=2)
    with pytest.warns(UserWarning, match="unable to generate class balanced"):
        pairs = t.samples(np.random.RandomState(4), img, lbl)
    assert len(pairs) == 2


def test_image_threshold_restricts_background():
    spatial = (8, 8, 8)
    img = np.zeros((1, *spatial), np.float32)
    img[0, :, :, 4:] = 2.0  # only the right half is "inside" the image
    lbl = np.zeros((1, *spatial), np.float32)
    lbl[0, 4, 4, 6] = 1.0
    t = RandCropByPosNegLabelD(spatial_size=(2, 2, 2), pos=0.0, neg=1.0,
                               num_samples=16, image_key="image",
                               image_threshold=0.5)
    rng = np.random.RandomState(5)
    for im, lb in t.samples(rng, img, lbl):
        # neg centers restricted to image>0.5 & ~fg -> center voxel value 2.0
        assert np.asarray(im)[0, 1, 1, 1] == 2.0


def test_roi_larger_than_volume_raises_unless_allow_smaller():
    img, lbl = _vol(spatial=(6, 6, 6), fg_box=((2, 4), (2, 4), (2, 4)))
    t = RandCropByPosNegLabelD(spatial_size=(8, 4, 4))
    with pytest.raises(ValueError, match="larger than the image size"):
        t.samples(np.random.RandomState(6), img, lbl)
    t2 = RandCropByPosNegLabelD(spatial_size=(8, 4, 4), allow_smaller=True)
    (im, lb), = t2.samples(np.random.RandomState(6), img, lbl)
    assert np.asarray(im).shape == (2, 6, 4, 4)  # clamped ROI


def test_nonpositive_spatial_size_keeps_full_extent():
    img, lbl = _vol()
    t = RandCropByPosNegLabelD(spatial_size=(4, -1, 4))
    (im, lb), = t.samples(np.random.RandomState(7), img, lbl)
    assert np.asarray(im).shape == (2, 4, 10, 4)


def test_validation_and_registry():
    with pytest.raises(ValueError):
        RandCropByPosNegLabelD(spatial_size=4, pos=-1.0)
    with pytest.raises(ValueError):
        RandCropByPosNegLabelD(spatial_size=4, pos=0.0, neg=0.0)
    with pytest.raises(ValueError):
        RandCropByPosNegLabelD(spatial_size=4, num_samples=0)
    t = build_transform({"name": "RandCropByPosNegLabeld", "spatial_size": 4,
                         "num_samples": 2})
    assert t.num_samples == 2
    img, lbl = _vol()
    with pytest.raises(ValueError, match="label"):
        t.samples(np.random.RandomState(0), img, None)


def test_dataset_fans_pos_neg_crops_like_samples_transform():
    """The dataset maps the rest of the pipeline over the fanned crops and
    stacks to (S, C, D, H, W) for collate_flatten."""
    import tempfile
    from pathlib import Path

    from unet3d_tpu.data.dataset import SegmentationDataset
    from unet3d_tpu.data.nifti import save

    with tempfile.TemporaryDirectory() as td:
        rng = np.random.RandomState(0)
        img = rng.rand(12, 12, 12).astype(np.float32)
        lbl = np.zeros((12, 12, 12), np.float32)
        lbl[4:8, 4:8, 4:8] = 1.0
        ip, lp = str(Path(td) / "i.nii.gz"), str(Path(td) / "l.nii.gz")
        save(ip, img, np.eye(4))
        save(lp, lbl, np.eye(4))
        ds = SegmentationDataset(
            filenames=[{"image": [ip], "label": lp}], labels=[1],
            spatial_augmentations=[
                {"name": "RandCropByPosNegLabelD", "spatial_size": [6, 6, 6],
                 "pos": 1.0, "neg": 1.0, "num_samples": 3}])
        assert ds.multi_sample
        item = ds[0]
        assert item["image"].shape == (3, 1, 6, 6, 6)
        assert item["label"].shape == (3, 1, 6, 6, 6)


def test_rand_simulate_low_resolution_matches_torch_interpolate():
    """MONAI RandSimulateLowResolutiond = F.interpolate nearest down +
    trilinear(align_corners=False) up at zoom ~ U(zoom_range)."""
    import torch

    from unet3d_tpu.data.transforms import RandSimulateLowResolutionD

    rng_img = np.random.RandomState(0)
    vol = rng_img.rand(2, 10, 12, 9).astype(np.float32)
    zoom = 0.6
    t = RandSimulateLowResolutionD(prob=1.0, zoom_range=(zoom, zoom))
    out, _ = t(np.random.RandomState(1), vol, None)

    x = torch.from_numpy(vol)[None]
    target = [int(np.round(s * zoom)) for s in vol.shape[1:]]
    down = torch.nn.functional.interpolate(x, size=target, mode="nearest")
    up = torch.nn.functional.interpolate(down, size=list(vol.shape[1:]),
                                         mode="trilinear",
                                         align_corners=False)
    np.testing.assert_allclose(np.asarray(out), up[0].numpy(),
                               rtol=2e-5, atol=2e-6)


def test_rand_simulate_low_resolution_identity_at_zoom_one():
    from unet3d_tpu.data.transforms import RandSimulateLowResolutionD
    vol = np.random.RandomState(2).rand(1, 8, 8, 8).astype(np.float32)
    t = RandSimulateLowResolutionD(prob=1.0, zoom_range=(1.0, 1.0))
    out, _ = t(np.random.RandomState(3), vol, None)
    np.testing.assert_allclose(np.asarray(out), vol, rtol=1e-6, atol=1e-6)
