"""RandCropByLabelClassesD / RandWeightedCropD — MONAI sampling semantics.

Pins both transforms against independent in-test numpy replicas of MONAI's
algorithms (map_classes_to_indices / generate_label_classes_crop_centers /
weighted_patch_samples / SpatialCrop) driven by the same RandomState, so the
crops must agree exactly. The reference resolves these names through
monai.transforms (`unet3d/datasets/segmentation.py:72-75`).
"""
import numpy as np
import pytest

from unet3d_tpu.data.transforms import (RandCropByLabelClassesD,
                                        RandWeightedCropD, build_transform)


# ---------------------------------------------------------------- replicas
def _correct_crop_centers_monai(center, roi, spatial):
    valid_start = np.floor_divide(roi, 2)
    valid_end = np.subtract(np.add(spatial, 1),
                            np.divide(roi, 2)).astype(np.uint16)
    valid_end = np.maximum(valid_end, valid_start + 1)
    return [int(min(max(c, vs), ve - 1))
            for c, vs, ve in zip(center, valid_start, valid_end)]


def _label_classes_replica(rng, img, lbl, roi, ratios, num_samples,
                           num_classes=None, image_threshold=None,
                           max_per_class=None):
    """monai.transforms.utils map_classes_to_indices +
    generate_label_classes_crop_centers + SpatialCrop, verbatim."""
    spatial = lbl.shape[1:]
    channels = lbl.shape[0]
    n_cls = channels if channels > 1 else num_classes
    img_mask = (np.any(img > image_threshold, axis=0).ravel()
                if image_threshold is not None else None)
    indices = []
    for c in range(n_cls):
        mask = (lbl[c] != 0) if channels > 1 else (lbl[0] == c)
        flat = mask.ravel()
        if img_mask is not None:
            flat = flat & img_mask
        ci = np.flatnonzero(flat)
        if max_per_class and len(ci) > max_per_class and len(ci) > 1:
            sid = np.round(np.linspace(0, len(ci) - 1, max_per_class)).astype(int)
            ci = ci[sid]
        indices.append(ci)
    ratios_ = [1] * len(indices) if ratios is None else list(ratios)
    for i, arr in enumerate(indices):
        if len(arr) == 0:
            ratios_[i] = 0
    classes = rng.choice(len(ratios_), size=num_samples,
                         p=np.asarray(ratios_, float) / np.sum(ratios_))
    pairs = []
    for i in classes:
        use = indices[int(i)]
        idx = use[rng.randint(len(use))]
        center = _correct_crop_centers_monai(
            np.unravel_index(idx, spatial), roi, spatial)
        sl = tuple(slice(c - r // 2, c - r // 2 + r)
                   for c, r in zip(center, roi))
        pairs.append((img[(slice(None),) + sl], lbl[(slice(None),) + sl]))
    return pairs


def _weighted_replica(rng, img, lbl, w, spatial_size, num_samples):
    """monai.transforms.utils.weighted_patch_samples + SpatialCrop."""
    spatial = w.shape
    win = tuple(r if r > 0 else m for r, m in zip(spatial_size, spatial))
    s = tuple(slice(r // 2, m - r + r // 2) if m > r
              else slice(m // 2, m // 2 + 1) for r, m in zip(win, spatial))
    v = w[s]
    v_size = v.shape
    v = v.ravel().astype(np.float64)
    if (v < 0).any():
        v = v - v.min()
    v = np.cumsum(v)
    if not v[-1] or not np.isfinite(v[-1]) or v[-1] < 0:
        idx = rng.randint(0, len(v), size=num_samples)
    else:
        r = rng.random_sample(num_samples)
        idx = np.searchsorted(v, r * v[-1], side="right")
    diff = np.minimum(win, spatial) // 2
    pairs = []
    for flat in np.atleast_1d(idx):
        center = np.asarray(np.unravel_index(int(flat), v_size)) + diff
        start = np.maximum(center - np.floor_divide(win, 2), 0)
        sl = tuple(slice(int(st), min(int(st) + r, m))
                   for st, r, m in zip(start, win, spatial))
        pairs.append((img[(slice(None),) + sl],
                      lbl[(slice(None),) + sl]))
    return pairs


def _vols(spatial=(12, 11, 13), n_classes=3, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(2, *spatial).astype(np.float32)
    onehot = np.zeros((n_classes, *spatial), np.float32)
    labelmap = rng.randint(0, n_classes, size=spatial)
    for c in range(n_classes):
        onehot[c] = labelmap == c
    intmap = labelmap[None].astype(np.float32)
    return img, onehot, intmap


# --------------------------------------------------- RandCropByLabelClassesD
def test_label_classes_exact_vs_monai_replica_onehot():
    img, onehot, _ = _vols()
    t = RandCropByLabelClassesD(spatial_size=(4, 5, 4), ratios=[1, 2, 3],
                                num_samples=6)
    got = t.samples(np.random.RandomState(7), img, onehot)
    want = _label_classes_replica(np.random.RandomState(7), img, onehot,
                                  (4, 5, 4), [1, 2, 3], 6)
    assert len(got) == len(want) == 6
    for (gi, gl), (wi, wl) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gi), wi)
        np.testing.assert_array_equal(np.asarray(gl), wl)


def test_label_classes_exact_vs_monai_replica_intmap():
    img, _, intmap = _vols()
    t = RandCropByLabelClassesD(spatial_size=4, num_classes=3, num_samples=5)
    got = t.samples(np.random.RandomState(11), img, intmap)
    want = _label_classes_replica(np.random.RandomState(11), img, intmap,
                                  (4, 4, 4), None, 5, num_classes=3)
    for (gi, gl), (wi, wl) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gi), wi)
        np.testing.assert_array_equal(np.asarray(gl), wl)


def test_label_classes_exact_with_image_threshold_and_max_samples():
    img, onehot, _ = _vols()
    t = RandCropByLabelClassesD(spatial_size=(4, 4, 4), num_samples=4,
                                image_key="image", image_threshold=0.5,
                                max_samples_per_class=17)
    got = t.samples(np.random.RandomState(3), img, onehot)
    want = _label_classes_replica(np.random.RandomState(3), img, onehot,
                                  (4, 4, 4), None, 4, image_threshold=0.5,
                                  max_per_class=17)
    for (gi, gl), (wi, wl) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gi), wi)
        np.testing.assert_array_equal(np.asarray(gl), wl)


def test_label_classes_ratio_zero_excludes_class():
    img, onehot, _ = _vols()
    t = RandCropByLabelClassesD(spatial_size=(3, 3, 3), ratios=[0, 0, 1],
                                num_samples=12)
    for _, lb in t.samples(np.random.RandomState(4), img, onehot):
        # every crop center is a class-2 voxel; correct_crop_centers moves an
        # edge center by at most 1 voxel, so a 3^3 crop still contains it
        assert np.asarray(lb)[2].sum() > 0


def test_label_classes_background_channel_is_a_class():
    """Unlike RandCropByPosNegLabelD, channel 0 is NOT dropped."""
    img, onehot, _ = _vols()
    t = RandCropByLabelClassesD(spatial_size=(3, 3, 3), ratios=[1, 0, 0],
                                num_samples=8)
    for _, lb in t.samples(np.random.RandomState(5), img, onehot):
        assert np.asarray(lb)[0].sum() > 0


def test_label_classes_empty_class_warns_and_rebalances():
    img, onehot, _ = _vols()
    onehot[1] = 0.0  # class 1 has no voxels
    t = RandCropByLabelClassesD(spatial_size=(2, 2, 2), num_samples=6)
    with pytest.warns(UserWarning, match="no available indices of class 1"):
        pairs = t.samples(np.random.RandomState(6), img, onehot)
    assert len(pairs) == 6
    for _, lb in pairs:
        assert np.asarray(lb)[1, 1, 1, 1] == 0.0


def test_label_classes_all_empty_raises():
    img, onehot, _ = _vols()
    t = RandCropByLabelClassesD(spatial_size=2, ratios=[0, 0, 0])
    with pytest.raises(ValueError, match="No sampling location"):
        t.samples(np.random.RandomState(0), img, onehot)
    onehot[:] = 0.0
    t2 = RandCropByLabelClassesD(spatial_size=2)
    with pytest.warns(UserWarning):
        with pytest.raises(ValueError, match="No sampling location"):
            t2.samples(np.random.RandomState(0), img, onehot)


def test_label_classes_validation_and_registry():
    with pytest.raises(ValueError, match="negative"):
        RandCropByLabelClassesD(spatial_size=4, ratios=[1, -1])
    with pytest.raises(ValueError, match="num_samples"):
        RandCropByLabelClassesD(spatial_size=4, num_samples=0)
    img, _, intmap = _vols()
    t = RandCropByLabelClassesD(spatial_size=4)
    with pytest.raises(ValueError, match="num_classes"):
        t.samples(np.random.RandomState(0), img, intmap)
    with pytest.raises(ValueError, match="must match the number"):
        RandCropByLabelClassesD(spatial_size=4, ratios=[1, 1], num_classes=3
                                ).samples(np.random.RandomState(0), img, intmap)
    t = build_transform({"name": "RandCropByLabelClassesd", "spatial_size": 4,
                         "num_classes": 3, "num_samples": 2})
    assert t.num_samples == 2


def test_label_classes_roi_guards():
    img, onehot, _ = _vols(spatial=(6, 6, 6))
    with pytest.raises(ValueError, match="larger than the image size"):
        RandCropByLabelClassesD(spatial_size=(8, 4, 4)).samples(
            np.random.RandomState(0), img, onehot)
    (im, _), = RandCropByLabelClassesD(
        spatial_size=(8, 4, 4), allow_smaller=True).samples(
        np.random.RandomState(0), img, onehot)
    assert np.asarray(im).shape == (2, 6, 4, 4)
    (im, _), = RandCropByLabelClassesD(spatial_size=(4, -1, 4)).samples(
        np.random.RandomState(0), img, onehot)
    assert np.asarray(im).shape == (2, 4, 6, 4)


# ------------------------------------------------------- RandWeightedCropD
def test_weighted_crop_exact_vs_monai_replica_label_weight():
    img, onehot, _ = _vols()
    t = RandWeightedCropD(spatial_size=(4, 5, 4), w_key="label",
                          num_samples=6)
    got = t.samples(np.random.RandomState(9), img, onehot)
    want = _weighted_replica(np.random.RandomState(9), img, onehot,
                             onehot[0].astype(np.float64), (4, 5, 4), 6)
    for (gi, gl), (wi, wl) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gi), wi)
        np.testing.assert_array_equal(np.asarray(gl), wl)


def test_weighted_crop_exact_vs_monai_replica_image_weight():
    img, onehot, _ = _vols()
    t = RandWeightedCropD(spatial_size=4, w_key="image", num_samples=3)
    got = t.samples(np.random.RandomState(13), img, onehot)
    want = _weighted_replica(np.random.RandomState(13), img, onehot,
                             img[0].astype(np.float64), (4, 4, 4), 3)
    for (gi, gl), (wi, wl) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gi), wi)
        np.testing.assert_array_equal(np.asarray(gl), wl)


def test_weighted_crop_point_mass_centers_on_that_voxel():
    spatial = (10, 10, 10)
    img = np.arange(np.prod(spatial), dtype=np.float32).reshape(1, *spatial)
    lbl = np.zeros((1, *spatial), np.float32)
    lbl[0, 6, 5, 4] = 1.0  # interior of the valid region for a 4^3 window
    t = RandWeightedCropD(spatial_size=(4, 4, 4), w_key="label",
                          num_samples=5)
    for im, lb in t.samples(np.random.RandomState(1), img, lbl):
        assert np.asarray(lb).sum() == 1.0
        # center voxel of the crop is the weighted voxel
        assert np.asarray(lb)[0, 2, 2, 2] == 1.0


def test_weighted_crop_zero_weight_uniform_fallback_matches_replica():
    img, onehot, _ = _vols()
    zero = np.zeros_like(onehot)
    t = RandWeightedCropD(spatial_size=(4, 4, 4), w_key="label",
                          num_samples=4)
    got = t.samples(np.random.RandomState(2), img, zero)
    want = _weighted_replica(np.random.RandomState(2), img, zero,
                             zero[0].astype(np.float64), (4, 4, 4), 4)
    for (gi, _), (wi, _) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gi), wi)


def test_weighted_crop_negative_weights_shifted_matches_replica():
    img, onehot, _ = _vols()
    w = onehot.copy()
    w[0] -= 0.75  # negative weights force the min-shift path
    t = RandWeightedCropD(spatial_size=(4, 4, 4), w_key="label",
                          num_samples=4)
    got = t.samples(np.random.RandomState(8), img, w)
    want = _weighted_replica(np.random.RandomState(8), img, w,
                             w[0].astype(np.float64), (4, 4, 4), 4)
    for (gi, _), (wi, _) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gi), wi)


def test_weighted_crop_window_larger_than_extent_yields_full_extent():
    """MONAI does not pad: dims with m <= win return the full extent."""
    img, onehot, _ = _vols(spatial=(6, 8, 6))
    t = RandWeightedCropD(spatial_size=(10, 4, -1), w_key="label",
                          num_samples=2)
    for im, lb in t.samples(np.random.RandomState(3), img, onehot):
        assert np.asarray(im).shape == (2, 6, 4, 6)


def test_weighted_crop_validation():
    with pytest.raises(ValueError, match="w_key"):
        RandWeightedCropD(spatial_size=4, w_key="weight")
    with pytest.raises(ValueError, match="num_samples"):
        RandWeightedCropD(spatial_size=4, num_samples=0)
    img, _, _ = _vols()
    t = RandWeightedCropD(spatial_size=4, w_key="label")
    with pytest.raises(ValueError, match="not present"):
        t.samples(np.random.RandomState(0), img, None)
    t2 = build_transform({"name": "RandWeightedCropd", "spatial_size": 4,
                          "w_key": "image", "num_samples": 3})
    assert t2.num_samples == 3


def test_dataset_fans_label_classes_crops():
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
                {"name": "RandCropByLabelClassesD", "spatial_size": [6, 6, 6],
                 "num_classes": 2, "num_samples": 3}])
        assert ds.multi_sample
        item = ds[0]
        assert item["image"].shape == (3, 1, 6, 6, 6)
        assert item["label"].shape == (3, 1, 6, 6, 6)
