"""Dataset pipeline tests: stage order effects, persistent cache, determinism."""
import os

import numpy as np
import pytest

from unet3d_tpu.data import nifti
from unet3d_tpu.data.dataset import (SegmentationDataset,
                                     SegmentationDatasetPersistent,
                                     apply_normalization, load_dataset_class,
                                     validate_filenames)


@pytest.fixture(scope="module")
def subjects(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)
    fns = []
    for i in range(3):
        img = rng.rand(20, 20, 20).astype(np.float32) * 100
        seg = np.zeros((20, 20, 20), np.int16)
        seg[6:14, 6:14, 6:14] = 1
        ifn = str(root / f"img{i}.nii.gz")
        sfn = str(root / f"seg{i}.nii.gz")
        nifti.save(ifn, img, np.diag([1.0, 1.0, 2.0, 1.0]))
        nifti.save(sfn, seg, np.diag([1.0, 1.0, 2.0, 1.0]))
        fns.append({"image": ifn, "label": sfn})
    return fns


def _kwargs():
    return dict(labels=[1], desired_shape=[16, 16, 16], normalization="zero_mean",
                resample=True, crop_foreground=False)


def test_getitem_shapes_and_normalization(subjects):
    ds = SegmentationDataset(subjects, **_kwargs())
    item = ds[0]
    assert item["image"].shape == (1, 16, 16, 16)
    assert item["label"].shape == (1, 16, 16, 16)
    assert abs(item["image"].mean()) < 1e-4  # z-scored
    assert set(np.unique(item["label"])).issubset({0.0, 1.0})  # nearest resize


def test_inference_auto_detection(subjects):
    no_labels = [{"image": s["image"]} for s in subjects]
    ds = SegmentationDataset(no_labels, **{**_kwargs(), "labels": None})
    assert ds.inference
    assert "label" not in ds[0]


def test_missing_labels_raises(subjects):
    with pytest.raises(ValueError, match="labels"):
        SegmentationDataset(subjects, **{**_kwargs(), "labels": None},
                            inference=False)


def test_augmentation_deterministic_per_epoch(subjects):
    aug = [{"name": "RandFlipD", "spatial_axis": 0, "prob": 1.0}]
    ds1 = SegmentationDataset(subjects, spatial_augmentations=aug, **_kwargs())
    ds2 = SegmentationDataset(subjects, spatial_augmentations=aug, **_kwargs())
    ds1.set_epoch(3)
    ds2.set_epoch(3)
    np.testing.assert_array_equal(ds1[0]["image"], ds2[0]["image"])
    # a different epoch draws different random parameters for prob<1 transforms
    ds3 = SegmentationDataset(subjects, spatial_augmentations=[
        {"name": "RandRotateD", "prob": 0.5, "range_x": 0.3}], **_kwargs())
    ds3.set_epoch(0)
    a = ds3[0]["image"]
    ds3.set_epoch(1)
    b = ds3[0]["image"]
    assert a.shape == b.shape


def test_random_crop_stage(subjects):
    ds = SegmentationDataset(subjects, labels=[1], desired_shape=[8, 8, 8],
                             normalization=None, random_crop=True)
    item = ds[0]
    assert item["image"].shape == (1, 8, 8, 8)


def test_persistent_cache_reused(subjects, tmp_path):
    cache_dir = str(tmp_path / "cache")
    ds = SegmentationDatasetPersistent(subjects, cache_dir=cache_dir, **_kwargs())
    item1 = ds[0]
    n_entries = len(os.listdir(cache_dir))
    assert n_entries >= 1
    item2 = ds[0]  # second access served from cache
    np.testing.assert_array_equal(item1["image"], item2["image"])
    assert len(os.listdir(cache_dir)) == n_entries
    # different preprocessing kwargs -> different cache key
    ds2 = SegmentationDatasetPersistent(subjects, cache_dir=cache_dir,
                                        labels=[1], desired_shape=[8, 8, 8],
                                        normalization="zero_mean", resample=True)
    ds2[0]
    assert len(os.listdir(cache_dir)) > n_entries


def test_normalization_list_dispatch():
    x = np.random.RandomState(0).rand(1, 6, 6, 6).astype(np.float32) * 50
    out = np.asarray(apply_normalization(
        x, ["percentile_window", "zero_mean"],
        {"percentile_window": {"floor_percentile": 5, "ceiling_percentile": 95}}))
    assert abs(out.mean()) < 1e-4


def test_normalization_unknown_raises():
    with pytest.raises(ValueError, match="not yet implemented"):
        apply_normalization(np.zeros((1, 4, 4, 4)), "NoSuchNorm", None)


def test_load_dataset_class_injects_cache(tmp_path):
    cls = load_dataset_class({"name": "SegmentationDatasetPersistent"},
                             cache_dir=str(tmp_path / "c"))
    assert cls.keywords["cache_dir"].endswith("c")
    plain = load_dataset_class({"name": "SegmentationDataset"}, cache_dir="x")
    assert plain is SegmentationDataset
    with pytest.raises(ValueError):
        load_dataset_class({"name": "NoSuchDataset"})


def test_validate_filenames_skips_missing(subjects):
    bad = subjects + [{"image": "/nonexistent.nii.gz"}]
    with pytest.warns(UserWarning):
        valid = validate_filenames(bad)
    assert len(valid) == len(subjects)
    with pytest.raises(FileNotFoundError):
        validate_filenames(bad, raise_on_missing=True)


def test_multi_sample_crop_pipeline(subjects):
    """RandSpatialCropSamplesD fans each subject into patches; the loader's
    default collate_flatten folds (B, S, C, ...) to (B*S, C, ...) — the
    producer for `training_utils.py:230-240` collate parity."""
    from unet3d_tpu.data.loader import build_loader
    ds = SegmentationDataset(
        subjects, labels=[1], normalization="zero_mean",
        spatial_augmentations=[{"name": "RandSpatialCropSamplesD",
                                "roi_size": [8, 8, 8], "num_samples": 3}])
    assert ds.multi_sample
    item = ds[0]
    assert item["image"].shape == (3, 1, 8, 8, 8)
    assert item["label"].shape == (3, 1, 8, 8, 8)
    # patches are z-scored independently? No: normalization maps over patches
    loader = build_loader(ds, batch_size=2, shuffle=False)
    batch = next(iter(loader))
    assert batch["image"].shape == (6, 1, 8, 8, 8)
    assert batch["label"].shape == (6, 1, 8, 8, 8)


def test_multi_sample_with_intensity_augs(subjects):
    ds = SegmentationDataset(
        subjects, labels=[1], normalization="zero_mean",
        spatial_augmentations=[
            {"name": "RandFlipD", "prob": 1.0, "spatial_axis": 0},
            {"name": "RandSpatialCropSamplesD", "roi_size": [8, 8, 8],
             "num_samples": 2}],
        intensity_augmentations=[{"name": "RandShiftIntensityD", "prob": 1.0,
                                  "offsets": (0.5, 0.5)}])
    item = ds[1]
    assert item["image"].shape == (2, 1, 8, 8, 8)


def test_explicit_collate_name(subjects):
    from unet3d_tpu.data.loader import build_loader
    ds = SegmentationDataset(subjects, **_kwargs())
    loader = build_loader(ds, batch_size=2, collate="collate_flatten")
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 1, 16, 16, 16)  # no-op at 5D
    with pytest.raises(ValueError, match="collate"):
        build_loader(ds, collate="bogus_collate")


def test_persistent_cache_v2_layout_and_legacy_fallback(subjects, tmp_path):
    """v2 entries are raw .npy + .meta.json; v1 .npz entries stay readable."""
    cache_dir = str(tmp_path / "cache")
    ds = SegmentationDatasetPersistent(subjects, cache_dir=cache_dir, **_kwargs())
    item = ds[0]
    names = sorted(os.listdir(cache_dir))
    assert any(n.endswith(".meta.json") for n in names)
    assert any(n.endswith(".image.npy") for n in names)
    assert any(n.endswith(".label.npy") for n in names)
    assert not any(".tmp" in n for n in names)  # atomic writes

    # craft a LEGACY v1 entry for subject 1 at its exact cache key and check
    # it is served (not recomputed into v2 files)
    key = ds._cache_key(ds.filenames[1])
    fake = {"image": np.full((1, 16, 16, 16), 7.0, np.float32),
            "affine": np.eye(4),
            "label": np.zeros((1, 16, 16, 16), np.float32),
            "source_filename": np.asarray(ds.filenames[1]["image"], dtype=object)}
    np.savez(os.path.join(cache_dir, key + ".npz"), **fake)
    out = ds._deterministic_prefix(ds.filenames[1])
    np.testing.assert_array_equal(np.asarray(out["image"]), fake["image"])

    # corrupt/partial v2 entry (meta committed but array missing) -> recompute
    key0 = ds._cache_key(ds.filenames[0])
    os.remove(os.path.join(cache_dir, key0 + ".image.npy"))
    out0 = ds._deterministic_prefix(ds.filenames[0])
    assert out0["image"].shape == np.asarray(item["image"]).shape
    item_again = ds[0]
    np.testing.assert_allclose(np.asarray(item_again["image"]),
                               np.asarray(item["image"]), rtol=0, atol=0)
