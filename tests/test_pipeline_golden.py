"""Recorded-golden pipeline fixture: any resample/orientation/normalize
convention drift in the deterministic preprocessing prefix breaks this test.

The fixture (tests/fixtures/, built by tools/make_pipeline_fixture.py) is a
tiny 2-modality case with a non-RAS anisotropic affine, run through
load -> RAS reorient -> hierarchy one-hot -> crop-foreground -> resize ->
per-channel z-score — the reference's transform stack order
(`unet3d/datasets/segmentation.py:43-94`). Per-op numerics are independently
torch-golden-tested (tests/test_resample.py); this pins their composition.
"""
import os

import numpy as np

from unet3d_tpu.data.dataset import SegmentationDataset

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_pipeline_prefix_matches_recorded_golden():
    golden = np.load(os.path.join(FIXTURES, "pipeline_golden.npz"))
    ds = SegmentationDataset(
        filenames=[{"image": [os.path.join(FIXTURES, "case_t1.nii.gz"),
                              os.path.join(FIXTURES, "case_t2.nii.gz")],
                    "label": os.path.join(FIXTURES, "case_seg.nii.gz")}],
        labels=[[2, 1, 4], [1, 4], [4]],
        desired_shape=[12, 12, 12], normalization="NormalizeIntensityD",
        normalization_kwargs={"channel_wise": True},
        crop_foreground=True, resample=True, orientation="RAS")
    sample = ds[0]
    np.testing.assert_allclose(np.asarray(sample["affine"]), golden["affine"],
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(sample["image"], np.float32),
                               golden["image"], atol=1e-5, rtol=1e-5)
    # labels are one-hot after nearest resize: must be bit-identical
    np.testing.assert_array_equal(np.asarray(sample["label"], np.float32),
                                  golden["label"])


def test_pipeline_golden_properties():
    """Sanity on the recorded fixture itself (provenance guard)."""
    golden = np.load(os.path.join(FIXTURES, "pipeline_golden.npz"))
    image, label = golden["image"], golden["label"]
    assert image.shape == (2, 12, 12, 12) and label.shape == (3, 12, 12, 12)
    # per-channel z-score: mean ~0, std ~1
    np.testing.assert_allclose(image.mean(axis=(1, 2, 3)), 0.0, atol=1e-4)
    np.testing.assert_allclose(image.std(axis=(1, 2, 3)), 1.0, atol=1e-3)
    # BraTS hierarchy nesting: ET <= TC <= WT
    assert np.all(label[2] <= label[1]) and np.all(label[1] <= label[0])
    # RAS affine: positive diagonal
    assert np.all(np.diag(golden["affine"])[:3] > 0)
