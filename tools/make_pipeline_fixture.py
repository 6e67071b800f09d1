#!/usr/bin/env python
"""Generate the recorded-golden pipeline fixture under tests/fixtures/.

Writes a tiny synthetic 2-modality case (non-RAS affine to force
reorientation, anisotropic spacing to exercise resampling) plus the expected
output of SegmentationDataset's deterministic prefix
(load -> RAS reorient -> one-hot(hierarchy) -> crop-foreground -> resize ->
normalize). The expected arrays pin the stage conventions
(`/root/reference/unet3d/datasets/segmentation.py:43-94`,
`utils/resample.py:50-84`); the per-op numerics behind them are
torch-golden-tested in tests/test_resample.py and tests/test_normalize.py.

Regenerate ONLY when a convention change is intended:
    env PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_pipeline_fixture.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from unet3d_tpu.data import nifti  # noqa: E402
from unet3d_tpu.data.dataset import SegmentationDataset  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def build_case():
    rng = np.random.RandomState(42)
    shape = (18, 16, 14)
    # LPS-ish affine with anisotropic spacing and an offset
    affine = np.array([[-1.5, 0, 0, 10.0],
                       [0, -1.25, 0, -7.0],
                       [0, 0, 2.0, 3.0],
                       [0, 0, 0, 1.0]], dtype=np.float64)
    t1 = rng.rand(*shape).astype(np.float32) * 100
    t2 = rng.rand(*shape).astype(np.float32) * 50
    seg = np.zeros(shape, np.float32)
    seg[5:12, 4:11, 3:9] = 4
    seg[7:10, 6:9, 4:7] = 1
    seg[8, 7, 5] = 2
    t1[seg > 0] += 150  # make foreground crop meaningful
    t2[seg > 0] += 60
    return t1, t2, seg, affine


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    t1, t2, seg, affine = build_case()
    for name, arr in (("t1", t1), ("t2", t2), ("seg", seg)):
        nifti.save(os.path.join(FIXTURE_DIR, f"case_{name}.nii.gz"), arr, affine)

    ds = SegmentationDataset(
        filenames=[{"image": [os.path.join(FIXTURE_DIR, "case_t1.nii.gz"),
                              os.path.join(FIXTURE_DIR, "case_t2.nii.gz")],
                    "label": os.path.join(FIXTURE_DIR, "case_seg.nii.gz")}],
        labels=[[2, 1, 4], [1, 4], [4]],  # BraTS hierarchy grouping
        desired_shape=[12, 12, 12], normalization="NormalizeIntensityD",
        normalization_kwargs={"channel_wise": True},
        crop_foreground=True, resample=True, orientation="RAS")
    sample = ds[0]
    np.savez(os.path.join(FIXTURE_DIR, "pipeline_golden.npz"),
             image=np.asarray(sample["image"], np.float32),
             label=np.asarray(sample["label"], np.float32),
             affine=np.asarray(sample["affine"], np.float64))
    print("image", np.asarray(sample["image"]).shape,
          "label", np.asarray(sample["label"]).shape)
    print("wrote", FIXTURE_DIR)


if __name__ == "__main__":
    main()
