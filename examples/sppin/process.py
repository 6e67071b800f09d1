#!/usr/bin/env python
"""SPPIN container entry, TPU-native end to end.

Parity with the reference's grand-challenge `process.py`
(`/root/reference/examples/sppin/process.py:192-280`), with its two external
dependencies replaced by native components:

- ANTs ``QuickRigid`` modality alignment (`process.py:219-226`) ->
  `unet3d_tpu.ops.registration.register_rigid` (multi-resolution rigid
  registration by gradient descent on the mutual-information metric, jitted).
- SimpleITK threshold + largest-connected-component (`process.py:264-274`) ->
  `ensemble_predict.py` (scipy.ndimage, fold-mean sigmoid ensemble).

The grand-challenge SimpleITK interface plumbing is replaced by plain file
arguments: pass the four modality NIfTIs; the script registers T2/DWI to T1,
runs the 5-fold ensemble, and writes the final binary segmentation in the T1
grid.

Usage:
    python process.py --t1 t1.nii.gz --t2 t2.nii.gz --b0 b0.nii.gz \
        --b100 b100.nii.gz --config sppin_config.json \
        --model_dir /model --output segmentation.nii.gz
"""
from __future__ import annotations

import argparse
import glob
import os
import tempfile

import numpy as np

from ensemble_predict import ensemble_predict
from unet3d_tpu.data.image import Volume
from unet3d_tpu.data.io import load_image
from unet3d_tpu.ops.registration import register_rigid
from unet3d_tpu.utils.config import load_json


def align_modalities(t1_filename: str, moving_filenames, out_dir: str,
                     metric: str = "mi"):
    """Register each moving modality to T1; returns the aligned file list
    (T1 first), every image on the T1 grid."""
    fixed = load_image([t1_filename])
    fixed_vol = np.asarray(fixed.data[0], dtype=np.float32)
    aligned = [t1_filename]
    for moving_filename in moving_filenames:
        moving = load_image([moving_filename])
        warped, _, info = register_rigid(
            fixed_vol, fixed.affine, np.asarray(moving.data[0]),
            moving.affine, metric=metric)
        out_filename = os.path.join(
            out_dir, "aligned_" + os.path.basename(moving_filename))
        Volume(warped[None], fixed.affine).to_filename(out_filename)
        print(f"registered {os.path.basename(moving_filename)}: "
              f"rot={np.round(info['rot'], 4)} t={np.round(info['t'], 2)}mm")
        aligned.append(out_filename)
    return aligned


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--t1", required=True)
    parser.add_argument("--t2", required=True)
    parser.add_argument("--b0", required=True)
    parser.add_argument("--b100", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--model_dir", required=True,
                        help="directory containing the fold model .npz files")
    parser.add_argument("--output", required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    namespace = parser.parse_args()

    config = load_json(namespace.config)
    model_filenames = sorted(glob.glob(os.path.join(namespace.model_dir,
                                                    "*.npz")))
    if not model_filenames:
        raise FileNotFoundError(f"no model .npz files in {namespace.model_dir}")

    with tempfile.TemporaryDirectory() as tmp:
        image_filenames = align_modalities(
            namespace.t1, [namespace.t2, namespace.b0, namespace.b100], tmp)
        ensemble_predict(config, model_filenames, image_filenames,
                         namespace.output, threshold=namespace.threshold)
    print(f"wrote {namespace.output}")


if __name__ == "__main__":
    main()
