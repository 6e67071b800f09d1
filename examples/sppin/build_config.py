#!/usr/bin/env python
"""Build the SPPIN (MICCAI-23 neuroblastoma) training configuration JSON.

Schema parity with the reference's `examples/sppin/sppin_config.json`:
DynUNet 4-channel (T1-gd, T2, DWI-b0, DWI-b100) -> 1 output, 192-cubed
persistent dataset with RAS reorientation / foreground crop at the 90th
percentile / per-channel z-score, flip+rotate spatial and scale+shift
intensity augmentations, 5-fold cross-validation wrapped in a list.

Usage:
    python build_config.py --data_dir aligned/ --output sppin_config.json
(expects aligned/<PT_xx>/<session>/<PT_xx>_<modality>_<session>.nii[.gz];
the registration preprocess that produces `aligned/` is the reference's
`examples/sppin/registration.ipynb` — not ported, see README.md.)
"""
from __future__ import annotations

import argparse
import glob
import json
import os

MODALITIES = ("T1_gd", "T2", "DWI_b0", "DWI_b100")
LABEL = "NB"


def find_sessions(data_dir):
    filenames = []
    for session_dir in sorted(glob.glob(os.path.join(data_dir, "PT_*", "*"))):
        if not os.path.isdir(session_dir):
            continue
        subject = os.path.basename(os.path.dirname(session_dir))
        session = os.path.basename(session_dir)

        def fn(tag):
            stem = os.path.join(session_dir, f"{subject}_{tag}_{session}.nii")
            return stem if os.path.exists(stem) else stem + ".gz"

        entry = {"image": [fn(m) for m in MODALITIES]}
        label = fn(LABEL)
        if os.path.exists(label):
            entry["label"] = label
        filenames.append(entry)
    return filenames


def build_config(training_filenames):
    n_levels = 6
    strides = [[1, 1, 1]] + [[2, 2, 2]] * (n_levels - 1)
    return {
        "model": {
            "name": "DynUNet",
            "in_channels": 4,
            "out_channels": 1,
            "spatial_dims": 3,
            "deep_supervision": False,
            "strides": strides,
            "filters": [64, 96, 128, 192, 256, 384],
            "kernel_size": [[3, 3, 3]] * n_levels,
            "upsample_kernel_size": strides[1:],
        },
        "optimizer": {"name": "Adam", "lr": 0.001},
        "loss": {"name": "DiceLoss", "include_background": True, "sigmoid": True,
                 "batch": False},
        "cross_validation": [{"folds": 5, "seed": 25}],
        "scheduler": {"name": "ReduceLROnPlateau", "patience": 20, "factor": 0.5,
                      "min_lr": 1e-08},
        "dataset": {
            "name": "SegmentationDatasetPersistent",
            "desired_shape": [192, 192, 192],
            "labels": [1],
            "orientation": "RAS",
            "normalization": "NormalizeIntensityD",
            "normalization_kwargs": {"channel_wise": True, "nonzero": False},
            "resample": True,
            "crop_foreground": True,
            "foreground_percentile": 0.9,
            "training": {
                "spatial_augmentations": [
                    {"name": "RandFlipD", "spatial_axis": 0, "prob": 0.5},
                    {"name": "RandFlipD", "spatial_axis": 1, "prob": 0.5},
                    {"name": "RandRotateD", "prob": 0.5, "range_x": 0.2,
                     "range_y": 0.2, "range_z": 0.2},
                ],
                "intensity_augmentations": [
                    {"name": "RandScaleIntensityD", "factors": 0.1, "prob": 1.0},
                    {"name": "RandShiftIntensityD", "offsets": 0.1, "prob": 1.0},
                ],
            },
        },
        "training": {"batch_size": 2, "validation_batch_size": 2, "amp": True,
                     "early_stopping_patience": None, "n_epochs": 1000,
                     "save_every_n_epochs": None, "save_last_n_models": None,
                     "save_best": True},
        "training_filenames": training_filenames,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output", default="sppin_config.json")
    args = parser.parse_args()
    training = find_sessions(args.data_dir)
    config = build_config(training)
    with open(args.output, "w") as f:
        json.dump(config, f, indent=1)
    print(f"Wrote {args.output} ({len(training)} sessions)")


if __name__ == "__main__":
    main()
