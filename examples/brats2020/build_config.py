#!/usr/bin/env python
"""Build the BraTS-2020 training configuration JSON.

The produced config matches the reference's example schema
(`examples/brats2020/brats2020_config.json` and `doc/Configuration.md`): DynUNet
with 6 levels / filters 64..384, GeneralizedDice-style loss, ReduceLROnPlateau,
persistent dataset with 128^3 resampling, BraTS label hierarchy
(2,1,4 -> WT/TC/ET), 5-fold cross-validation.

Usage:
    python build_config.py --data_dir BraTS2020_TrainingData/... \
        --validation_dir BraTS2020_ValidationData/... --output brats2020_config.json
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def find_subjects(directory):
    filenames = []
    for subject_folder in sorted(glob.glob(os.path.join(directory, "*"))):
        if not os.path.isdir(subject_folder):
            continue
        image_filenames = sorted(glob.glob(os.path.join(subject_folder, "*.nii*")))
        label = None
        for i, fn in enumerate(image_filenames):
            if "seg" in os.path.basename(fn).lower():
                label = image_filenames.pop(i)
                break
        entry = {"image": image_filenames}
        if label is not None:
            entry["label"] = label
        filenames.append(entry)
    return filenames


def build_config(training_filenames, validation_filenames=None):
    n_levels = 6
    strides = [[1, 1, 1]] + [[2, 2, 2]] * (n_levels - 1)
    config = {
        "model": {
            "name": "DynUNet",
            "in_channels": 4,
            "out_channels": 3,
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
        "scheduler": {"name": "ReduceLROnPlateau", "patience": 10, "factor": 0.5,
                      "min_lr": 1e-08},
        "cross_validation": {"folds": 5, "seed": 25},
        "dataset": {
            "name": "SegmentationDatasetPersistent",
            "desired_shape": [128, 128, 128],
            "labels": [2, 1, 4],
            "setup_label_hierarchy": True,
            "normalization": "NormalizeIntensityD",
            "normalization_kwargs": {"channel_wise": True, "nonzero": False},
            "resample": True,
            "crop_foreground": True,
            "training": {
                "spatial_augmentations": [
                    {"name": "RandFlipD", "spatial_axis": 0, "prob": 0.5},
                    {"name": "RandFlipD", "spatial_axis": 1, "prob": 0.5},
                    {"name": "RandRotateD", "prob": 0.5, "range_x": 0.2,
                     "range_y": 0.2, "range_z": 0.2},
                ],
                "intensity_augmentations": [
                    {"name": "RandScaleIntensityD", "factors": 0.1, "prob": 0.5},
                    {"name": "RandShiftIntensityD", "offsets": 0.1, "prob": 0.5},
                    {"name": "RandGaussianNoiseD", "prob": 0.15, "std": 0.1},
                ],
            },
        },
        "training": {"batch_size": 1, "validation_batch_size": 1, "amp": True,
                     "early_stopping_patience": None, "n_epochs": 250,
                     "save_every_n_epochs": None, "save_last_n_models": None,
                     "save_best": True},
        "inference": {"name": "SlidingWindowInferer", "roi_size": [128, 128, 128],
                      "sw_batch_size": 1, "overlap": 0.5, "mode": "gaussian"},
        "training_filenames": training_filenames,
    }
    if validation_filenames:
        config["bratsvalidation_filenames"] = validation_filenames
    return config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--validation_dir")
    parser.add_argument("--output", default="brats2020_config.json")
    args = parser.parse_args()
    training = find_subjects(args.data_dir)
    validation = find_subjects(args.validation_dir) if args.validation_dir else None
    config = build_config(training, validation)
    with open(args.output, "w") as f:
        json.dump(config, f, indent=4)
    print(f"Wrote {args.output} ({len(training)} training subjects)")


if __name__ == "__main__":
    main()
