#!/usr/bin/env python
"""SPPIN-style challenge inference: 5-fold ensemble + largest-component postproc.

Parity with the reference's grand-challenge container
(`examples/sppin/process.py:192-280`): run each cross-validation fold's model on
the case, average the sigmoid probability maps, threshold at 0.5, keep the
largest 3D connected component, and write the final mask. Connected components
are computed with scipy.ndimage.label (the reference used SimpleITK).

Usage:
    python ensemble_predict.py --config fold1.json --model_dir work_dir \
        --image t2.nii.gz [--image t1.nii.gz ...] --output segmentation.nii.gz
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np
from scipy import ndimage

from unet3d_tpu.config.factory import build_or_load_model_from_config, check_hierarchy
from unet3d_tpu.data.dataset import SegmentationDataset
from unet3d_tpu.data.image import Volume
from unet3d_tpu.data.io import load_image
from unet3d_tpu.ops.resample import resample_to_img
from unet3d_tpu.predict.volumetric import apply_activation, make_forward
from unet3d_tpu.train.optim import build_optimizer
from unet3d_tpu.train.step import create_train_state, to_ndhwc
from unet3d_tpu.utils.config import get_kwargs, load_json

import jax.numpy as jnp


def largest_connected_component(mask: np.ndarray) -> np.ndarray:
    """Keep only the largest 26-connected component (`process.py:264-274`)."""
    labeled, n = ndimage.label(mask, structure=np.ones((3, 3, 3)))
    if n == 0:
        return mask
    sizes = ndimage.sum(mask, labeled, range(1, n + 1))
    return (labeled == (int(np.argmax(sizes)) + 1)).astype(mask.dtype)


def ensemble_predict(config, model_filenames, image_filenames, output_filename,
                     threshold: float = 0.5):
    check_hierarchy(config)
    dataset = SegmentationDataset(
        filenames=[{"image": image_filenames}], inference=True,
        **{k: v for k, v in get_kwargs(config["dataset"],
                                       ["name", "training", "validation",
                                        "labels"]).items()})
    sample = dataset[0]
    x = to_ndhwc(jnp.asarray(sample["image"][None]))

    prob_sum = None
    for model_filename in model_filenames:
        model, variables = build_or_load_model_from_config(config, model_filename,
                                                           strict=True)
        state = create_train_state(variables, build_optimizer("Adam"))
        forward = make_forward(model, state)
        prob = np.asarray(apply_activation(forward(x).astype(jnp.float32), "sigmoid"))
        prob_sum = prob if prob_sum is None else prob_sum + prob
    mean_prob = prob_sum / len(model_filenames)          # (1, D, H, W, C)

    mask = (mean_prob[0, ..., 0] > threshold).astype(np.uint8)
    mask = largest_connected_component(mask)

    # resample back to the native grid of the first input image
    original = load_image(image_filenames[0] if isinstance(image_filenames, list)
                          else image_filenames, reorder=False)
    resampled = np.asarray(resample_to_img(mask[None].astype(np.float32),
                                           sample["affine"], original.affine,
                                           original.spatial_shape, mode="nearest"))
    Volume(data=resampled.astype(np.uint8),
           affine=original.affine).to_filename(output_filename)
    return output_filename


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--model_dir", required=True,
                        help="Directory containing fold*/model_best.npz checkpoints.")
    parser.add_argument("--image", action="append", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    args = parser.parse_args()
    config = load_json(args.config)
    models = sorted(glob.glob(os.path.join(args.model_dir, "fold*", "model_best.npz")))
    if not models:
        models = sorted(glob.glob(os.path.join(args.model_dir, "*.npz")))
    if not models:
        raise FileNotFoundError(f"No fold checkpoints under {args.model_dir}")
    out = ensemble_predict(config, models, args.image, args.output,
                           threshold=args.threshold)
    print(f"Wrote {out} (ensemble of {len(models)} models)")


if __name__ == "__main__":
    main()
