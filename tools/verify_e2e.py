"""End-to-end verify recipe: drive the library + CLI surface on synthetic data.

The runnable form of `.claude/skills/verify/SKILL.md` — exercises the public
API slice (NIfTI write/load, RAS reorder, one-hot hierarchy, crop/resize/
normalize, hierarchy decode, affine round-trip) and then the train + predict
CLIs on a tiny synthetic dataset. CPU-only; run as

    env PYTHONPATH= JAX_PLATFORMS=cpu python tools/verify_e2e.py

Takes ~4 minutes (first jit compiles dominate). Prints VERIFY PASSED on success.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from unet3d_tpu.data.image import Volume  # noqa: E402
from unet3d_tpu.data.io import load_image  # noqa: E402
from unet3d_tpu.data.nifti import save as nifti_save  # noqa: E402
from unet3d_tpu.ops.crop import crop_foreground  # noqa: E402
from unet3d_tpu.ops.normalize import normalize_intensity  # noqa: E402
from unet3d_tpu.ops.one_hot import (label_map_to_one_hot,  # noqa: E402
                                    one_hot_to_label_map)
from unet3d_tpu.ops.resample import resize  # noqa: E402


def library_slice(base: str) -> None:
    rng = np.random.RandomState(0)
    affine = np.diag([-1.5, -1.5, 2.0, 1.0]).astype(np.float64)
    affine[:3, 3] = [10.0, -7.0, 3.0]

    mods = []
    for m in range(2):
        fn = f"{base}/mod{m}.nii.gz"
        vol = rng.rand(20, 22, 18).astype(np.float32) * 100
        vol[:4] = 0  # background margin for crop_foreground
        nifti_save(fn, vol, affine)
        mods.append(fn)
    img = load_image(mods)
    assert img.data.shape[0] == 2, img.data.shape
    assert np.allclose(sorted(np.abs(img.spacing)), [1.5, 1.5, 2.0]), img.spacing
    assert np.all(np.diag(img.affine)[:3] > 0), "RAS reorder failed"
    print("load_image + RAS reorder OK", img.data.shape, img.spacing)

    label = np.zeros((20, 22, 18), np.int16)
    label[8:14, 8:14, 8:14] = 2
    label[10:12, 10:12, 10:12] = 1
    label[11, 11, 11] = 4
    onehot = label_map_to_one_hot(label, labels=[[2, 1, 4], [1, 4], [4]])
    assert onehot.shape == (3, 20, 22, 18)
    assert int(onehot[0].sum()) == int((label > 0).sum())
    print("one-hot hierarchy OK", onehot.shape)

    cropped, _, _, crop_slices = crop_foreground(np.asarray(img.data), img.affine)
    assert cropped.shape[1] < 20
    resized = resize(cropped, (16, 16, 16), mode="trilinear")
    resize(np.asarray(onehot, np.float32)[(slice(None),) + crop_slices],
           (16, 16, 16), mode="nearest")
    normed = normalize_intensity(resized, channel_wise=True)
    assert abs(float(np.mean(np.asarray(normed)[0]))) < 1e-3
    print("crop/resize/normalize OK", resized.shape)

    decoded = one_hot_to_label_map(onehot.astype(np.float32), labels=[2, 1, 4],
                                   label_hierarchy=True)
    assert set(np.unique(np.asarray(decoded))) <= {0, 1, 2, 4}
    out_fn = f"{base}/decoded.nii.gz"
    Volume(data=np.asarray(decoded)[None].astype(np.float32),
           affine=img.affine).to_filename(out_fn)
    re_img = load_image(out_fn, reorder=False)
    assert np.allclose(re_img.affine, img.affine, atol=1e-5)
    print("decode + NIfTI round-trip OK")


def cli_slice(base: str) -> None:
    rng = np.random.RandomState(1)
    data_dir = f"{base}/data"
    os.makedirs(data_dir, exist_ok=True)
    train_fns, test_fns = [], []
    for s in range(2):
        im = rng.rand(16, 16, 16).astype(np.float32)
        lb = np.zeros((16, 16, 16), np.int16)
        lb[4:12, 4:12, 4:12] = 1
        ifn, lfn = f"{data_dir}/sub{s}_img.nii.gz", f"{data_dir}/sub{s}_lbl.nii.gz"
        nifti_save(ifn, im, np.eye(4))
        nifti_save(lfn, lb, np.eye(4))
        train_fns.append({"image": [ifn], "label": lfn})
        test_fns.append({"image": [ifn], "label": lfn})

    cfg = {
        "model": {"name": "UNet3D", "n_features": 1, "base_width": 4,
                  "encoder_blocks": [1, 1], "n_outputs": 1},
        "optimizer": {"name": "Adam", "lr": 1e-3},
        "loss": {"name": "DiceLoss", "sigmoid": True},
        "training": {"batch_size": 1, "n_epochs": 2, "save_every_n_epochs": 1},
        "dataset": {"name": "SegmentationDatasetPersistent", "labels": [1],
                    "desired_shape": [16, 16, 16],
                    "normalization": "zero_mean"},
        "inference": {"name": "SlidingWindowInferer", "roi_size": [16, 16, 16],
                      "overlap": 0.25, "mode": "gaussian",
                      "padding_mode": "replicate"},
        "training_filenames": train_fns,
        "test_filenames": test_fns,
    }
    cfg_fn = f"{base}/cfg.json"
    with open(cfg_fn, "w") as f:
        json.dump(cfg, f)

    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out_dir = f"{base}/out"
    r = subprocess.run([sys.executable, "-m", "unet3d_tpu.scripts.train",
                        "--config_filename", cfg_fn, "--output_dir", out_dir],
                       env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    work = f"{out_dir}/cfg"  # the CLI nests under the config basename
    assert os.path.exists(f"{work}/training_log.csv"), os.listdir(out_dir)
    preds = [f for f in os.listdir(f"{work}/test") if f.endswith(".nii.gz")]
    assert preds, os.listdir(work)
    print("train CLI OK:", sorted(os.listdir(work)))

    r = subprocess.run([sys.executable, "-m", "unet3d_tpu.scripts.predict",
                        "--config_filename", cfg_fn,
                        "--output_directory", f"{work}/standalone",
                        "--model_filename", f"{work}/model.npz",
                        "--group", "test"],
                       env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    pred_dir = f"{work}/standalone/predictions"
    pred_files = [f for f in os.listdir(pred_dir) if f.endswith(".nii.gz")]
    assert len(pred_files) == 2, pred_files
    pv = load_image(os.path.join(pred_dir, pred_files[0]), reorder=False)
    assert np.asarray(pv.data).shape[-3:] == (16, 16, 16)
    print("predict CLI OK:", sorted(pred_files))


def main() -> None:
    with tempfile.TemporaryDirectory(prefix="unet3d_verify_") as base:
        library_slice(base)
        cli_slice(base)
    print("VERIFY PASSED")


if __name__ == "__main__":
    main()
