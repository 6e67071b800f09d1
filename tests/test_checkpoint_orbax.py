"""Orbax checkpoint backend: async directory checkpoints behind the same
save_checkpoint/load_checkpoint entry points (framework extension over the
reference's synchronous torch.save, `unet3d/train.py:85-103`; the npz default
stays reference-parity)."""
import json
import os

import numpy as np
import pytest

from unet3d_tpu.train.checkpoint import (load_checkpoint, load_into,
                                         save_checkpoint)
from unet3d_tpu.train.checkpoint_orbax import is_orbax_path, wait_for_saves


def _tree():
    return {"params": {"layer": {"kernel": np.arange(12, dtype=np.float32)
                                 .reshape(3, 4),
                                 "bias": np.zeros(4, np.float32)}},
            "batch_stats": {"bn": {"mean": np.ones(4, np.float32)}}}


def test_orbax_roundtrip_and_overwrite(tmp_path):
    fn = str(tmp_path / "model.orbax")
    tree = _tree()
    save_checkpoint(tree, fn)
    wait_for_saves()
    assert os.path.isdir(fn) and is_orbax_path(fn)
    loaded = load_checkpoint(fn)
    np.testing.assert_array_equal(loaded["params"]["layer"]["kernel"],
                                  tree["params"]["layer"]["kernel"])
    np.testing.assert_array_equal(loaded["batch_stats"]["bn"]["mean"], 1.0)
    # force-overwrite of an existing checkpoint (every epoch rewrites it)
    tree["params"]["layer"]["bias"] += 3.0
    save_checkpoint(tree, fn)
    wait_for_saves()
    np.testing.assert_array_equal(
        load_checkpoint(fn)["params"]["layer"]["bias"], 3.0)


def test_orbax_flexible_and_strict_load(tmp_path):
    fn = str(tmp_path / "model.orbax")
    save_checkpoint({"params": {"a": np.ones(3, np.float32)}}, fn)
    wait_for_saves()
    target = {"params": {"a": np.zeros(3, np.float32),
                         "b": np.full(2, 7.0, np.float32)}}
    out = load_into(target, fn, strict=False)
    np.testing.assert_array_equal(out["params"]["a"], 1.0)
    np.testing.assert_array_equal(out["params"]["b"], 7.0)
    with pytest.raises(ValueError):
        load_into(target, fn, strict=True)


@pytest.mark.slow
def test_train_cli_orbax_backend(tmp_path):
    """Full train CLI with checkpoint_backend=orbax: directory checkpoints,
    best-copy family, post-train resume reads the orbax state back."""
    from unet3d_tpu.data import nifti
    from unet3d_tpu.scripts.train import main as train_main

    rng = np.random.RandomState(3)
    fns = []
    for i in range(2):
        img = rng.rand(8, 8, 8).astype(np.float32)
        lbl = (img > 0.5).astype(np.int16)
        ifn, sfn = str(tmp_path / f"i{i}.nii.gz"), str(tmp_path / f"s{i}.nii.gz")
        nifti.save(ifn, img, np.eye(4))
        nifti.save(sfn, lbl, np.eye(4))
        fns.append({"image": ifn, "label": sfn})
    config = {
        "model": {"name": "UNet3D", "n_features": 1, "base_width": 2,
                  "encoder_blocks": [1, 1], "n_outputs": 1},
        "optimizer": {"name": "SGD", "lr": 0.01},
        "loss": {"name": "DiceLoss", "include_background": True, "sigmoid": True},
        "dataset": {"name": "SegmentationDataset", "desired_shape": [8, 8, 8],
                    "labels": [1], "normalization": "zero_mean"},
        "training": {"batch_size": 1, "n_epochs": 2, "save_best": True,
                     "checkpoint_backend": "orbax", "save_optimizer": True,
                     "test_input": 0},
        "training_filenames": fns, "validation_filenames": fns,
    }
    cfg_fn = str(tmp_path / "cfg.json")
    with open(cfg_fn, "w") as f:
        json.dump(config, f)
    out_dir = str(tmp_path / "out")
    train_main(["--config_filename", cfg_fn, "--output_dir", out_dir])
    work = os.path.join(out_dir, "cfg")
    model_dir = os.path.join(work, "model.orbax")
    assert os.path.isdir(model_dir)
    assert os.path.isdir(os.path.join(work, "model_best.orbax"))
    # the optimizer state stays in the flat keyed npz format alongside the
    # orbax model directory (never an npz-in-.orbax-named file)
    assert os.path.isfile(os.path.join(work, "model_optimizer.npz"))
    assert not os.path.exists(os.path.join(work, "model_optimizer.orbax"))
    loaded = load_checkpoint(model_dir)
    assert "params" in loaded
    # resume path: a third epoch continues from the orbax checkpoint
    config["training"]["n_epochs"] = 3
    with open(cfg_fn, "w") as f:
        json.dump(config, f)
    train_main(["--config_filename", cfg_fn, "--output_dir", out_dir])
    log = open(os.path.join(work, "training_log.csv")).read().strip().splitlines()
    assert len(log) == 4  # header + 3 epochs, resume appended not restarted


def test_is_orbax_path_ignores_generic_work_dirs(tmp_path):
    """A directory that merely CONTAINS files named 'checkpoint' or 'd' is a
    work dir, not an orbax checkpoint — it must raise the descriptive
    'not a checkpoint' error, not dispatch into orbax internals."""
    work = tmp_path / "work"
    work.mkdir()
    (work / "checkpoint").write_text("an unrelated file")
    (work / "d").mkdir()
    assert not is_orbax_path(str(work))
    with pytest.raises(ValueError, match="does not look like an orbax"):
        load_checkpoint(str(work))


def test_is_orbax_path_accepts_real_layout(tmp_path):
    """Real orbax saves (StandardCheckpointHandler/ocdbt) keep dispatching."""
    save_checkpoint(_tree(), str(tmp_path / "m.orbax"))
    wait_for_saves()
    # probe by layout, not by the .orbax naming convention
    renamed = tmp_path / "renamed_dir"
    os.rename(tmp_path / "m.orbax", renamed)
    assert is_orbax_path(str(renamed))
    loaded = load_checkpoint(str(renamed))
    np.testing.assert_array_equal(loaded["params"]["layer"]["kernel"],
                                  _tree()["params"]["layer"]["kernel"])
