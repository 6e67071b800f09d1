"""End-to-end CLI smoke: tiny synthetic train + resume + predict + segment.

The rebuild analog of the reference's integration tests
(`test/test_predict_volumetric.py`) plus the train-CLI path they lack.
Shapes kept tiny (12^3) so CPU compiles stay fast.
"""
import json
import os

import numpy as np
import pytest

from unet3d_tpu.data import nifti


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.RandomState(0)
    train_fns, test_fns = [], []
    for i in range(3):
        img = rng.rand(12, 12, 12).astype(np.float32)
        seg = np.zeros((12, 12, 12), dtype=np.int16)
        seg[3:9, 3:9, 3:9] = 1
        img[seg > 0] += 2.0
        ifn = str(root / f"img{i}.nii.gz")
        sfn = str(root / f"seg{i}.nii.gz")
        nifti.save(ifn, img, np.eye(4))
        nifti.save(sfn, seg, np.eye(4))
        (train_fns if i < 2 else test_fns).append({"image": ifn, "label": sfn})
    config = {
        "model": {"name": "UNet3D", "n_features": 1, "base_width": 2,
                  "encoder_blocks": [1, 1], "n_outputs": 1},
        "optimizer": {"name": "Adam", "lr": 0.01},
        "loss": {"name": "DiceLoss", "include_background": True, "sigmoid": True},
        "scheduler": {"name": "StepLR", "step_size": 1, "gamma": 0.5},
        "dataset": {"name": "SegmentationDataset", "desired_shape": [12, 12, 12],
                    "labels": [1], "normalization": "zero_mean", "resample": True},
        "training": {"batch_size": 2, "validation_batch_size": 2, "n_epochs": 2,
                     "save_best": True, "test_input": 0},
        "training_filenames": train_fns,
        "validation_filenames": train_fns,
        "test_filenames": test_fns,
    }
    config_fn = str(root / "config.json")
    json.dump(config, open(config_fn, "w"))
    return {"root": root, "config_fn": config_fn, "config": config,
            "out": str(root / "out")}


def test_train_cli(workspace):
    from unet3d_tpu.scripts.train import main
    main(["--config_filename", workspace["config_fn"], "--output_dir",
          workspace["out"], "--n_examples", "0"])
    work_dir = os.path.join(workspace["out"], "config")
    assert os.path.exists(os.path.join(work_dir, "model.npz"))
    assert os.path.exists(os.path.join(work_dir, "model_best.npz"))
    log = open(os.path.join(work_dir, "training_log.csv")).read().strip().splitlines()
    assert log[0] == "epoch,loss,lr,val_loss"
    assert len(log) == 3  # 2 epochs
    # scheduler: StepLR halves lr after the first epoch
    lr_epoch2 = float(log[2].split(",")[2])
    assert lr_epoch2 == pytest.approx(0.005)
    # predictions on the test group were written
    preds = os.listdir(os.path.join(work_dir, "test"))
    assert any(p.endswith(".nii.gz") for p in preds)


def test_train_resume(workspace):
    from unet3d_tpu.scripts.train import main
    config = dict(workspace["config"])
    config["training"] = dict(config["training"], n_epochs=3)
    json.dump(config, open(workspace["config_fn"], "w"))
    main(["--config_filename", workspace["config_fn"], "--output_dir",
          workspace["out"], "--n_examples", "0"])
    work_dir = os.path.join(workspace["out"], "config")
    log = open(os.path.join(work_dir, "training_log.csv")).read().strip().splitlines()
    assert len(log) == 4  # resumed to epoch 3 without retraining 1-2
    assert [row.split(",")[0].split(".")[0] for row in log[1:]] == ["1", "2", "3"]


def test_predict_cli(workspace):
    from unet3d_tpu.config.factory import get_machine_config
    from unet3d_tpu.scripts.predict import run_inference
    import argparse
    ns = argparse.Namespace(machine_config_filename=None, nthreads=1, ngpus=1,
                            pin_memory=False)
    work_dir = os.path.join(workspace["out"], "config")
    pred_out = str(workspace["root"] / "pred")
    written = run_inference(config=json.load(open(workspace["config_fn"])),
                            output_directory=pred_out,
                            model_filename=os.path.join(work_dir, "model.npz"),
                            group="test", activation="sigmoid",
                            system_config=get_machine_config(ns))
    assert len(written) == 1
    data, _, _ = nifti.load(written[0])
    assert data.shape == (12, 12, 12)
    assert 0.0 <= data.min() and data.max() <= 1.0  # sigmoid applied


def test_segment_cli(workspace, monkeypatch):
    from unet3d_tpu.scripts import segment
    pred_fn = str(workspace["root"] / "pred" / "predictions" / "img2.nii.gz")
    out_fn = str(workspace["root"] / "labelmap.nii.gz")
    monkeypatch.setattr("sys.argv", ["segment.py", "--filenames", pred_fn,
                                     "--labels", "1", "--output_filenames", out_fn])
    segment.main()
    seg, _, _ = nifti.load(out_fn)
    assert set(np.unique(seg)).issubset({0, 1})


def test_cross_validation_setup(workspace):
    from unet3d_tpu.scripts.train import main
    config = json.load(open(workspace["config_fn"]))
    config.pop("validation_filenames")
    config["cross_validation"] = {"folds": 2, "seed": 25}
    cv_fn = str(workspace["root"] / "cv_config.json")
    json.dump(config, open(cv_fn, "w"))
    cv_out = str(workspace["root"] / "cv_out")
    main(["--config_filename", cv_fn, "--output_dir", cv_out,
          "--setup_crossval_only", "--n_examples", "0"])
    work_dir = os.path.join(cv_out, "cv_config")
    folds = sorted(f for f in os.listdir(work_dir) if f.startswith("fold"))
    assert folds == ["fold1.json", "fold2.json"]
    fold1 = json.load(open(os.path.join(work_dir, "fold1.json")))
    assert "validation_filenames" in fold1
    assert len(fold1["training_filenames"]) + len(fold1["validation_filenames"]) == 2


def test_train_with_sliding_window_inference_section(workspace):
    # config with an `inference` section: validation and prediction route
    # through the SlidingWindowInferer (reference `script_utils.py:290-293`)
    import json
    from unet3d_tpu.scripts.train import main
    config = json.load(open(workspace["config_fn"]))
    config["training"] = dict(config["training"], n_epochs=1)
    config["inference"] = {"name": "SlidingWindowInferer", "roi_size": [8, 8, 8],
                           "sw_batch_size": 2, "overlap": 0.25, "mode": "gaussian"}
    cfg_fn = str(workspace["root"] / "swi_config.json")
    json.dump(config, open(cfg_fn, "w"))
    out = str(workspace["root"] / "swi_out")
    main(["--config_filename", cfg_fn, "--output_dir", out, "--n_examples", "0"])
    work_dir = os.path.join(out, "swi_config")
    assert os.path.exists(os.path.join(work_dir, "training_log.csv"))
    preds = os.listdir(os.path.join(work_dir, "test"))
    assert any(p.endswith(".nii.gz") for p in preds)


def test_train_with_remat(workspace):
    import json
    from unet3d_tpu.scripts.train import main
    config = json.load(open(workspace["config_fn"]))
    config["training"] = dict(config["training"], n_epochs=1, remat=True)
    cfg_fn = str(workspace["root"] / "remat_config.json")
    json.dump(config, open(cfg_fn, "w"))
    out = str(workspace["root"] / "remat_out")
    main(["--config_filename", cfg_fn, "--output_dir", out, "--n_examples", "0"])
    log = open(os.path.join(out, "remat_config", "training_log.csv")).read()
    assert "epoch,loss,lr,val_loss" in log


def test_save_optimizer_resume(workspace):
    # optimizer moments persist across resume (framework extension; the
    # reference loses Adam state on restart)
    import json
    import numpy as np
    from unet3d_tpu.scripts.train import main
    config = json.load(open(workspace["config_fn"]))
    config["training"] = dict(config["training"], n_epochs=2, save_optimizer=True)
    cfg_fn = str(workspace["root"] / "opt_config.json")
    json.dump(config, open(cfg_fn, "w"))
    out = str(workspace["root"] / "opt_out")
    main(["--config_filename", cfg_fn, "--output_dir", out, "--n_examples", "0"])
    work_dir = os.path.join(out, "opt_config")
    opt_fn = os.path.join(work_dir, "model_optimizer.npz")
    assert os.path.exists(opt_fn)
    with np.load(opt_fn) as data:
        saved_leaves = {k: data[k].copy() for k in data.files}
    # the Adam moment leaves must be non-trivial (training actually ran)
    assert any(np.abs(v).sum() > 0 for v in saved_leaves.values())
    # resume 1 more epoch; must not crash and must keep saving the state
    config["training"]["n_epochs"] = 3
    json.dump(config, open(cfg_fn, "w"))
    main(["--config_filename", cfg_fn, "--output_dir", out, "--n_examples", "0"])
    log = open(os.path.join(work_dir, "training_log.csv")).read().strip().splitlines()
    assert len(log) == 4


def test_label_hierarchy_training(workspace):
    # BraTS-style: setup_label_hierarchy expands [2,1,4] -> [[2,1,4],[1,4],[4]]
    # (3 one-hot channels) and the model trains against them
    import json
    import numpy as np
    from unet3d_tpu.data import nifti as _nifti
    from unet3d_tpu.scripts.train import main
    root = workspace["root"]
    rng = np.random.RandomState(1)
    fns = []
    for i in range(2):
        img = rng.rand(12, 12, 12).astype(np.float32)
        seg = np.zeros((12, 12, 12), np.int16)
        seg[2:10, 2:10, 2:10] = 2   # whole tumor
        seg[4:8, 4:8, 4:8] = 1      # tumor core
        seg[5:7, 5:7, 5:7] = 4      # enhancing
        ifn = str(root / f"h_img{i}.nii.gz")
        sfn = str(root / f"h_seg{i}.nii.gz")
        _nifti.save(ifn, img, np.eye(4))
        _nifti.save(sfn, seg, np.eye(4))
        fns.append({"image": ifn, "label": sfn})
    config = json.load(open(workspace["config_fn"]))
    config["model"] = dict(config["model"], n_outputs=3)
    config["dataset"] = dict(config["dataset"], labels=[2, 1, 4],
                             setup_label_hierarchy=True)
    config["training"] = dict(config["training"], n_epochs=1)
    config["training_filenames"] = fns
    config["validation_filenames"] = fns
    config.pop("test_filenames", None)
    cfg_fn = str(root / "hier_config.json")
    json.dump(config, open(cfg_fn, "w"))
    out = str(root / "hier_out")
    main(["--config_filename", cfg_fn, "--output_dir", out, "--n_examples", "0"])
    log = open(os.path.join(out, "hier_config", "training_log.csv")).read()
    assert "epoch,loss,lr,val_loss" in log
    # the hierarchy flag must have been consumed (not passed to the dataset)
    import numpy as _np
    from unet3d_tpu.train.checkpoint import load_checkpoint
    ck = load_checkpoint(os.path.join(out, "hier_config", "model.npz"))
    final_kernel = ck["params"]["final_convolution"]["kernel"]
    assert final_kernel.shape[-1] == 3  # one output channel per hierarchy level


def test_train_and_predict_cli_multidevice(workspace):
    """n_gpus>1: sharded train + sharded eval + mesh predictions (CPU mesh)."""
    import sys
    from unet3d_tpu.scripts import predict as predict_cli
    from unet3d_tpu.scripts.train import main
    # own config copy: other tests rewrite the shared config.json in place
    config = json.load(open(workspace["config_fn"]))
    config["training"] = dict(config["training"], n_epochs=2)
    config_fn = str(workspace["root"] / "config_md.json")
    json.dump(config, open(config_fn, "w"))
    out = str(workspace["root"] / "out_md")
    main(["--config_filename", config_fn, "--output_dir", out,
          "--n_examples", "0", "--ngpus", "2"])
    work_dir = os.path.join(out, "config_md")
    assert os.path.exists(os.path.join(work_dir, "model.npz"))
    log = open(os.path.join(work_dir, "training_log.csv")).read().strip().splitlines()
    assert len(log) == 3  # header + 2 epochs
    # post-training inference groups ran through the space mesh
    pred_dir = os.path.join(work_dir, "test")
    assert os.path.isdir(pred_dir) and os.listdir(pred_dir)

    out_dir = os.path.join(work_dir, "md_predict")
    argv = ["predict", "--config_filename", config_fn,
            "--model_filename", os.path.join(work_dir, "model.npz"),
            "--output_directory", out_dir, "--group", "test", "--ngpus", "2"]
    old = sys.argv
    sys.argv = argv
    try:
        predict_cli.main()
    finally:
        sys.argv = old
    assert os.listdir(os.path.join(out_dir, "predictions"))


def test_nameless_inference_section_builds_no_inferer():
    """`inference: {"amp": true}` requests bf16 forwards without a sliding-window
    inferer; the factory must tolerate the missing name (regression: KeyError)."""
    from unet3d_tpu.config.factory import build_inferer_from_config

    assert build_inferer_from_config({"inference": {"amp": True}}) is None
    inferer = build_inferer_from_config(
        {"inference": {"name": "SlidingWindowInferer", "roi_size": [8, 8, 8],
                       "overlap": 0.25, "amp": True}})
    assert inferer is not None
