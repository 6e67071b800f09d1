"""Filename-builder tests (`unet3d/utils/filenames.py` active surface)."""
import os

import numpy as np
import pytest

from unet3d_tpu.data.filenames import (discover_subject_dirs,
                                       generate_filenames_from_templates,
                                       load_subject_ids)


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "w").write("")
    return path


def test_templates_multi_modality(tmp_path):
    d = str(tmp_path)
    for s in ("s1", "s2"):
        for fn in (f"{s}/t1.nii.gz", f"{s}/t2.nii.gz", f"{s}/seg.nii.gz"):
            _touch(os.path.join(d, fn))
    out = generate_filenames_from_templates(
        ["s1", "s2"],
        feature_templates=["{subject}/t1.nii.gz", "{subject}/t2.nii.gz"],
        target_templates="{subject}/seg.nii.gz", directory=d)
    assert len(out) == 2
    assert out[0]["image"] == [os.path.join(d, "s1/t1.nii.gz"),
                               os.path.join(d, "s1/t2.nii.gz")]
    assert out[1]["label"] == os.path.join(d, "s2/seg.nii.gz")
    assert out[0]["subject_id"] == "s1"


def test_templates_skip_missing_subjects(tmp_path):
    # reference semantics (`filenames.py:121-127`): subjects with missing
    # files are silently skipped unless raise_if_not_exists
    d = str(tmp_path)
    _touch(os.path.join(d, "a.nii.gz"))
    out = generate_filenames_from_templates(["a", "b"], "{subject}.nii.gz",
                                            directory=d)
    assert len(out) == 1
    assert out[0]["image"] == os.path.join(d, "a.nii.gz")
    assert "label" not in out[0]


def test_templates_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="s1"):
        generate_filenames_from_templates(
            ["s1"], str(tmp_path / "{subject}.nii.gz"), raise_if_not_exists=True)


def test_load_subject_ids_from_file(tmp_path):
    fn = str(tmp_path / "ids.txt")
    open(fn, "w").write("sub01\nsub02\n\n")
    assert load_subject_ids(fn) == ["sub01", "sub02"]
    assert load_subject_ids(["a", "b"]) == ["a", "b"]


def test_discover_subject_dirs(tmp_path):
    for sub in ("sub1", "sub2"):
        d = tmp_path / sub
        d.mkdir()
        for name in ("flair.nii.gz", "t1.nii.gz", "seg.nii.gz"):
            (d / name).write_bytes(b"")
    out = discover_subject_dirs(str(tmp_path))
    assert len(out) == 2
    assert len(out[0]["image"]) == 2  # seg separated out
    assert out[0]["label"].endswith("seg.nii.gz")


def test_generate_filenames_config_dispatch_templates(tmp_path):
    from unet3d_tpu.data.filenames import generate_filenames
    d = str(tmp_path)
    for s in ("s1", "s2"):
        _touch(os.path.join(d, f"{s}_t1.nii.gz"))
        _touch(os.path.join(d, f"{s}_seg.nii.gz"))
    config = {
        "generate_filenames": "templates",
        "generate_filenames_kwargs": {
            "feature_templates": "{subject}_t1.nii.gz",
            "target_templates": "{subject}_seg.nii.gz",
        },
        "training": ["s1", "s2"],
    }
    out = generate_filenames(config, "training", directory=d)
    assert len(out) == 2
    # skip_targets drops labels (predict path)
    out = generate_filenames(config, "training", directory=d, skip_targets=True)
    assert all("label" not in row for row in out)


def test_generate_filenames_multisource(tmp_path):
    from unet3d_tpu.data.filenames import \
        generate_filenames_from_multisource_templates
    d = str(tmp_path)
    _touch(os.path.join(d, "x1.nii.gz"))
    _touch(os.path.join(d, "y1.nii.gz"))
    out = generate_filenames_from_multisource_templates(
        {"dsA": ["1"]},
        feature_templates={"dsA": "x{subject}.nii.gz"},
        target_templates={"dsA": "y{subject}.nii.gz"}, directory=d)
    assert list(out) == ["dsA"]
    assert out["dsA"][0]["label"] == os.path.join(d, "y1.nii.gz")


def test_generate_paired_filenames(tmp_path):
    from unet3d_tpu.data import nifti
    from unet3d_tpu.data.filenames import generate_paired_filenames
    d = str(tmp_path)
    os.makedirs(os.path.join(d, "sub1"))
    vol = np.random.RandomState(0).rand(4, 4, 4, 2).astype(np.float32)
    for run in ("run1", "run2"):
        nifti.save(os.path.join(d, "sub1", f"bold_{run}.nii.gz"), vol, np.eye(4))
    rows = generate_paired_filenames(
        d, ["sub1"], "training",
        keys={"all": {"pair": ["run1", "run2"]},
              "training": {"task": ["rest"]}},
        basename="bold_{pair}.nii.gz")
    # 2 sub-volumes x 2 directions
    assert len(rows) == 4
    assert rows[0]["feature_sub_volumes"] == [0]
    assert rows[1]["label"].endswith("bold_run1.nii.gz")


def test_generate_hcp_filenames(tmp_path):
    from unet3d_tpu.data.filenames import generate_hcp_filenames
    d = str(tmp_path)
    _touch(os.path.join(d, "100206", "T1w.nii.gz"))
    _touch(os.path.join(d, "100206", "100206_curvature.nii.gz"))
    rows = generate_hcp_filenames(
        d, surface_basename_template="{hemi}.white.{subject_id}.surf.gii",
        target_basenames="{}_curvature.nii.gz",
        feature_basenames="T1w.nii.gz",
        subject_ids=["100206", "999999"], hemispheres=["L", "R"])
    assert len(rows) == 1  # missing subject skipped
    assert rows[0]["surface"] == [
        os.path.join(d, "100206", "L.white.100206.surf.gii"),
        os.path.join(d, "100206", "R.white.100206.surf.gii")]
    assert rows[0]["label"].endswith("100206_curvature.nii.gz")
