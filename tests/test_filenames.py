"""Filename-builder tests (`unet3d/utils/filenames.py` active surface)."""
import os

import numpy as np
import pytest

from unet3d_tpu.data.filenames import (discover_subject_dirs,
                                       generate_filenames_from_templates,
                                       load_subject_ids)


def test_templates_multi_modality():
    out = generate_filenames_from_templates(
        ["s1", "s2"],
        feature_templates=["d/{subject}/t1.nii.gz", "d/{subject}/t2.nii.gz"],
        target_templates="d/{subject}/seg.nii.gz")
    assert len(out) == 2
    assert out[0]["image"] == ["d/s1/t1.nii.gz", "d/s1/t2.nii.gz"]
    assert out[1]["label"] == "d/s2/seg.nii.gz"


def test_templates_single_modality_scalar():
    out = generate_filenames_from_templates(["a"], "x/{subject}.nii.gz")
    assert out[0]["image"] == "x/a.nii.gz"
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
