"""Filename-list construction helpers.

Parity: the active surface of `unet3d/utils/filenames.py` — template-based
subject filename generation (:16-81 style builders) and subject-id loading
(:174-177). ``load_dataset_class`` lives in `unet3d_tpu/data/dataset.py`.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Union


def generate_filenames_from_templates(
        subject_ids: Sequence[str],
        feature_templates: Union[str, Sequence[str]],
        target_templates: Union[str, Sequence[str], None] = None,
        raise_if_not_exists: bool = False) -> List[Dict[str, object]]:
    """Expand "{subject}"-style templates into the filenames-list schema.

    Example::

        generate_filenames_from_templates(
            ["sub01", "sub02"],
            feature_templates=["data/{subject}/t1.nii.gz", "data/{subject}/t2.nii.gz"],
            target_templates="data/{subject}/seg.nii.gz")
    """
    if isinstance(feature_templates, str):
        feature_templates = [feature_templates]
    filenames = []
    for subject in subject_ids:
        images = [t.format(subject=subject) for t in feature_templates]
        entry: Dict[str, object] = {
            "image": images if len(images) > 1 else images[0]}
        if target_templates is not None:
            if isinstance(target_templates, str):
                entry["label"] = target_templates.format(subject=subject)
            else:
                entry["label"] = [t.format(subject=subject) for t in target_templates]
        paths = (images if isinstance(entry["image"], list) else [entry["image"]])
        label = entry.get("label")
        if label:
            paths = paths + (label if isinstance(label, list) else [label])
        if raise_if_not_exists:
            missing = [p for p in paths if not os.path.exists(p)]
            if missing:
                raise FileNotFoundError(f"Missing files for {subject}: {missing}")
        filenames.append(entry)
    return filenames


def load_subject_ids(filename_or_list) -> List[str]:
    """Subject ids from an inline list or a text file with one id per line.

    Parity: `unet3d/utils/filenames.py:174-177`.
    """
    if isinstance(filename_or_list, (list, tuple)):
        return list(filename_or_list)
    with open(filename_or_list) as f:
        return [line.strip() for line in f if line.strip()]


def discover_subject_dirs(directory: str, image_glob: str = "*.nii*",
                          label_keyword: Optional[str] = "seg") -> List[Dict[str, object]]:
    """One entry per subject sub-directory; files matching ``label_keyword``
    become the label, the rest become (sorted) image channels — the BraTS
    directory convention (`examples/brats2020` recipe)."""
    filenames = []
    for subject_folder in sorted(glob.glob(os.path.join(directory, "*"))):
        if not os.path.isdir(subject_folder):
            continue
        files = sorted(glob.glob(os.path.join(subject_folder, image_glob)))
        label = None
        if label_keyword:
            for i, fn in enumerate(files):
                if label_keyword in os.path.basename(fn).lower():
                    label = files.pop(i)
                    break
        entry: Dict[str, object] = {"image": files if len(files) > 1 else files[0]}
        if label is not None:
            entry["label"] = label
        filenames.append(entry)
    return filenames
