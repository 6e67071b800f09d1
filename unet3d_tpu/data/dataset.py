"""Segmentation dataset: the full per-sample transform pipeline.

TPU-native equivalent of `unet3d/datasets/segmentation.py:12-147`. Pipeline order
is identical to the reference's lazy MONAI Compose:

    load (multi-file channel concat) -> [orientation] -> one-hot labels ->
    [crop foreground] -> shape stage (random-crop | resample-resize |
    pad-or-crop) -> spatial augmentations -> normalization -> intensity augs

The deterministic prefix (through the non-random shape stage) is cacheable;
``SegmentationDatasetPersistent`` stores it as npz keyed by content+config hash —
the equivalent of MONAI ``PersistentDataset`` disk caching
(`segmentation.py:125-147`), which caches up to the first random transform.

Random stages draw parameters on the host from a per-sample RandomState; voxel
math executes as jitted JAX ops.
"""
from __future__ import annotations

import hashlib
import json
import logging
import os
import warnings
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


from unet3d_tpu.data.io import load_image
from unet3d_tpu.data.transforms import RandSpatialCropD, build_transform
from unet3d_tpu.ops import crop as crop_ops
from unet3d_tpu.ops import normalize as normalize_ops
from unet3d_tpu.ops.affine import resize_affine
from unet3d_tpu.ops.one_hot import label_map_to_one_hot
from unet3d_tpu.ops.resample import resize_bucketed
from unet3d_tpu.utils.device import data_device_scope

_NORMALIZATION_ALIASES = {
    "zero_mean": "normalize_intensity",
    "NormalizeIntensityD": "normalize_intensity",
    "NormalizeIntensityd": "normalize_intensity",
    "NormalizeIntensity": "normalize_intensity",
    # the reference resolves ANY monai.transforms name here
    # (`unet3d/datasets/segmentation.py:80-87`); these are the intensity
    # normalizers that appear in MONAI-style configs
    "ScaleIntensityD": "scale_intensity",
    "ScaleIntensityd": "scale_intensity",
    "ScaleIntensity": "scale_intensity",
    "ScaleIntensityRangeD": "scale_intensity_range",
    "ScaleIntensityRanged": "scale_intensity_range",
    "ScaleIntensityRange": "scale_intensity_range",
    "ScaleIntensityRangePercentilesD": "scale_intensity_range_percentiles",
    "ScaleIntensityRangePercentilesd": "scale_intensity_range_percentiles",
    "ScaleIntensityRangePercentiles": "scale_intensity_range_percentiles",
    "ThresholdIntensityD": "threshold_intensity",
    "ThresholdIntensityd": "threshold_intensity",
    "ThresholdIntensity": "threshold_intensity",
    "ShiftIntensityD": "shift_intensity",
    "ShiftIntensityd": "shift_intensity",
    "ShiftIntensity": "shift_intensity",
}


def _resolve_normalization(name: str):
    fn_name = _NORMALIZATION_ALIASES.get(name, name)
    if hasattr(normalize_ops, fn_name):
        return getattr(normalize_ops, fn_name)
    raise ValueError(f"{name} normalization method not yet implemented")


def apply_normalization(image, normalization, normalization_kwargs):
    """One name or a list of names, with per-name kwargs when listed.

    Parity: `unet3d/datasets/segmentation.py:77-87` + `doc/Normalization.md`.
    """
    if normalization is None:
        return image
    kwargs = normalization_kwargs or {}
    if isinstance(normalization, str):
        return _resolve_normalization(normalization)(image, **kwargs)
    for name in normalization:
        image = _resolve_normalization(name)(image, **kwargs.get(name, {}))
    return image


def _make_jitted_normalizer(normalization, normalization_kwargs):
    """One jit-wrapped callable per dataset instance for the normalization
    chain. The chain is pure jnp (ops/normalize.py module contract); run
    eagerly it dispatches each reduction as its own op — measured 72-88 ms
    per 4x128^3 sample on the CPU backend vs 38 ms for the fused jitted form
    (round-4 host-path profile). jax.jit's signature cache makes repeat
    samples free to trace; names/kwargs are closed over (static per dataset).
    """
    if normalization is None:
        return None
    import jax

    return jax.jit(lambda image: apply_normalization(
        image, normalization, normalization_kwargs))


class SegmentationDataset:
    """Parity: `unet3d/datasets/segmentation.py:97-122`."""

    def __init__(self, filenames: Sequence[Dict[str, Any]], labels=None,
                 inference: Any = "auto", desired_shape: Optional[Sequence[int]] = None,
                 normalization: Any = "zero_mean", normalization_kwargs: Optional[dict] = None,
                 crop_foreground: bool = False, foreground_percentile: float = 0.1,
                 random_crop: bool = False, resample: bool = False,
                 intensity_augmentations: Optional[List[dict]] = None,
                 spatial_augmentations: Optional[List[dict]] = None,
                 orientation: Optional[str] = None, reader=None, verbose: bool = False,
                 base_seed: int = 0):
        del reader  # API parity; the framework owns its NIfTI reader
        self.filenames = list(filenames)
        if inference == "auto":
            inference = "label" not in self.filenames[0]
        self.inference = bool(inference)
        if not self.inference and labels is None:
            raise ValueError("Must set 'labels' for segmentation dataset when not "
                             "in inference mode.")
        self.labels = labels
        self.desired_shape = tuple(desired_shape) if desired_shape else None
        self.normalization = normalization
        self.normalization_kwargs = normalization_kwargs
        self.crop_foreground = crop_foreground
        self.foreground_percentile = foreground_percentile
        self.random_crop = random_crop
        self.resample = resample
        self.orientation = orientation
        self.verbose = verbose
        self.base_seed = base_seed
        self.epoch = 0
        self.spatial_transforms = [build_transform(s) for s in (spatial_augmentations or [])]
        self.intensity_transforms = [build_transform(s) for s in (intensity_augmentations or [])]
        self._normalizer = _make_jitted_normalizer(normalization,
                                                   normalization_kwargs)
        if self.random_crop and self.desired_shape:
            self.random_cropper = RandSpatialCropD(roi_size=self.desired_shape)
        else:
            self.random_cropper = None

    def __len__(self) -> int:
        return len(self.filenames)

    def set_epoch(self, epoch: int) -> None:
        """Advance the per-epoch augmentation stream (explicit-seed analog of
        torch's per-worker reseeding)."""
        self.epoch = epoch

    # ------------------------------------------------------------------ prefix
    def _deterministic_prefix(self, item: Dict[str, Any]) -> Dict[str, Any]:
        """load -> orient -> one-hot -> crop-foreground -> non-random shape stage."""
        image = load_image(item["image"], reorder=bool(self.orientation),
                           axcodes=self.orientation or "RAS", dtype=np.float32)
        label_data = None
        if not self.inference and "label" in item:
            label_vol = load_image(item["label"], reorder=bool(self.orientation),
                                   axcodes=self.orientation or "RAS")
            label_data = np.asarray(label_map_to_one_hot(
                np.asarray(label_vol.data), labels=self.labels), dtype=np.float32)
        data = np.asarray(image.data, dtype=np.float32)
        affine = image.affine

        if self.crop_foreground:
            data, affine, label_data, _ = crop_ops.crop_foreground(
                data, affine, label=label_data,
                foreground_percentile=self.foreground_percentile, margin=1)

        if self.desired_shape and not self.random_crop:
            if self.resample:
                new_affine = resize_affine(affine, data.shape[-3:], self.desired_shape)
                # bucketed resize: per-case crop shapes would otherwise force one
                # XLA compile per case (static-shapes strategy, SURVEY.md §7)
                true_shape = data.shape[-3:]
                data = np.asarray(resize_bucketed(data, true_shape,
                                                  self.desired_shape,
                                                  mode="trilinear"))
                if label_data is not None:
                    label_data = np.asarray(resize_bucketed(
                        label_data, true_shape, self.desired_shape, mode="nearest"))
                affine = new_affine
            else:
                data, affine = crop_ops.pad_or_crop(data, self.desired_shape, affine=affine)
                if label_data is not None:
                    label_data = crop_ops.pad_or_crop(label_data, self.desired_shape)

        out = {"image": data, "affine": affine,
               "source_filename": item["image"]}
        if label_data is not None:
            out["label"] = label_data
        return out

    @property
    def multi_sample(self) -> bool:
        """True when a transform emits multiple patches per input sample
        (RandSpatialCropSamplesD) — samples are then (S, C, D, H, W) and the
        loader should collate with ``collate_flatten``."""
        return any(getattr(t, "num_samples", 1) > 1 for t in self.spatial_transforms)

    # ------------------------------------------------------------------ random
    def _random_stages(self, sample: Dict[str, Any], index: int) -> Dict[str, Any]:
        rng = np.random.RandomState(
            (self.base_seed * 1_000_003 + self.epoch * 10_007 + index) % (2 ** 31))
        image = sample["image"]
        label = sample.get("label")
        if self.random_cropper is not None:
            image, label = self.random_cropper(rng, image, label)
        # multi-sample transforms fan one input into several patches; the rest
        # of the pipeline maps over the list (MONAI Compose list semantics)
        pairs = [(image, label)]
        for t in self.spatial_transforms:
            if getattr(t, "num_samples", 1) > 1:
                fanned = []
                for im, lb in pairs:
                    fanned.extend(t.samples(rng, im, lb))
                pairs = fanned
            else:
                pairs = [t(rng, im, lb) for im, lb in pairs]
        images, labels = [], []
        for im, lb in pairs:
            if self._normalizer is not None:
                im = self._normalizer(im)
            for t in self.intensity_transforms:
                im, _ = t(rng, im, lb)
            images.append(np.asarray(im, dtype=np.float32))
            labels.append(None if lb is None else np.asarray(lb, dtype=np.float32))
        if len(images) == 1:
            image_out, label_out = images[0], labels[0]
        else:  # (S, C, D, H, W): collate_flatten's input shape
            image_out = np.stack(images)
            label_out = None if labels[0] is None else np.stack(labels)
        out = {"image": image_out, "affine": sample["affine"],
               "source_filename": sample["source_filename"]}
        if label_out is not None:
            out["label"] = label_out
        return out

    def __getitem__(self, index: int) -> Dict[str, Any]:
        # preprocessing math runs on the data device (CPU by default: in
        # tunneled environments host<->accelerator bandwidth dwarfs compute)
        with data_device_scope():
            sample = self._deterministic_prefix(self.filenames[index])
            return self._random_stages(sample, index)


class SegmentationDatasetPersistent(SegmentationDataset):
    """Disk-cached deterministic prefix (parity: `segmentation.py:125-147`)."""

    def __init__(self, filenames, cache_dir: str, **kwargs):
        super().__init__(filenames, **kwargs)
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    @staticmethod
    def _file_signatures(item: Dict[str, Any]):
        """(path, size, mtime_ns) for every input file, so regenerating a
        source NIfTI in place invalidates its cache entry."""
        sigs = []
        stack = [item]
        while stack:
            node = stack.pop()
            if isinstance(node, dict):
                stack.extend(node.values())
            elif isinstance(node, (list, tuple)):
                stack.extend(node)
            elif isinstance(node, str) and os.path.exists(node):
                st = os.stat(node)
                sigs.append((node, st.st_size, st.st_mtime_ns))
        return sorted(sigs)

    def _cache_key(self, item: Dict[str, Any]) -> str:
        spec = {"item": item, "files": self._file_signatures(item),
                "labels": self.labels,
                "desired_shape": self.desired_shape, "crop": self.crop_foreground,
                "fg_pct": self.foreground_percentile, "random_crop": self.random_crop,
                "resample": self.resample, "orientation": self.orientation,
                "inference": self.inference}
        return hashlib.sha1(json.dumps(spec, sort_keys=True, default=str).encode()).hexdigest()

    def _deterministic_prefix(self, item: Dict[str, Any]) -> Dict[str, Any]:
        # Cache format v2: one raw .npy per volume + a .meta.json commit
        # marker, read back with mmap. The v1 single-.npz form paid a zipfile
        # + crc32 + buffered-copy tax of ~0.10 s/sample warm (round-4 host
        # profile); mmap'd .npy loads are page-cache reads, and random-crop
        # consumers touch only the pages they slice. Legacy .npz entries stay
        # readable so existing caches remain valid.
        key = os.path.join(self.cache_dir, self._cache_key(item))
        meta_path = key + ".meta.json"
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    meta = json.load(f)
                out = {"image": np.load(key + ".image.npy", mmap_mode="r"),
                       "affine": np.asarray(meta["affine"], dtype=np.float64),
                       "source_filename": meta["source_filename"]}
                if meta["has_label"]:
                    out["label"] = np.load(key + ".label.npy", mmap_mode="r")
                return out
            except Exception as error:  # corrupt cache entry: recompute
                logging.warning("Ignoring corrupt cache entry %s (%s)",
                                meta_path, error)
        legacy = key + ".npz"
        if os.path.exists(legacy):
            try:
                with np.load(legacy, allow_pickle=True) as data:
                    out = {"image": data["image"], "affine": data["affine"],
                           "source_filename": data["source_filename"].tolist()}
                    if "label" in data.files:
                        out["label"] = data["label"]
                    return out
            except Exception as error:  # corrupt cache entry: recompute
                logging.warning("Ignoring corrupt cache entry %s (%s)",
                                legacy, error)
        out = super()._deterministic_prefix(item)
        pid = os.getpid()
        for name in ("image", "label"):
            if name in out:
                tmp = f"{key}.{name}.tmp{pid}.npy"
                np.save(tmp, np.asarray(out[name]))
                os.replace(tmp, f"{key}.{name}.npy")
        meta = {"affine": np.asarray(out["affine"], dtype=np.float64).tolist(),
                "source_filename": out["source_filename"],
                "has_label": "label" in out}
        tmp = f"{meta_path}.tmp{pid}"
        with open(tmp, "w") as f:
            json.dump(meta, f)  # written last: commits the entry
        os.replace(tmp, meta_path)
        return out


DATASET_REGISTRY = {
    "SegmentationDataset": SegmentationDataset,
    "SegmentationDatasetPersistent": SegmentationDatasetPersistent,
}


def load_dataset_class(dataset_config: dict, cache_dir: Optional[str] = None):
    """Resolve config["dataset"]["name"] and inject cache_dir for Persistent
    datasets. Parity: `unet3d/utils/filenames.py:180-188`."""
    name = dataset_config.get("name", "SegmentationDatasetPersistent")
    if name not in DATASET_REGISTRY:
        raise ValueError(f"Dataset class {name} is not supported")
    cls = DATASET_REGISTRY[name]
    if name.endswith("Persistent") and cache_dir is not None:
        import functools
        return functools.partial(cls, cache_dir=cache_dir)
    return cls


def validate_filenames(filenames: Sequence[Dict[str, Any]], raise_on_missing: bool = False):
    """Silently-skip-missing default with --debug escalation.

    Parity: `unet3d/scripts/train.py:41-44,84-88` behavior contract.
    """
    valid = []
    for item in filenames:
        paths = []
        for key in ("image", "label"):
            v = item.get(key)
            if v is None:
                continue
            paths.extend(v if isinstance(v, (list, tuple)) else [v])
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            if raise_on_missing:
                raise FileNotFoundError(f"Missing data files: {missing}")
            warnings.warn(f"Skipping {item}: missing files {missing}")
            continue
        valid.append(item)
    return valid
