"""Config-section -> object factories (the reference's script_utils layer).

Parity: `unet3d/scripts/script_utils.py:16-299` — machine config, label-hierarchy
expansion, cross-validation fold splitting, data-loader/model/criterion/optimizer/
scheduler/inferer construction from the JSON schema, and debug example dumps.
The JSON schema itself (sections model/optimizer/loss/scheduler/dataset/training/
inference/cross_validation + ``*_filenames``) is preserved bit-for-bit.
"""
from __future__ import annotations

import logging
import os
from copy import deepcopy


import numpy as np


from unet3d_tpu.data.image import Volume
from unet3d_tpu.data.loader import build_loader
from unet3d_tpu.models.registry import create_model, init_params
from unet3d_tpu.predict.sliding_window import build_inferer
from unet3d_tpu.train import checkpoint as ckpt
from unet3d_tpu.train.losses import load_criterion
from unet3d_tpu.train.optim import build_optimizer, build_scheduler
from unet3d_tpu.utils.config import dump_json, get_kwargs, in_config, load_json


def add_machine_config_to_parser(parser):
    """Parity: `script_utils.py:16-28` (flag surface kept; n_gpus maps to TPU
    device count)."""
    parser.add_argument("--machine_config_filename", required=False,
                        help="JSON configuration file containing the number of "
                             "devices and threads available for model training.")
    parser.add_argument("--nthreads", default=1, type=int,
                        help="Number of data-pipeline threads (default = 1).")
    parser.add_argument("--ngpus", default=1, type=int,
                        help="Number of accelerator devices to use for training. "
                             "Ignored if machine_config_filename is set.")
    parser.add_argument("--pin_memory", action="store_true", default=False)
    parser.add_argument("--mesh", required=False,
                        help="Device-mesh layout for multi-device runs, e.g. "
                             "'data2,space4' (batch data-parallel x D-axis "
                             "spatial partitioning). Overrides the machine "
                             "config's 'mesh' key; default is all devices on "
                             "the data axis. 'space' lets volumes larger than "
                             "one chip's HBM train/predict across chips.")


def get_machine_config(namespace):
    """Parity: `script_utils.py:41-48`; framework extension: a ``mesh`` key
    (``{"data": 2, "space": 4}`` in the machine config JSON, or the ``--mesh``
    CLI flag, which wins) selects the device-mesh factorization."""
    if getattr(namespace, "machine_config_filename", None):
        print("MP Config: ", namespace.machine_config_filename)
        config = load_json(namespace.machine_config_filename)
    else:
        config = {"n_workers": namespace.nthreads,
                  "n_gpus": namespace.ngpus,
                  "pin_memory": namespace.pin_memory}
    if getattr(namespace, "mesh", None):
        config["mesh"] = namespace.mesh
    return config


def check_hierarchy(config):
    """labels + setup_label_hierarchy -> nested suffix groups.

    Parity: `script_utils.py:232-246` (e.g. [2, 1, 4] -> [[2,1,4],[1,4],[4]]).
    """
    label_hierarchy = False
    if in_config("labels", config["dataset"]) and in_config("setup_label_hierarchy",
                                                            config["dataset"]):
        config["dataset"].pop("setup_label_hierarchy")
        labels = config["dataset"].pop("labels")
        new_labels = []
        while len(labels):
            new_labels.append(labels)
            labels = labels[1:]
        config["dataset"]["labels"] = new_labels
        label_hierarchy = True
    if "setup_label_hierarchy" in config["dataset"]:
        config["dataset"].pop("setup_label_hierarchy")
    return label_hierarchy


def setup_cross_validation(config, work_dir, n_folds, random_seed=25):
    """Seeded shuffle into equal folds; dumps fold{i}.json.

    Parity: `script_utils.py:249-272`.
    """
    filenames = config["training_filenames"]
    # Local RandomState, NOT np.random.seed: same Mersenne-Twister shuffle
    # sequence as the reference (so fold{i}.json splits are bit-identical),
    # without reseeding the caller's global numpy RNG as a side effect.
    np.random.RandomState(random_seed).shuffle(filenames)
    val_step = int(len(filenames) / n_folds)
    fold_configs = []
    for fold_i in range(n_folds):
        val_start = val_step * fold_i
        if (fold_i + 1) == n_folds:
            training_filenames = filenames[:val_start]
            validation_filenames = filenames[val_start:]
        else:
            training_filenames = filenames[:val_start] + filenames[val_start + val_step:]
            validation_filenames = filenames[val_start:val_start + val_step]
        assert (len(validation_filenames) + len(training_filenames)) == len(filenames)
        config_filename = os.path.join(work_dir, f"fold{fold_i + 1}.json")
        fold_config = deepcopy(config)
        fold_config["training_filenames"] = training_filenames
        fold_config["validation_filenames"] = validation_filenames
        dump_json(fold_config, config_filename)
        fold_configs.append([fold_config, config_filename])
    return fold_configs


def load_filenames(filenames):
    """Inline list or .npy path (parity: `script_utils.py:281-287`)."""
    if isinstance(filenames, list):
        return filenames
    if ".npy" in str(filenames):
        return np.load(filenames, allow_pickle=True).tolist()
    raise RuntimeError(f"Could not load filenames: {filenames}")


def load_filenames_from_config(config):
    for key in config:
        if "_filenames" in key:
            config[key] = load_filenames(config[key])


def dataset_kwargs_from_config(config):
    return get_kwargs(config["dataset"], ["name", "training", "validation", "verbose"])


def build_data_loaders_from_config(config, system_config, output_dir, dataset_class,
                                   metric_to_monitor="val_loss"):
    """Parity: `script_utils.py:84-150` including the add_contours n_outputs
    doubling hook and the no-validation fallback to monitoring 'loss'."""
    import warnings

    if in_config("add_contours", config["dataset"], False):
        config["n_outputs"] = config.get("n_outputs", 0) * 2

    n_workers = in_config("n_workers", system_config, 1)
    batch_size = in_config("batch_size", config["training"], 1)
    validation_batch_size = in_config("validation_batch_size", config["training"], 1)
    prefetch_factor = in_config("prefetch_factor", config["training"], 1)
    test_input = in_config("test_input", config["training"], 1)

    training_kwargs = in_config("training", config["dataset"], {})
    validation_kwargs = in_config("validation", config["dataset"], {})
    dataset_kwargs = dataset_kwargs_from_config(config)

    # Under bf16 AMP the jitted step casts inputs to bfloat16 anyway, so the
    # host can ship batches pre-cast and halve host->device transfer; labels
    # ride along (0/1 one-hot is exact in bf16; interpolated fractional labels
    # round at ~3 decimal digits, inside the bf16 loss path's own precision).
    # training.compact_transfer: true/false overrides the amp-keyed default.
    amp = bool(in_config("amp", config["training"], False))
    compact = in_config("compact_transfer", config["training"], None)
    transfer_dtype = None
    if compact if compact is not None else amp:
        import ml_dtypes
        transfer_dtype = {"image": ml_dtypes.bfloat16,
                          "label": ml_dtypes.bfloat16}

    # optional explicit collate name (collate_flatten / collate_5d_flatten);
    # multi-sample datasets (RandSpatialCropSamplesD) default to
    # collate_flatten automatically inside the loader
    collate = in_config("collate", config["training"], None)

    training_dataset = dataset_class(filenames=config["training_filenames"],
                                     **training_kwargs, **dataset_kwargs)
    training_loader = build_loader(training_dataset, batch_size=batch_size,
                                   shuffle=True, num_workers=n_workers,
                                   prefetch_factor=prefetch_factor,
                                   transfer_dtype=transfer_dtype,
                                   collate=collate)

    if test_input:
        write_dataset_examples(test_input, training_dataset,
                               output_dir=os.path.join(output_dir, "data_loader_testing"))

    if "validation_filenames" not in config:
        warnings.warn(RuntimeWarning("No 'validation_filenames' key found in config. "
                                     "Validation will not be run!"))
        validation_loader = None
        metric_to_monitor = "loss"
    else:
        validation_dataset = dataset_class(filenames=config["validation_filenames"],
                                           **validation_kwargs, **dataset_kwargs)
        validation_loader = build_loader(validation_dataset,
                                         batch_size=validation_batch_size,
                                         shuffle=False, num_workers=n_workers,
                                         prefetch_factor=prefetch_factor,
                                         transfer_dtype=transfer_dtype)
    return training_loader, validation_loader, metric_to_monitor


def build_inference_loaders_from_config(config, dataset_class, system_config):
    """Every ``X_filenames`` key except training (parity: `script_utils.py:161-181`)."""
    loaders = []
    inference_kwargs = in_config("validation", config["dataset"], {})
    batch_size = in_config("validation_batch_size", config["training"], 1) \
        if "training" in config else 1
    for key in config:
        if "_filenames" in key and key.split("_filenames")[0] not in ("training",):
            name = key.split("_filenames")[0]
            logging.info("Found inference filenames: %s (n=%d)", name, len(config[key]))
            dataset = dataset_class(filenames=config[key], **inference_kwargs,
                                    **dataset_kwargs_from_config(config))
            loader = build_loader(dataset, batch_size=batch_size, shuffle=False,
                                  num_workers=in_config("n_workers", system_config, 1))
            loaders.append([loader, name])
    return loaders


def model_input_shape_from_config(config, default_shape=(64, 64, 64)):
    """NDHWC init shape: dataset desired_shape (the canonical on-device shape) +
    model input channels."""
    model_cfg = config["model"]
    channels = model_cfg.get("in_channels", model_cfg.get("n_features", 1))
    shape = in_config("desired_shape", config.get("dataset", {}), default_shape)
    return tuple(int(s) for s in shape) + (int(channels),)


def build_or_load_model_from_config(config, model_filename, strict=False, seed=0,
                                    remat=False):
    """create + init + (flexible|strict) checkpoint load.

    Parity: `script_utils.py:51-54` + `unet3d/models/build.py:16-29`.
    Returns (model, variables). ``remat`` (framework extension, config key
    ``training.remat``) wraps the model in flax rematerialization — activations
    are recomputed in the backward pass, trading FLOPs for HBM so larger
    volumes/batches fit.
    """
    model_cfg = config["model"]
    if remat:
        import dataclasses

        import flax.linen as nn
        from unet3d_tpu.models.registry import _freeze_lists, fetch_model_by_name
        cls = fetch_model_by_name(model_cfg["name"])
        if any(f.name == "remat" for f in dataclasses.fields(cls)):
            # model supports per-block remat: far lower peak HBM than
            # wrapping the whole module (see models/dynunet.py)
            model = create_model(model_cfg["name"], remat=True,
                                 **get_kwargs(model_cfg))
        else:
            kwargs = {k: _freeze_lists(v) for k, v in get_kwargs(model_cfg).items()}
            model = nn.remat(cls, static_argnums=(2,))(**kwargs)
    else:
        model = create_model(model_cfg["name"], **get_kwargs(model_cfg))
    variables = init_params(model, model_input_shape_from_config(config), seed=seed)
    if model_filename and os.path.exists(model_filename):
        logging.info("Loading model weights from %s (strict=%s)", model_filename, strict)
        variables = ckpt.load_into(variables, model_filename, strict=strict)
    return model, variables


def load_criterion_from_config(config):
    """Parity: `script_utils.py:57-77`."""
    return load_criterion(config["loss"]["name"], loss_kwargs=get_kwargs(config["loss"]))


def build_optimizer_from_config(config):
    opt_cfg = config["optimizer"]
    return build_optimizer(opt_cfg["name"], **get_kwargs(opt_cfg)), \
        float(opt_cfg.get("lr", 1e-3))


def build_scheduler_from_config(config, base_lr):
    """Parity: `script_utils.py:198-204`."""
    if "scheduler" not in config:
        return None
    sched_cfg = config["scheduler"]
    return build_scheduler(sched_cfg["name"], base_lr, **get_kwargs(sched_cfg))


def build_inferer_from_config(config):
    """Parity: `script_utils.py:290-293`. The ``inference`` section may carry a
    name-less extension key (``amp``) without requesting an inferer."""
    section = config["inference"]
    if "name" not in section:
        return None
    return build_inferer(section["name"], **get_kwargs(section, skip_keys=("amp",)))


def get_activation_from_config(config):
    """Reads the sigmoid/softmax flag out of the loss section
    (parity: `script_utils.py:296-299`)."""
    for activation in ("sigmoid", "softmax"):
        if in_config(activation, config["loss"], False):
            return activation
    return None


def write_dataset_examples(n_test_cases, training_dataset, output_dir):
    """Debug NIfTI dumps of the first N transformed samples
    (parity: `script_utils.py:207-229`)."""
    os.makedirs(output_dir, exist_ok=True)
    for index in range(min(n_test_cases, len(training_dataset))):
        item = training_dataset[index]
        src = item["source_filename"]
        src = src[0] if isinstance(src, (list, tuple)) else src
        base = os.path.basename(str(src)).split(".")[0]
        Volume(data=item["image"], affine=item["affine"]).to_filename(
            os.path.join(output_dir, f"input_test_{base}.nii.gz"))
        if "label" in item and np.asarray(item["label"]).ndim >= 3:
            Volume(data=item["label"], affine=item["affine"]).to_filename(
                os.path.join(output_dir, f"target_test_{base}.nii.gz"))
