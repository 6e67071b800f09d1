#!/usr/bin/env python
"""Standalone inference CLI — parity with `unet3d/scripts/predict.py:16-101`.

Runs a strictly-loaded model over a named filename group (``--group test`` reads
``test_filenames``) and writes NIfTI predictions into ``<output_directory>/predictions``.
"""
from __future__ import annotations

import argparse
import logging
import os

from unet3d_tpu.config.factory import (add_machine_config_to_parser,
                                       build_or_load_model_from_config,
                                       check_hierarchy, dataset_kwargs_from_config,
                                       get_machine_config)
from unet3d_tpu.data.dataset import load_dataset_class
from unet3d_tpu.data.loader import build_loader
from unet3d_tpu.predict.volumetric import volumetric_predictions
from unet3d_tpu.scripts.segment import format_parser as format_segmentation_parser
from unet3d_tpu.train.step import create_train_state
from unet3d_tpu.train.optim import build_optimizer
from unet3d_tpu.utils.config import in_config, load_json


def format_parser(parser=None, sub_command: bool = False):
    if parser is None:
        parser = argparse.ArgumentParser()
    parser.add_argument("--output_directory", required=True)
    if not sub_command:
        parser.add_argument("--config_filename", required=True)
        parser.add_argument("--model_filename", required=True)
        add_machine_config_to_parser(parser)
    parser.add_argument("--group", default="test",
                        help="Name of the group of filenames to make predictions on. "
                             "The default is 'test'.")
    parser.add_argument("--activation",
                        help="Apply an activation function to the outputs of the "
                             "model before writing to file.")
    format_segmentation_parser(parser, sub_command=True)
    return parser


def parse_args(args=None):
    return format_parser().parse_args(args)


def run_inference(config, output_directory, model_filename, group, activation,
                  system_config):
    """Parity: `unet3d/scripts/predict.py:53-97`."""
    from unet3d_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed(system_config)
    logging.info("Output directory: %s", output_directory)
    work_dir = os.path.abspath(output_directory)
    check_hierarchy(config)
    cache_dir = os.path.join(work_dir, "cache")
    os.makedirs(cache_dir, exist_ok=True)
    dataset_class = load_dataset_class(config["dataset"], cache_dir=cache_dir)
    key = f"{group}_filenames"
    logging.info("Filenames key: %s", key)
    if key not in config:
        raise ValueError(f"Could not find key {key} in the configuration file. "
                         "Change the group ('--group' on commandline) to the name of "
                         "the group of filenames (e.g., 'validation' to use "
                         "'validation_filenames') that you want to predict.")

    inference_kwargs = in_config("validation", config["dataset"], {})
    batch_size = in_config("validation_batch_size", config.get("training", {}), 1)
    dataset = dataset_class(filenames=config[key], **inference_kwargs,
                            **dataset_kwargs_from_config(config))
    dataloader = build_loader(dataset, batch_size=batch_size, shuffle=False,
                              num_workers=in_config("n_workers", system_config, 1))

    logging.info("Model filename: %s", model_filename)
    forward = None
    model = state = None
    if str(model_filename).endswith(".u3dexp"):
        # serving artifact (unet3d-export): a self-contained StableHLO
        # program — no model build or checkpoint load happens here
        from unet3d_tpu.predict.export import load_exported
        served = load_exported(model_filename)
        folded = served.metadata.get("activation")
        if folded:
            if activation and activation != folded:
                raise ValueError(
                    f"--activation {activation!r} conflicts with the "
                    f"{folded!r} activation folded into {model_filename}")
            logging.info("Activation %r is folded into the artifact", folded)
            activation = None
        forward = served.ndhwc_forward()
    else:
        model, variables = build_or_load_model_from_config(config, model_filename,
                                                           strict=True)
        state = create_train_state(variables, build_optimizer("Adam"))

    mesh = None
    n_devices = int(in_config("n_gpus", system_config, 1))
    mesh_spec = in_config("mesh", system_config, None)
    if mesh_spec is not None:
        from unet3d_tpu.parallel.mesh import parse_mesh_spec
        mesh_spec = parse_mesh_spec(mesh_spec)
        n_mesh = 1
        for size in mesh_spec.values():
            n_mesh *= size
        n_devices = max(n_devices, n_mesh)
    if n_devices > 1 and forward is None:  # artifacts run as exported
        # reference threads n_gpus into its predict loop
        # (`unet3d/scripts/predict.py:86`); TPU-native: shard each case's D
        # axis over a space mesh (conv halo exchanges from XLA SPMD). An
        # explicit pure-data mesh spec keeps the user's batch-DP layout.
        import jax
        from unet3d_tpu.parallel.mesh import make_mesh
        if mesh_spec is not None and "space" not in mesh_spec:
            mesh = make_mesh(mesh_spec)
        else:
            mesh = make_mesh({"space": min(n_devices, len(jax.devices()))})

    prediction_dir = os.path.join(work_dir, "predictions")
    os.makedirs(prediction_dir, exist_ok=True)
    amp = bool(in_config("amp", config.get("inference", {}),
                         in_config("amp", config.get("training", {}), False)))
    return volumetric_predictions(model=model, state=state, dataloader=dataloader,
                                  prediction_dir=prediction_dir,
                                  activation=activation, interpolation="trilinear",
                                  resample=in_config("resample", config["dataset"], False),
                                  mesh=mesh, amp=amp, forward=forward)


def main(args=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    from unet3d_tpu.utils.compile_cache import maybe_enable_compile_cache
    maybe_enable_compile_cache()
    namespace = parse_args(args)
    logging.info("Config filename: %s", namespace.config_filename)
    config = load_json(namespace.config_filename)
    run_inference(config=config, output_directory=namespace.output_directory,
                  model_filename=namespace.model_filename, group=namespace.group,
                  activation=namespace.activation,
                  system_config=get_machine_config(namespace))


if __name__ == "__main__":
    main()
