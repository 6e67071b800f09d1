#!/usr/bin/env python
"""Export a trained model as a self-contained serving artifact.

Framework extension (no reference counterpart — the reference serves by
re-running its predict script against the python checkpoint). Produces a
single-file StableHLO container (`predict/export.py`) that a serving process
loads with ``unet3d_tpu.predict.export.load_exported`` — no model code,
config, or checkpoint needed at serving time.

    unet3d-export --config_filename cfg.json --model_filename model.npz \
                  --output_filename model.u3dexp [--platforms cpu,tpu] \
                  [--activation sigmoid] [--batch_size N] [--amp]
"""
from __future__ import annotations

import argparse
import logging

from unet3d_tpu.config.factory import (build_or_load_model_from_config,
                                       get_activation_from_config,
                                       model_input_shape_from_config)
from unet3d_tpu.predict.export import export_forward, save_exported
from unet3d_tpu.utils.config import load_json


def format_parser(parser=None):
    if parser is None:
        parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config_filename", required=True)
    parser.add_argument("--model_filename", required=True)
    parser.add_argument("--output_filename", required=True)
    parser.add_argument("--activation", default=None,
                        help="Activation folded into the artifact (any jax.nn/"
                             "jnp name). Default: inferred from the config's "
                             "loss (sigmoid/softmax), like the segment CLI.")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="Fix the batch dimension; default exports a "
                             "dynamic (symbolic) batch.")
    parser.add_argument("--platforms", default=None,
                        help="Comma-separated lowering targets, e.g. "
                             "'cpu,tpu'. Default: the current backend only.")
    parser.add_argument("--amp", action="store_true",
                        help="Run the exported graph in bfloat16 (f32 in/out).")
    parser.add_argument("--mesh", default=None,
                        help="Export a multi-device artifact over a mesh, "
                             "e.g. 'space=4' (volume depth sharded, the "
                             "predict CLI's layout) or 'data=2,space=4'. "
                             "The serving process needs the same device "
                             "count.")
    parser.add_argument("--entry_layout", default="ncdhw",
                        choices=("ncdhw", "ndhwc"),
                        help="Artifact boundary layout: 'ncdhw' (channel-"
                             "first, the package's host convention; default) "
                             "or 'ndhwc' (device-native channel-last — no "
                             "transposes inside the program, for serving "
                             "pipelines that already hold channel-last "
                             "tensors).")
    return parser


def parse_args(args=None):
    return format_parser().parse_args(args)


def main(args=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    namespace = parse_args(args)
    config = load_json(namespace.config_filename)
    model, variables = build_or_load_model_from_config(
        config, namespace.model_filename, strict=True)
    input_shape = model_input_shape_from_config(config)
    activation = namespace.activation or get_activation_from_config(config)
    platforms = (namespace.platforms.split(",") if namespace.platforms
                 else None)
    mesh = None
    mesh_meta = None
    if namespace.mesh:
        from unet3d_tpu.parallel.mesh import make_mesh, parse_mesh_spec
        mesh = make_mesh(parse_mesh_spec(namespace.mesh))
        mesh_meta = {"axes": list(mesh.axis_names),
                     "shape": [int(mesh.shape[a]) for a in mesh.axis_names]}
    logging.info("Exporting %s at input shape %s (activation=%s, amp=%s, "
                 "platforms=%s, mesh=%s, entry_layout=%s)",
                 config["model"].get("name"),
                 input_shape, activation, namespace.amp,
                 platforms or "current", mesh_meta or "single-device",
                 namespace.entry_layout)
    exported = export_forward(model, variables, input_shape,
                              amp=namespace.amp, activation=activation,
                              batch_size=namespace.batch_size,
                              platforms=platforms, mesh=mesh,
                              entry_layout=namespace.entry_layout)
    metadata = {"model": config["model"], "activation": activation,
                "amp": bool(namespace.amp),
                "entry_layout": namespace.entry_layout}
    if mesh_meta:
        metadata["mesh"] = mesh_meta
    header = save_exported(exported, namespace.output_filename,
                           metadata=metadata)
    logging.info("Wrote %s (in=%s out=%s platforms=%s)",
                 namespace.output_filename, header["in_avals"],
                 header["out_avals"], header["platforms"])


if __name__ == "__main__":
    main()
