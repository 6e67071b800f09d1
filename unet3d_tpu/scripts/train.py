#!/usr/bin/env python
"""Training CLI — flag-for-flag parity with the reference's `unet3d/scripts/train.py`.

Interprets the JSON config (model / optimizer / loss / scheduler / dataset /
training / inference / cross_validation / *_filenames), expands cross-validation
folds recursively, trains with the jitted TPU step, then runs inference on every
``X_filenames`` group except training (`unet3d/scripts/train.py:54-160`).
"""
from __future__ import annotations

import argparse
import logging
import os
import warnings

from unet3d_tpu.config.factory import (add_machine_config_to_parser,
                                       build_data_loaders_from_config,
                                       build_inference_loaders_from_config,
                                       build_inferer_from_config,
                                       build_optimizer_from_config,
                                       build_or_load_model_from_config,
                                       build_scheduler_from_config, check_hierarchy,
                                       get_activation_from_config,
                                       get_machine_config,
                                       load_criterion_from_config,
                                       load_filenames_from_config,
                                       setup_cross_validation)
from unet3d_tpu.data.dataset import load_dataset_class, validate_filenames
from unet3d_tpu.predict.volumetric import volumetric_predictions
from unet3d_tpu.train.step import (create_train_state, make_eval_step,
                                   make_train_step)
from unet3d_tpu.train.train import run_training
from unet3d_tpu.utils.config import in_config, load_json


def parse_args(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_filename", required=True,
                        help="JSON configuration file specifying the parameters "
                             "for model training.")
    parser.add_argument("--output_dir", required=False,
                        help="Output directory where all the outputs will be saved. "
                             "Defaults to the directory of the configuration file.")
    parser.add_argument("--setup_crossval_only", action="store_true", default=False,
                        help="Only write the cross-validation configuration files.")
    parser.add_argument("--pretrained_model_filename", required=False,
                        help="If this filename exists prior to training, the model "
                             "will be loaded from the filename (flexible loading).")
    parser.add_argument("--batch_size", type=int,
                        help="Override the batch size from the config file.")
    parser.add_argument("--debug", action="store_true", default=False,
                        help="Raises an error if a training file is not found; "
                             "default silently skips missing files.")
    add_machine_config_to_parser(parser)
    parser.add_argument("--dry_run", action="store_true", default=False,
                        help="Validate the config without training: load one "
                             "batch through the real data pipeline, compile "
                             "the (mesh-sharded) train step at the config's "
                             "true shapes, write a compile report with the "
                             "per-device memory analysis to the work dir "
                             "(compile_report.json), and exit. Catches shape/"
                             "mesh/HBM problems before burning accelerator "
                             "time.")
    parser.add_argument("--n_examples", type=int, default=1,
                        help="Number of example input/output pairs to write to "
                             "file for debugging purposes. (default = 1)")
    return parser.parse_args(args)


def dry_run_compile(work_dir, training_loader, mesh, state, *, model,
                    criterion, tx, amp, grad_accum, train_step=None):
    """``--dry_run``: compile the train step at the config's true shapes —
    no execution, no training.

    Loads ONE batch through the real data pipeline (validating file IO,
    shapes and dtypes end-to-end), then lowers the step with
    ``ShapeDtypeStruct``s in place of the batch — nothing is transferred and
    the step never runs, so configs far larger than the validating host's
    memory (e.g. the SPPIN 192^3 workload on a CPU-simulated mesh,
    doc/Configuration.md) still compile. Writes ``compile_report.json`` with
    the backend's per-device memory analysis: on a TPU backend those numbers
    are the per-chip HBM footprint; on a CPU simulation they estimate it
    (layouts/fusions differ across backends).
    """
    import json

    import jax

    batch = next(iter(training_loader))
    images, labels = batch["image"], batch["label"]
    img_sds = jax.ShapeDtypeStruct(tuple(images.shape), images.dtype)
    lbl_sds = jax.ShapeDtypeStruct(tuple(labels.shape), labels.dtype)
    if mesh is not None:
        from unet3d_tpu.parallel.mesh import lower_sharded_train_step
        lowered = lower_sharded_train_step(model, criterion, tx, mesh, state,
                                           img_sds, lbl_sds, amp=amp,
                                           grad_accum=grad_accum)
    else:
        lowered = train_step.lower(state, img_sds, lbl_sds)
    compiled = lowered.compile()
    report = {
        "backend": jax.default_backend(),
        "mesh": ({a: int(mesh.shape[a]) for a in mesh.axis_names}
                 if mesh is not None else None),
        "images": [[int(s) for s in images.shape], str(images.dtype)],
        "labels": [[int(s) for s in labels.shape], str(labels.dtype)],
        "amp": bool(amp),
        "gradient_accumulation_steps": int(grad_accum),
    }
    try:
        mem = compiled.memory_analysis()
        report["per_device_bytes"] = {
            "arguments": int(mem.argument_size_in_bytes),
            "outputs": int(mem.output_size_in_bytes),
            "temp": int(mem.temp_size_in_bytes),
            "aliased": int(mem.alias_size_in_bytes),
            "generated_code": int(mem.generated_code_size_in_bytes),
        }
        peak = (mem.argument_size_in_bytes + mem.output_size_in_bytes
                + mem.temp_size_in_bytes - mem.alias_size_in_bytes)
        report["per_device_peak_gib"] = round(peak / 2 ** 30, 3)
    except Exception as error:  # pragma: no cover - backend without stats
        report["memory_analysis_error"] = repr(error)
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        if cost and "flops" in cost:
            report["flops_per_step_per_device"] = float(cost["flops"])
    except Exception:  # pragma: no cover - cost analysis is best-effort
        pass
    path = os.path.join(work_dir, "compile_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    logging.info("Dry run: train step compiled OK -> %s", path)
    logging.info("Compile report: %s", json.dumps(report))
    return report


def run(config_filename, output_dir, namespace):
    logging.info("Config: %s", config_filename)
    config = load_json(config_filename)
    load_filenames_from_config(config)

    work_dir = os.path.join(output_dir, os.path.basename(config_filename).split(".")[0])
    logging.info("Work Dir: %s", work_dir)
    os.makedirs(work_dir, exist_ok=True)

    if "cross_validation" in config:
        cross_validation_config = config.pop("cross_validation")
        if isinstance(cross_validation_config, list):  # sppin config wraps in a list
            cross_validation_config = cross_validation_config[0]
        for _config, _config_filename in setup_cross_validation(
                config, work_dir=work_dir,
                n_folds=in_config("n_folds", cross_validation_config,
                                  in_config("folds", cross_validation_config, 5)),
                random_seed=in_config("random_seed", cross_validation_config,
                                      in_config("seed", cross_validation_config, 25))):
            if not namespace.setup_crossval_only:
                logging.info("Running cross validation fold: %s", _config_filename)
                run(_config_filename, work_dir, namespace)
            else:
                logging.info("Setup cross validation fold: %s", _config_filename)
        return

    system_config = get_machine_config(namespace)
    # multi-host pod launch: no-op unless the machine config carries
    # coordinator_address / n_nodes / node_rank (doc/MultiHost.md)
    from unet3d_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed(system_config)

    if namespace.debug:
        config.setdefault("dataset", {})["verbose"] = True
        warnings.filterwarnings("error")
    if namespace.batch_size:
        warnings.warn(RuntimeWarning(
            "Overwriting the batch size from the configuration file (batch_size={}) "
            "to batch_size={}".format(config["training"]["batch_size"],
                                      namespace.batch_size)))
        config["training"]["batch_size"] = namespace.batch_size

    for key in list(config):
        if "_filenames" in key:
            config[key] = validate_filenames(config[key],
                                             raise_on_missing=namespace.debug)

    # "checkpoint_backend": "orbax" opts into async multi-host-sharded
    # directory checkpoints (train/checkpoint_orbax.py); default stays the
    # reference-parity single-file model checkpoint
    ckpt_backend = in_config("checkpoint_backend", config.get("training", {}), "npz")
    if ckpt_backend == "orbax":
        # fail fast: the first save otherwise happens after epoch 1's compute,
        # aborting a paid-for epoch on a missing optional dependency
        try:
            import orbax.checkpoint  # noqa: F401
        except ImportError as error:
            raise ImportError(
                "checkpoint_backend='orbax' requires orbax-checkpoint "
                "(pip install 'unet3d-tpu[orbax]')") from error
    model_filename = os.path.join(
        work_dir, "model.orbax" if ckpt_backend == "orbax" else "model.npz")
    logging.info("Model: %s", model_filename)
    training_log_filename = os.path.join(work_dir, "training_log.csv")
    logging.info("Log: %s", training_log_filename)

    check_hierarchy(config)
    dataset_class = load_dataset_class(config["dataset"],
                                       cache_dir=os.path.join(work_dir, "cache"))
    if namespace.n_examples:
        config["training"]["test_input"] = namespace.n_examples

    training_loader, validation_loader, metric_to_monitor = \
        build_data_loaders_from_config(config, system_config, work_dir, dataset_class)

    pretrained = namespace.pretrained_model_filename
    pretrained = os.path.abspath(pretrained) if pretrained else model_filename
    model, variables = build_or_load_model_from_config(
        config, pretrained, strict=False,
        remat=bool(in_config("remat", config["training"], False)))
    criterion = load_criterion_from_config(config)
    tx, base_lr = build_optimizer_from_config(config)
    scheduler = build_scheduler_from_config(config, base_lr)
    inferer = build_inferer_from_config(config) if "inference" in config else None

    amp = bool(in_config("amp", config["training"], False))
    # framework extension: split each batch into K microbatches inside the
    # step (f32 grad accumulation, one optimizer update) so large effective
    # batches train within a single chip's HBM (train/step.py)
    grad_accum = int(in_config("gradient_accumulation_steps",
                               config["training"], 1))
    if grad_accum > 1:
        # Averaging per-microbatch losses/grads matches the full-batch step
        # only for mean-reduced criteria that decompose per sample. batch=True
        # Dice-family losses reduce intersection/union jointly over the batch
        # axis, and reduction="sum" scales with microbatch count — both change
        # the objective under accumulation.
        if getattr(criterion, "batch", False):
            raise ValueError(
                "gradient_accumulation_steps > 1 is incompatible with a "
                "batch=True criterion: the loss couples samples across the "
                "batch axis, so microbatched accumulation changes the "
                "training objective. Set batch=False or disable accumulation.")
        if getattr(criterion, "reduction", "mean") != "mean":
            warnings.warn(RuntimeWarning(
                "gradient_accumulation_steps > 1 with reduction="
                f"'{criterion.reduction}': accumulated microbatch losses are "
                "averaged, which only matches the full-batch step for "
                "reduction='mean'."))
    state = create_train_state(variables, tx)
    n_devices = int(in_config("n_gpus", system_config, 1))
    # "mesh": {"data": 2, "space": 4} in the machine config (or --mesh
    # data2,space4) selects the device-grid factorization; the default is all
    # devices on the data axis. The space axis spatially partitions each
    # volume's D axis (XLA SPMD inserts the conv halo exchanges) — how
    # volumes larger than one chip's HBM (e.g. the SPPIN 192^3 config, which
    # OOMs a 16 GB chip even with remat — PERF.md) train through this CLI.
    mesh_spec = in_config("mesh", system_config, None)
    if mesh_spec is not None:
        from unet3d_tpu.parallel.mesh import parse_mesh_spec
        mesh_spec = parse_mesh_spec(mesh_spec)
        n_mesh = 1
        for size in mesh_spec.values():
            n_mesh *= size
        n_devices = max(n_devices, n_mesh)
    predict_mesh = None
    train_mesh = None
    batch_sharding = None  # set on the mesh path; used by the device prefetcher
    if n_devices > 1:
        # The reference wraps in DataParallel here (`unet3d/models/build.py:18-20`);
        # TPU-native: batch sharded over a (data, space) mesh, XLA inserts the
        # gradient all-reduces and conv halo exchanges.
        import jax
        import jax.numpy as jnp
        from unet3d_tpu.parallel.mesh import (make_mesh, make_sharded_eval_step,
                                              make_sharded_train_step,
                                              replicate_state, shard_batch)
        n_devices = min(n_devices, len(jax.devices()))
        explicit_data_only = mesh_spec is not None and "space" not in mesh_spec
        if mesh_spec is None:
            mesh_spec = {"data": n_devices}
        mesh = make_mesh(mesh_spec)
        train_mesh = mesh
        data_axis = mesh.shape.get("data", 1)
        space_axis = mesh.shape.get("space", 1)
        batch_size = int(config["training"]["batch_size"])
        if batch_size % data_axis:
            hint = ""
            if batch_size and n_devices % batch_size == 0:
                hint = (f" (e.g. --mesh data{batch_size},"
                        f"space{n_devices // batch_size})")
            raise ValueError(
                f"batch_size={batch_size} is not divisible by the mesh's "
                f"data axis ({data_axis}); pick a mesh whose data axis "
                f"divides the batch{hint}")
        desired_shape = (config.get("dataset") or {}).get("desired_shape")
        if space_axis > 1 and desired_shape and int(desired_shape[0]) % space_axis:
            # fail up front with the fix, not mid-epoch with a raw sharding
            # error from shard_batch/device_put (doc/Configuration.md states
            # the divisibility rule; enforce it like the data axis above)
            raise ValueError(
                f"desired_shape depth {desired_shape[0]} is not divisible by "
                f"the mesh's space axis ({space_axis}); pick a space size "
                f"that divides the volume depth, or pad desired_shape")
        state = replicate_state(state, mesh)
        sharded_step = make_sharded_train_step(model, criterion, tx, mesh,
                                               amp=amp, grad_accum=grad_accum)

        def train_step(s, images, labels):
            return sharded_step(s, shard_batch(jnp.asarray(images), mesh),
                                shard_batch(jnp.asarray(labels), mesh))

        sharded_eval = make_sharded_eval_step(model, criterion, mesh,
                                              inferer=inferer, amp=amp)
        plain_eval = make_eval_step(model, criterion, inferer=inferer, amp=amp)

        def eval_step(s, images, labels):
            # ragged last batch: NamedSharding needs divisibility — run it
            # unsharded (state shardings are compatible with the plain jit)
            if (images.shape[0] % data_axis == 0
                    and images.shape[2] % space_axis == 0):
                return sharded_eval(s, shard_batch(jnp.asarray(images), mesh),
                                    shard_batch(jnp.asarray(labels), mesh))
            return plain_eval(s, images, labels)

        # whole-case prediction runs batch 1 per case, so the data axis is
        # idle there: re-lay the same devices out on the space axis (D-axis
        # partitioning, the context-parallel analog) — unless the user asked
        # for a pure-data mesh explicitly, in which case batch-sharded
        # prediction keeps their layout (ragged batches fall back unsharded)
        predict_mesh = mesh if explicit_data_only else \
            make_mesh({"space": n_devices})
        from unet3d_tpu.data.prefetch import mesh_batch_sharding
        batch_sharding = mesh_batch_sharding(mesh)
    else:
        train_step = make_train_step(model, criterion, tx, amp=amp,
                                     grad_accum=grad_accum)
        eval_step = make_eval_step(model, criterion, inferer=inferer, amp=amp)

    if namespace.dry_run:
        dry_run_compile(work_dir, training_loader, train_mesh, state,
                        model=model, criterion=criterion, tx=tx, amp=amp,
                        grad_accum=grad_accum,
                        train_step=None if train_mesh is not None else train_step)
        return

    # Double-buffered device puts (SURVEY §7 stage 5; ref analog DataLoader
    # pin_memory/prefetch_factor, `scripts/script_utils.py:124-129`): batch
    # i+1 ships into HBM (pre-sharded on the mesh path) while step i runs.
    # UNET3D_TPU_PREFETCH sets the buffer depth; 0 disables.
    prefetch_depth = int(os.environ.get("UNET3D_TPU_PREFETCH", "2") or 0)
    if prefetch_depth > 0:
        from unet3d_tpu.data.prefetch import DevicePrefetcher
        training_loader = DevicePrefetcher(training_loader,
                                           sharding=batch_sharding,
                                           depth=prefetch_depth)
        if validation_loader is not None:
            validation_loader = DevicePrefetcher(validation_loader,
                                                 sharding=batch_sharding,
                                                 depth=prefetch_depth)

    state = run_training(
        train_step=train_step, eval_step=eval_step, state=state,
        n_epochs=in_config("n_epochs", config["training"], 1000),
        training_loader=training_loader, validation_loader=validation_loader,
        model_filename=model_filename, training_log_filename=training_log_filename,
        metric_to_monitor=metric_to_monitor,
        early_stopping_patience=in_config("early_stopping_patience",
                                          config["training"], None),
        save_best=in_config("save_best", config["training"], True),
        save_every_n_epochs=in_config("save_every_n_epochs", config["training"], None),
        save_last_n_models=in_config("save_last_n_models", config["training"], None),
        scheduler=scheduler,
        samples_per_epoch=in_config("samples_per_epoch", config["training"], None),
        training_iterations_per_epoch=in_config("training_iterations_per_epoch",
                                                config["training"], 1),
        save_optimizer=bool(in_config("save_optimizer", config["training"], False)))

    for _loader, _name in build_inference_loaders_from_config(
            config, dataset_class=dataset_class, system_config=system_config):
        prediction_dir = os.path.join(work_dir, _name)
        os.makedirs(prediction_dir, exist_ok=True)
        volumetric_predictions(model=model, state=state, dataloader=_loader,
                               prediction_dir=prediction_dir,
                               interpolation="trilinear",
                               resample=in_config("resample", config["dataset"], False),
                               inferer=inferer,
                               activation=get_activation_from_config(config),
                               mesh=predict_mesh,
                               amp=bool(in_config("amp", config.get("inference", {}),
                                                  amp)))


def main(args=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    from unet3d_tpu.utils.compile_cache import maybe_enable_compile_cache
    maybe_enable_compile_cache()
    namespace = parse_args(args)
    config_filename = os.path.abspath(namespace.config_filename)
    if namespace.output_dir:
        output_dir = os.path.abspath(namespace.output_dir)
    else:
        output_dir = os.path.dirname(config_filename)
    run(config_filename, output_dir, namespace)


if __name__ == "__main__":
    main()
