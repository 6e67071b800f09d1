"""Training engine: epoch driver with CSV log, resume, early stop, checkpoints.

Parity: `unet3d/train/train.py:11-124` and the epoch loops of
`unet3d/train/training_utils.py:20-147` —
* resume: start_epoch from the last CSV row, scheduler fast-forwarded by
  replaying logged metrics (`train.py:16-31`);
* early stopping on monitored-metric patience (`train.py:41-46`), abort on NaN
  (`train.py:48-50`);
* per-epoch: train loop with timing meters -> validation (optionally through an
  inferer) -> CSV rewrite -> scheduler step (ReduceLROnPlateau gets the metric)
  -> checkpoint save: latest every epoch, `_best` copy on improvement,
  `_{epoch}` every N, rolling last-N window with deletion (`train.py:85-103`).

The optimizer LR lives inside the jitted TrainState (optax inject_hyperparams);
the host-side scheduler writes the next epoch's LR into it.
"""
from __future__ import annotations

import csv
import os
import shutil
import time
from typing import Callable, List, Optional

import jax
import numpy as np

from unet3d_tpu.train.checkpoint import (load_opt_state, save_checkpoint,
                                         save_opt_state)
from unet3d_tpu.train.meters import AverageMeter, ProgressMeter
from unet3d_tpu.train.optim import ReduceLROnPlateau, Scheduler
from unet3d_tpu.train.step import TrainState, set_state_learning_rate

TRAINING_LOG_HEADER = ["epoch", "loss", "lr", "val_loss"]


def read_training_log(filename: str) -> List[List[float]]:
    rows: List[List[float]] = []
    with open(filename) as f:
        reader = csv.reader(f)
        header = next(reader)
        del header
        for row in reader:
            rows.append([float(v) if v not in ("", "None") else float("nan")
                         for v in row])
    return rows


def write_training_log(rows: List[List[float]], filename: str) -> None:
    """Full rewrite each epoch, indexed by epoch (parity: `train.py:71-73`)."""
    with open(filename, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(TRAINING_LOG_HEADER)
        for row in rows:
            writer.writerow([("" if v is None or (isinstance(v, float) and np.isnan(v))
                              else v) for v in row])


def forced_copy(source: str, target: str) -> None:
    if str(source).endswith(".orbax"):
        # orbax checkpoints are directories written asynchronously: the save
        # must land (tmp-dir finalize/rename) before the copy can see it
        from unet3d_tpu.train.checkpoint_orbax import wait_for_saves
        wait_for_saves()
    remove_file(target)
    if os.path.isdir(source):
        shutil.copytree(source, target)
    else:
        shutil.copy(source, target)


def remove_file(filename: str) -> None:
    if os.path.isdir(filename):
        shutil.rmtree(filename)
    elif os.path.exists(filename):
        os.remove(filename)


def append_to_filename(filename: str, what_to_append) -> str:
    dirname, basename = os.path.split(filename)
    name, extension = basename.split(".", 1)
    return os.path.join(dirname, f"{name}_{what_to_append}.{extension}")


def epoch_training(train_loader, train_step, state: TrainState, epoch: int,
                   samples_per_epoch: Optional[int] = None, print_freq: int = 1):
    """One pass over the training loader; returns (state, mean loss).

    Parity: `training_utils.py:20-85` (timing meters, samples_per_epoch cap).
    """
    batch_time = AverageMeter("Time", ":6.3f")
    data_time = AverageMeter("Data", ":6.3f")
    losses = AverageMeter("Loss", ":.4e")
    progress = ProgressMeter(len(train_loader), [batch_time, data_time, losses],
                             prefix=f"Epoch: [{epoch}]")
    end = time.time()
    n_seen = 0
    pending = None  # (device loss, batch size) — synced one step late so the
    # host can prep batch i+1 while the device still runs step i
    for i, batch in enumerate(train_loader):
        data_time.update(time.time() - end)
        images = batch["image"]
        labels = batch["label"]
        try:
            state, loss = train_step(state, images, labels)
        except Exception as error:
            if i == 0 and epoch <= 1:
                # first-ever step: compile/memory failures land here; give the
                # reference's OOM guidance (doc/FAQ.md; ref doc/Configuration.md:99-104)
                raise RuntimeError(
                    "The first training step failed to compile or run (input "
                    f"shape {tuple(images.shape)}). If this is an out-of-memory "
                    "or compiler failure, reduce the dataset 'desired_shape' in "
                    "increments of 16 (keep each dim divisible by 2^#downsample "
                    "levels), set \"remat\": true in the training config to "
                    "recompute activations in the backward pass, or shard the "
                    "volume over more chips (--ngpus N)."
                ) from error
            raise
        if pending is not None:
            losses.update(float(pending[0]), pending[1])
        pending = (loss, images.shape[0])
        n_seen += images.shape[0]
        batch_time.update(time.time() - end)
        end = time.time()
        if print_freq and i % print_freq == 0:
            progress.display(i)
        if samples_per_epoch is not None and n_seen >= samples_per_epoch:
            break
    if pending is not None:
        losses.update(float(pending[0]), pending[1])
    return state, losses.avg


def epoch_validation(val_loader, eval_step, state: TrainState, print_freq: int = 1):
    """No-grad pass over the validation loader (parity: `training_utils.py:115-147`)."""
    batch_time = AverageMeter("Time", ":6.3f")
    losses = AverageMeter("Loss", ":.4e")
    progress = ProgressMeter(len(val_loader), [batch_time, losses],
                             prefix="Validation: ")
    end = time.time()
    pending = None  # lagged sync, same overlap trick as epoch_training
    for i, batch in enumerate(val_loader):
        loss = eval_step(state, batch["image"], batch["label"])
        if pending is not None:
            losses.update(float(pending[0]), pending[1])
        pending = (loss, batch["image"].shape[0])
        batch_time.update(time.time() - end)
        end = time.time()
        if print_freq and i % print_freq == 0:
            progress.display(i)
    if pending is not None:
        losses.update(float(pending[0]), pending[1])
    return losses.avg


def _state_variables(state: TrainState) -> dict:
    variables = {"params": jax.device_get(state.params)}
    for name, tree in state.extra_variables.items():
        variables[name] = jax.device_get(tree)
    return variables


def _state_variables_device(state: TrainState) -> dict:
    """Like :func:`_state_variables` but keeps jax.Array leaves on device — the
    orbax backend snapshots them itself, and on a multi-host mesh a device_get
    of non-fully-addressable arrays would raise."""
    variables = {"params": state.params}
    variables.update(state.extra_variables)
    return variables


def run_training(train_step: Callable, eval_step: Optional[Callable],
                 state: TrainState, n_epochs: int, training_loader,
                 validation_loader, training_log_filename: str, model_filename: str,
                 metric_to_monitor: str = "val_loss",
                 early_stopping_patience: Optional[int] = None, save_best: bool = False,
                 save_every_n_epochs: Optional[int] = None,
                 save_last_n_models: Optional[int] = None,
                 scheduler: Optional[Scheduler] = None,
                 samples_per_epoch: Optional[int] = None,
                 training_iterations_per_epoch: int = 1,
                 save_optimizer: bool = False) -> TrainState:
    training_log: List[List[float]] = []
    if os.path.exists(training_log_filename):
        training_log.extend(read_training_log(training_log_filename))
        start_epoch = int(training_log[-1][0]) + 1
    else:
        start_epoch = 1
    metric_col = TRAINING_LOG_HEADER.index(metric_to_monitor)

    optimizer_filename = append_to_filename(model_filename, "optimizer")
    if optimizer_filename.endswith(".orbax"):
        # the optimizer state is always the flat keyed npz (save_opt_state);
        # only the model checkpoint switches to the orbax directory format
        optimizer_filename = optimizer_filename[: -len(".orbax")] + ".npz"
    if save_optimizer and start_epoch > 1 and os.path.exists(optimizer_filename):
        # framework extension over the reference (which replays LR schedules but
        # loses Adam moments on resume): restore the optimizer state exactly
        state = state.replace(opt_state=load_opt_state(state.opt_state,
                                                       optimizer_filename))

    # Fast-forward the scheduler through already-logged epochs (`train.py:23-31`)
    if scheduler is not None and start_epoch > 1:
        for i in range(1, start_epoch):
            if isinstance(scheduler, ReduceLROnPlateau):
                metric = np.asarray(training_log)[i - 1, metric_col]
                scheduler.step(metric)
            else:
                scheduler.step()
        state = set_state_learning_rate(state, scheduler.lr)

    for epoch in range(start_epoch, n_epochs + 1):
        if training_log:
            metric = np.asarray(training_log, dtype=np.float64)[:, metric_col]
        # early stopping (`train.py:41-46`); all-NaN metric falls through to the
        # NaN-abort below instead of crashing nanargmin
        if (training_log and early_stopping_patience
                and not np.all(np.isnan(metric))
                and np.nanargmin(metric) <= len(training_log) - early_stopping_patience):
            print(f"Early stopping patience {early_stopping_patience} has been reached.")
            break
        # NaN stop (`train.py:48-50`)
        if training_log and np.isnan(metric[-1]):
            print("Stopping as invalid results were returned.")
            break

        epoch_losses = []
        for it in range(training_iterations_per_epoch):
            training_loader.set_epoch(epoch * training_iterations_per_epoch + it)
            state, loss = epoch_training(training_loader, train_step, state,
                                         epoch=epoch, samples_per_epoch=samples_per_epoch)
            epoch_losses.append(loss)
        loss = float(np.mean(epoch_losses))

        if validation_loader is not None and eval_step is not None:
            val_loss = epoch_validation(validation_loader, eval_step, state)
        else:
            val_loss = None

        lr = scheduler.lr if scheduler is not None else _current_lr(state)
        training_log.append([epoch, loss, lr, val_loss])
        write_training_log(training_log, training_log_filename)
        metric_history = np.asarray(training_log, dtype=np.float64)[:, metric_col]
        min_epoch = (-1 if np.all(np.isnan(metric_history))
                     else int(np.nanargmin(metric_history)))

        if scheduler is not None:
            if isinstance(scheduler, ReduceLROnPlateau):
                scheduler.step(val_loss if validation_loader is not None else loss)
            else:
                scheduler.step()
            state = set_state_learning_rate(state, scheduler.lr)

        # checkpoint family (`train.py:85-103`)
        if str(model_filename).endswith(".orbax"):
            save_checkpoint(_state_variables_device(state), model_filename)
        else:
            save_checkpoint(_state_variables(state), model_filename)
        if save_optimizer:
            save_opt_state(jax.device_get(state.opt_state), optimizer_filename)
        if save_best and min_epoch == len(training_log) - 1:
            forced_copy(model_filename, append_to_filename(model_filename, "best"))
        if save_every_n_epochs and (epoch % save_every_n_epochs) == 0:
            forced_copy(model_filename, append_to_filename(model_filename, epoch))
        if save_last_n_models is not None and save_last_n_models > 1:
            if not save_every_n_epochs or ((epoch - save_last_n_models)
                                           % save_every_n_epochs) != 0:
                remove_file(append_to_filename(model_filename, epoch - save_last_n_models))
            forced_copy(model_filename, append_to_filename(model_filename, epoch))
    # callers read model_filename right after (post-train inference, tests);
    # a no-op unless the orbax backend has a save in flight
    from unet3d_tpu.train.checkpoint_orbax import wait_for_saves
    wait_for_saves()
    return state


def _current_lr(state: TrainState) -> float:
    try:
        return float(state.opt_state.hyperparams["learning_rate"])
    except (AttributeError, KeyError):
        return float("nan")
