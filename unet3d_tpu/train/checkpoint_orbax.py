"""Orbax checkpoint backend (opt-in): async, multi-host-sharded saves.

The default flat-npz backend (train/checkpoint.py) gathers every leaf to the
host before writing — correct on one process, but on a multi-host mesh
(doc/MultiHost.md) globally-sharded ``jax.Array`` leaves are not fully
addressable from any single process and the gather raises. Orbax writes each
process's shards in parallel from device memory and, through
``AsyncCheckpointer``, overlaps serialization with the next epoch's compute
(the device->host snapshot is taken synchronously before ``save`` returns, so
donated TrainState buffers may be reused immediately).

Opt-in via ``{"training": {"checkpoint_backend": "orbax"}}`` in the config
(scripts/train.py then names the checkpoint ``model.orbax`` instead of
``model.npz``) or by passing an ``.orbax`` model filename to the CLIs; the
reference has no analog (torch.save is host-gathered and synchronous,
`unet3d/train.py:85-103`).

Checkpoints are directories; ``train/checkpoint.py``'s ``load_checkpoint``
dispatches here for any directory path, so the flexible/strict load surgery,
predict CLI, and resume flows work unchanged.
"""
from __future__ import annotations

import os
import threading
from typing import Dict

import jax
import numpy as np

_LOCK = threading.Lock()
_CHECKPOINTER = None  # lazy singleton; AsyncCheckpointer owns a thread pool


def _checkpointer():
    global _CHECKPOINTER
    with _LOCK:
        if _CHECKPOINTER is None:
            import logging as _logging

            import orbax.checkpoint as ocp
            # orbax logs ~30 INFO lines per save through the absl logger,
            # drowning the trainer's epoch output; warnings still surface
            _logging.getLogger("absl").setLevel(
                max(_logging.WARNING, _logging.getLogger("absl").level))
            _CHECKPOINTER = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        return _CHECKPOINTER


def is_orbax_path(path: str) -> bool:
    """True for the .orbax naming convention, or a directory that actually
    looks like an orbax checkpoint (StandardCheckpointHandler layout or the
    _CHECKPOINT_METADATA marker). Probing — instead of treating ANY directory
    as a checkpoint — keeps ``load_checkpoint`` on a mistaken directory path
    raising a clear "not a checkpoint" error rather than an orbax internal."""
    path = str(path)
    if path.endswith(".orbax"):
        return True
    if not os.path.isdir(path):
        return False
    # orbax-specific markers only: generic names like "checkpoint" or "d"
    # appear in ordinary work dirs and would misroute them into orbax (the
    # confusing-internal-error this probe exists to prevent). These cover
    # StandardCheckpointHandler/ocdbt layouts across orbax versions.
    if any(os.path.exists(os.path.join(path, marker)) for marker in
           ("_CHECKPOINT_METADATA", "_METADATA", "manifest.ocdbt")):
        return True
    import glob
    return bool(glob.glob(os.path.join(path, "ocdbt.process_*")))


def save_checkpoint_orbax(variables: Dict, path: str) -> None:
    """Async save of the variable pytree; returns once device buffers are
    snapshotted (safe against donation), serialization continues in the
    background — call :func:`wait_for_saves` before reading/copying ``path``.

    Leaves may be jax.Arrays (multi-host: each process writes only its own
    shards) or numpy arrays.
    """
    import orbax.checkpoint as ocp
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # one in-flight save per process keeps ordering
    ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(variables),
               force=True)


def load_checkpoint_orbax(path: str) -> Dict:
    """Restore the pytree as host numpy arrays (single- and multi-host; callers
    re-shard at init time through the existing load_into/mesh flows)."""
    import logging as _logging
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    # the argless restore warns that no target topology was provided; the
    # callers run the flexible/strict shape surgery (checkpoint.load_into)
    # on the result, which is exactly the safety the warning asks for
    absl = _logging.getLogger("absl")
    level = absl.level
    absl.setLevel(_logging.ERROR)
    try:
        restored = ckptr.restore(os.path.abspath(path))
    finally:
        absl.setLevel(level)
    return jax.tree_util.tree_map(np.asarray, restored)


def wait_for_saves() -> None:
    """Block until every async save issued by this process has landed."""
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()
