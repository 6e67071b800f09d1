"""Whole-volume prediction: forward -> activation -> resample-to-native -> NIfTI.

Parity: `unet3d/predict/volumetric.py:131-177` — no-grad loop over a dataloader,
optional inferer (sliding window), sigmoid/softmax activation, optional
ResampleToMatch back to the original on-disk grid, NIfTI write named after the
source file; returns the written filenames. Honors a model ``test`` forward
variant when present (`unet3d/predict/utils.py:40-50`).
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


from unet3d_tpu.data.image import Volume
from unet3d_tpu.data.io import load_image
from unet3d_tpu.ops.resample import resample_to_img
from unet3d_tpu.train.step import TrainState, to_ndhwc
from unet3d_tpu.utils.validation import validate_batch_item


def make_forward(model, state: TrainState, use_test: bool = False,
                 mesh=None, amp: bool = False) -> Callable:
    """Jitted inference forward over NDHWC inputs.

    With ``mesh``, the input is sharded over the mesh's (data, space) axes and
    the forward runs SPMD across all devices (conv halo exchanges inserted by
    XLA); the caller must pass a state already replicated on the mesh. Falls
    back to the unsharded jit per call when a batch's dims do not divide the
    mesh (NamedSharding requires divisibility).

    ``amp`` runs the forward in bfloat16 (output cast back to f32) — the
    inference analog of the training AMP flag / the reference's fp16 prediction
    cast (`unet3d/predict/volumetric.py:73-74`).
    """
    code = getattr(model.__call__, "__wrapped__", model.__call__).__code__
    # parameters only — co_varnames also lists locals, which falsely matched
    n_params = code.co_argcount + code.co_kwonlyargcount
    supports_test = use_test and "test" in code.co_varnames[:n_params]

    base_variables = {"params": state.params, **state.extra_variables}
    if amp:
        # cast once here, NOT inside forward: the sliding-window inferer calls
        # forward inside a lax.scan, where a per-call cast would re-run for
        # every window
        from unet3d_tpu.train.step import amp_cast
        base_variables = amp_cast(base_variables)

    def forward(x: jnp.ndarray) -> jnp.ndarray:
        if amp:
            x = x.astype(jnp.bfloat16)
        if supports_test:
            out = model.apply(base_variables, x, False, test=True)
        else:
            out = model.apply(base_variables, x, False)  # train positional (remat compat)
        if isinstance(out, tuple):  # VAE family returns (out, mu, logvar)
            out = out[0]
        return out.astype(jnp.float32) if amp else out

    from unet3d_tpu.train.step import tpu_compiler_options
    jitted = jax.jit(forward, compiler_options=tpu_compiler_options())

    def plain(x):
        # under an outer jit (e.g. the sliding-window inferer's program) call
        # the body directly: nested jit + compiler_options is rejected
        return forward(x) if isinstance(x, jax.core.Tracer) else jitted(x)
    if mesh is None:
        return plain

    from jax.sharding import NamedSharding
    from unet3d_tpu.parallel.mesh import ndhwc_batch_spec

    spec = ndhwc_batch_spec(mesh)
    x_sharded = NamedSharding(mesh, spec)
    sharded = jax.jit(forward, in_shardings=(x_sharded,),
                      out_shardings=x_sharded)

    def dispatch(x: jnp.ndarray) -> jnp.ndarray:
        sizes = {"data": x.shape[0], "space": x.shape[1]}
        for axis, dim in sizes.items():
            if axis in mesh.axis_names and dim % mesh.shape[axis] != 0:
                return plain(x)
        return sharded(x)

    return dispatch


def apply_activation(pred: jnp.ndarray, activation: Optional[str]) -> jnp.ndarray:
    """sigmoid / softmax / any jax.numpy or jax.nn function name.

    Parity: `unet3d/predict/volumetric.py:151-156`.
    """
    if activation is None:
        return pred
    if activation == "sigmoid":
        return jax.nn.sigmoid(pred)
    if activation == "softmax":
        return jax.nn.softmax(pred, axis=-1)
    for ns in (jnp, jax.nn):
        fn = getattr(ns, activation, None)
        if fn is not None:
            return fn(pred)
    raise ValueError(f"Unknown activation {activation}")


def _prediction_filename(prediction_dir: str, source) -> str:
    src = source[0] if isinstance(source, (list, tuple)) else source
    basename = os.path.basename(str(src))
    for ext in (".nii.gz", ".nii"):
        if basename.endswith(ext):
            basename = basename[: -len(ext)]
            break
    return os.path.join(prediction_dir, basename + ".nii.gz")


def volumetric_predictions(model, state: TrainState, dataloader, prediction_dir: str,
                           activation: Optional[str] = None, resample: bool = False,
                           interpolation: str = "trilinear",
                           inferer: Optional[Callable] = None,
                           mesh=None, amp: bool = False,
                           forward: Optional[Callable] = None) -> List[str]:
    """Run inference over a loader and write one NIfTI per case.

    Parity: `unet3d/predict/volumetric.py:131-177` (forward / inferer, activation,
    per-item resample back to the native grid with meta from the source file).
    ``mesh`` spreads each forward across the device mesh (data/space axes);
    ``amp`` runs forwards in bfloat16 (activations applied in f32).

    ``forward`` overrides the model/state pair with a prebuilt NDHWC callable —
    the serving path passes an exported StableHLO artifact here
    (`predict/export.py`); ``model``/``state`` may then be None.
    """
    os.makedirs(prediction_dir, exist_ok=True)
    if forward is None:
        if mesh is not None:
            from unet3d_tpu.parallel.mesh import replicate_state
            state = replicate_state(state, mesh)
        # the reference's volumetric path always calls model(x) — its `test`
        # forward variant belongs to the batch-predict helpers only
        # (`unet3d/predict/volumetric.py:148-150` vs `predict/utils.py:40-50`)
        forward = make_forward(model, state, use_test=False, mesh=mesh, amp=amp)
    written: List[str] = []
    for batch in dataloader:
        for key in ("image", "affine", "source_filename"):
            validate_batch_item(batch, key, context="volumetric prediction")
        x = to_ndhwc(jnp.asarray(batch["image"]))
        if inferer is not None:
            pred = inferer(x, forward)
        else:
            pred = forward(x)
        pred = apply_activation(pred.astype(jnp.float32), activation)
        pred_host = np.asarray(pred)  # (B, D, H, W, C)
        for i in range(pred_host.shape[0]):
            item_pred = np.moveaxis(pred_host[i], -1, 0)  # (C, D, H, W)
            affine = np.asarray(batch["affine"][i])
            source = batch["source_filename"][i]
            if resample:
                original = load_image(source, reorder=False)
                item_pred = np.asarray(resample_to_img(
                    item_pred, affine, original.affine, original.spatial_shape,
                    mode=interpolation))
                affine = original.affine
            out_fn = _prediction_filename(prediction_dir, source)
            Volume(data=item_pred, affine=affine).to_filename(out_fn)
            written.append(out_fn)
    return written


def infer_subject_id(filename, all_filenames=None) -> str:
    """Subject id from the path component that differs across cases.

    Parity: `unet3d/predict/utils.py:29-37` (path-diff heuristic); falls back to
    the file's parent directory name.
    """
    fn = filename[0] if isinstance(filename, (list, tuple)) else filename
    parts = os.path.normpath(str(fn)).split(os.sep)
    if all_filenames and len(all_filenames) > 1:
        others = [os.path.normpath(str(f[0] if isinstance(f, (list, tuple)) else f))
                  .split(os.sep) for f in all_filenames]
        for i, part in enumerate(parts):
            values = {o[i] for o in others if len(o) > i}
            if len(values) > 1:
                return part
    return parts[-2] if len(parts) >= 2 else parts[-1]


def predictions_with_tta(model, state: TrainState, x_ndhwc: jnp.ndarray,
                         inferer: Optional[Callable] = None,
                         flip_axes=((1,), (2,), (3,)),
                         amp: bool = False,
                         forward: Optional[Callable] = None) -> jnp.ndarray:
    """Test-time flip averaging on device (framework extension; the reference's
    SPPIN container averages fold models, `examples/sppin/process.py:242-263`).

    Pass a prebuilt ``forward`` when calling repeatedly — the sliding-window
    inferer caches its compiled program per network object, so rebuilding the
    forward every call forces a re-jit."""
    if forward is None:
        forward = make_forward(model, state, amp=amp)
    run = (lambda z: inferer(z, forward)) if inferer is not None else forward
    out = run(x_ndhwc)
    n = 1
    for axes in flip_axes:
        flipped = jnp.flip(x_ndhwc, axis=axes)
        out = out + jnp.flip(run(flipped), axis=axes)
        n += 1
    return out / n
