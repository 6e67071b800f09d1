"""Label-map <-> one-hot codec, including grouped labels and hierarchy decode.

TPU-native re-implementation of `unet3d/utils/one_hot.py:7-168` and the transform
wrapper `unet3d/transforms/one_hot.py:7-30`. Everything is jit-compatible: label
values come from the (static) config, so channel construction unrolls at trace time
into vectorized compares; decode is masked argmax + table lookup.

Layout: channel-first ``(n_labels, D, H, W)``, matching the reference data API.
"""
from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Label = Union[int, float]
Labels = Sequence[Union[Label, Sequence[Label]]]


def _isclose(a: jnp.ndarray, value: float, atol: float = 1e-8, rtol: float = 1e-5) -> jnp.ndarray:
    """Torch-style isclose: |a - b| <= atol + rtol*|b| (`unet3d/utils/one_hot.py:40-43`)."""
    return jnp.abs(a - value) <= (atol + rtol * abs(value))


def label_map_to_one_hot(label_map: jnp.ndarray, labels: Labels = None, n_labels: int = None,
                         dtype=jnp.uint8, round_values: bool = True) -> jnp.ndarray:
    """Encode a label map ``(1, D, H, W)`` or ``(D, H, W)`` into ``(n_labels, D, H, W)``.

    A list entry that is itself a list groups several label values into one channel.
    Parity: `unet3d/utils/one_hot.py:7-37` (round, isclose matching, grouped labels).
    """
    label_map = jnp.asarray(label_map)
    if label_map.ndim == 4:
        if label_map.shape[0] != 1:
            raise ValueError(f"Expected single-channel label map, got shape {label_map.shape}")
        label_map = label_map[0]
    if labels is None:
        if n_labels is None:
            raise ValueError("Provide labels or n_labels")
        labels = list(range(1, n_labels + 1))
    if round_values:
        label_map = jnp.round(label_map.astype(jnp.float32))
    channels = []
    for entry in labels:
        members = entry if isinstance(entry, (list, tuple)) else [entry]
        chan = jnp.zeros(label_map.shape, dtype=jnp.bool_)
        for label in members:
            chan = chan | _isclose(label_map, float(label))
        channels.append(chan)
    return jnp.stack(channels).astype(dtype)


def mask_encoding(one_hot: jnp.ndarray, n_labels: int, threshold: float = 0.5,
                  sum_then_threshold: bool = False) -> jnp.ndarray:
    """Foreground mask over the first ``n_labels`` channels.

    Parity: `unet3d/utils/one_hot.py:77-82`.
    """
    if sum_then_threshold:
        return jnp.sum(one_hot[:n_labels], axis=0) > threshold
    return jnp.any(one_hot[:n_labels] > threshold, axis=0)


def _assign_labels(one_hot: jnp.ndarray, mask: jnp.ndarray, labels: Sequence[Label],
                   dtype=jnp.int16) -> jnp.ndarray:
    """Masked argmax then index->label table lookup (`unet3d/utils/one_hot.py:84-92`)."""
    winner = jnp.argmax(one_hot[: len(labels)], axis=0)
    table = jnp.asarray(np.asarray(labels, dtype=np.float32))
    label_map = jnp.take(table, winner).astype(dtype)
    return jnp.where(mask, label_map, jnp.zeros((), dtype=dtype))


def _decode_hierarchy(one_hot: jnp.ndarray, labels: Sequence[Label], threshold: float,
                      dtype) -> jnp.ndarray:
    """Progressive roi-AND decode for nested hierarchies (e.g. BraTS WT>TC>ET).

    Parity: `unet3d/utils/one_hot.py:101-118`.
    """
    roi = jnp.ones(one_hot.shape[1:], dtype=jnp.bool_)
    label_map = jnp.zeros(one_hot.shape[1:], dtype=dtype)
    for index, label in enumerate(labels):
        roi = roi & (one_hot[index] > threshold)
        label_map = jnp.where(roi, jnp.asarray(label, dtype=dtype), label_map)
    return label_map


def one_hot_to_label_map(one_hot: jnp.ndarray, labels: Labels, threshold: float = 0.5,
                         sum_then_threshold: bool = False, dtype=jnp.int16,
                         label_hierarchy: bool = False) -> jnp.ndarray:
    """Decode ``(n_labels, D, H, W)`` activations into a label map.

    With all-list ``labels``, each group decodes into its own volume and the results
    are stacked channel-first. Parity: `unet3d/utils/one_hot.py:46-74,149-154`.
    """
    one_hot = jnp.asarray(one_hot)
    if label_hierarchy:
        flat = [l[0] if isinstance(l, (list, tuple)) else l for l in labels]
        return _decode_hierarchy(one_hot, flat, threshold, dtype)
    if len(labels) > 0 and all(isinstance(l, (list, tuple)) for l in labels):
        label_maps = []
        i = 0
        for group in labels:
            segment = one_hot[i:i + len(group)]
            mask = mask_encoding(segment, len(group), threshold, sum_then_threshold)
            label_maps.append(_assign_labels(segment, mask, list(group), dtype))
            i += len(group)
        return jnp.stack(label_maps)
    mask = mask_encoding(one_hot, len(labels), threshold, sum_then_threshold)
    return _assign_labels(one_hot, mask, list(labels), dtype)


def binary_erosion_3x3(binary: jnp.ndarray) -> jnp.ndarray:
    """One iteration of 6-connected binary erosion (scipy default structuring element).

    TPU-native min-pool via reduce_window; replaces `scipy.ndimage.binary_erosion`
    at `unet3d/utils/one_hot.py:157-158`.
    """
    b = jnp.asarray(binary, dtype=jnp.bool_)
    # scipy's default structure is the 6-connected cross: erode along each axis.
    out = b
    for axis in range(b.ndim - 3, b.ndim):
        shifted_fwd = jnp.concatenate(
            [jnp.take(b, jnp.arange(1, b.shape[axis]), axis=axis),
             jnp.zeros_like(jnp.take(b, jnp.asarray([0]), axis=axis))], axis=axis)
        shifted_bwd = jnp.concatenate(
            [jnp.zeros_like(jnp.take(b, jnp.asarray([0]), axis=axis)),
             jnp.take(b, jnp.arange(0, b.shape[axis] - 1), axis=axis)], axis=axis)
        out = out & shifted_fwd & shifted_bwd
    return out


def estimate_binary_contour(binary: jnp.ndarray) -> jnp.ndarray:
    """XOR of a mask with its erosion = one-voxel-thick boundary.

    Parity: `unet3d/utils/one_hot.py:157-158`.
    """
    b = jnp.asarray(binary, dtype=jnp.bool_)
    return jnp.logical_xor(b, binary_erosion_3x3(b))


def add_one_hot_encoding_contours(one_hot: jnp.ndarray) -> jnp.ndarray:
    """Append a contour channel per one-hot channel (doubles channel count).

    Parity: `unet3d/utils/one_hot.py:161-168` (pairs with the ``add_contours``
    config flag doubling ``n_outputs`` at `unet3d/scripts/script_utils.py:86-87`).
    """
    one_hot = jnp.asarray(one_hot)
    contours = jax.vmap(lambda c: estimate_binary_contour(c > 0))(one_hot)
    return jnp.concatenate([one_hot, contours.astype(one_hot.dtype)], axis=0)
