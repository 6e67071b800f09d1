"""Sliding-window inference as a jitted on-device scan with overlap blending.

TPU-native equivalent of ``monai.inferers.SlidingWindowInferer``, which the
reference resolves by config name (`unet3d/scripts/script_utils.py:290-293`) and
threads through validation (`unet3d/train/training_utils.py:106-108`) and
prediction (`unet3d/predict/volumetric.py:147-150`).

Design: the patch grid is computed statically from shapes (XLA needs static
slice counts), patches are gathered with ``lax.dynamic_slice``, run through the
network ``sw_batch_size`` at a time inside ``lax.scan`` (so the network compiles
once per window shape), weighted by a constant or gaussian importance map, and
accumulated with ``lax.dynamic_update_slice``. Everything stays in HBM — no
host round-trips per window.
"""
from __future__ import annotations


from collections import OrderedDict
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _scan_interval(image_size, roi_size, overlap: float) -> Tuple[int, ...]:
    interval = []
    for i, r in zip(image_size, roi_size):
        if r == i:
            interval.append(int(r))
        else:
            interval.append(int(max(r * (1.0 - overlap), 1)))
    return tuple(interval)


def dense_patch_slices(image_size, roi_size, interval) -> np.ndarray:
    """Start indices of the dense patch grid (MONAI-compatible coverage)."""
    starts = []
    for size, roi, step in zip(image_size, roi_size, interval):
        if size <= roi:
            axis_starts = [0]
        else:
            n = int(np.ceil((size - roi) / step)) + 1
            axis_starts = [min(i * step, size - roi) for i in range(n)]
            # dedupe while keeping order
            axis_starts = sorted(set(axis_starts))
        starts.append(axis_starts)
    grid = np.stack(np.meshgrid(*starts, indexing="ij"), axis=-1).reshape(-1, 3)
    return grid.astype(np.int32)


def gaussian_importance_map(roi_size, sigma_scale: float = 0.125) -> np.ndarray:
    """MONAI gaussian blending map: centered gaussian, sigma = sigma_scale * size."""
    grids = []
    for s in roi_size:
        x = np.arange(s, dtype=np.float64)
        center = (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1e-6)
        grids.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    m = grids[0][:, None, None] * grids[1][None, :, None] * grids[2][None, None, :]
    m = m / m.max()
    return np.clip(m, np.finfo(np.float32).tiny, None).astype(np.float32)


class SlidingWindowInferer:
    """Callable ``inferer(inputs_ndhwc, network) -> ndhwc output``.

    MONAI-config-compatible constructor kwargs: roi_size, sw_batch_size, overlap,
    mode ('constant' | 'gaussian'), sigma_scale, padding_mode, cval.
    """

    def __init__(self, roi_size: Sequence[int], sw_batch_size: int = 1,
                 overlap: float = 0.25, mode: str = "constant",
                 sigma_scale: float = 0.125, padding_mode: str = "constant",
                 cval: float = 0.0, progress: bool = False):
        self.roi_size = tuple(int(r) for r in roi_size)
        self.sw_batch_size = int(sw_batch_size)
        self.overlap = float(overlap)
        self.mode = mode
        self.sigma_scale = sigma_scale
        self.padding_mode = padding_mode
        self.cval = cval
        # LRU of jitted programs keyed on the network object. Bounded so a
        # long-lived service cycling through many network objects doesn't pin
        # them (each entry holds a strong ref to its network for id() safety).
        self._jitted: OrderedDict = OrderedDict()
        self._jitted_capacity = 8
        del progress

    def __call__(self, inputs: jnp.ndarray, network: Callable) -> jnp.ndarray:
        # One jitted program per network: re-tracing the eager scan on every
        # call rebuilds its closure constants (importance map, start grid),
        # which defeats the compile cache — on the remote-compile TPU path
        # that recompiled the whole window scan per case (measured 113 s/case
        # vs 0.9 s compiled). jax.jit keys the rest on input shape.
        if isinstance(inputs, jax.core.Tracer):
            # already under an outer jit (eval-with-inferer): nesting another
            # jit would re-trace anyway and compiler_options reject nesting
            return sliding_window_inference(
                inputs, network, roi_size=self.roi_size,
                sw_batch_size=self.sw_batch_size, overlap=self.overlap,
                mode=self.mode, sigma_scale=self.sigma_scale,
                padding_mode=self.padding_mode, cval=self.cval)
        key = id(network)
        if key in self._jitted:
            self._jitted.move_to_end(key)
        else:
            def run(x, _network=network):
                return sliding_window_inference(
                    x, _network, roi_size=self.roi_size,
                    sw_batch_size=self.sw_batch_size, overlap=self.overlap,
                    mode=self.mode, sigma_scale=self.sigma_scale,
                    padding_mode=self.padding_mode, cval=self.cval)
            # hold a strong ref to network so id() can't be recycled
            from unet3d_tpu.train.step import tpu_compiler_options
            self._jitted[key] = (
                jax.jit(run, compiler_options=tpu_compiler_options()), network)
            while len(self._jitted) > self._jitted_capacity:
                self._jitted.popitem(last=False)
        return self._jitted[key][0](inputs)


class SimpleInferer:
    """Direct forward (monai.inferers.SimpleInferer parity)."""

    def __call__(self, inputs: jnp.ndarray, network: Callable) -> jnp.ndarray:
        return network(inputs)


# torch F.pad mode names (monai PytorchPadMode) -> jnp.pad modes
_PAD_MODES = {"constant": "constant", "reflect": "reflect",
              "replicate": "edge", "circular": "wrap"}


def sliding_window_inference(inputs: jnp.ndarray, network: Callable,
                             roi_size: Sequence[int], sw_batch_size: int = 1,
                             overlap: float = 0.25, mode: str = "constant",
                             sigma_scale: float = 0.125,
                             padding_mode: str = "constant",
                             cval: float = 0.0) -> jnp.ndarray:
    """Batched scan over the dense patch grid with overlap blending (NDHWC)."""
    batch, *spatial, channels = inputs.shape
    roi_size = tuple(int(r) for r in roi_size)
    if padding_mode not in _PAD_MODES:
        raise ValueError(
            f"padding_mode {padding_mode!r} is not supported; "
            f"expected one of {sorted(_PAD_MODES)} (torch F.pad names)")
    # pad up to roi where the volume is smaller
    pads = [(0, 0)]
    padded_spatial = []
    for s, r in zip(spatial, roi_size):
        pad = max(r - s, 0)
        pads.append((pad // 2, pad - pad // 2))
        padded_spatial.append(s + pad)
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        jnp_mode = _PAD_MODES[padding_mode]
        if jnp_mode == "constant":
            inputs = jnp.pad(inputs, pads, constant_values=cval)
        else:
            inputs = jnp.pad(inputs, pads, mode=jnp_mode)

    interval = _scan_interval(padded_spatial, roi_size, overlap)
    starts = dense_patch_slices(padded_spatial, roi_size, interval)  # (P, 3)
    n_patches = starts.shape[0]
    pad_to = int(np.ceil(n_patches / sw_batch_size)) * sw_batch_size
    # grid padding repeats the last window to fill the final group; padded
    # entries are masked out of BOTH accumulators below (a duplicated window
    # would otherwise bias the weighted blend toward it in overlap regions)
    valid = np.ones((pad_to,), np.float32)
    if pad_to != n_patches:
        starts = np.concatenate([starts,
                                 np.repeat(starts[-1:], pad_to - n_patches, axis=0)])
        valid[n_patches:] = 0.0
    starts_groups = jnp.asarray(starts.reshape(-1, sw_batch_size, 3))
    valid_groups = jnp.asarray(valid.reshape(-1, sw_batch_size))

    if mode == "gaussian":
        importance = jnp.asarray(gaussian_importance_map(roi_size, sigma_scale))
    else:
        importance = jnp.ones(roi_size, dtype=jnp.float32)
    imp = importance[None, :, :, :, None]

    def gather_window(start):
        return jax.lax.dynamic_slice(
            inputs, (0, start[0], start[1], start[2], 0),
            (batch,) + roi_size + (channels,))

    sw = int(starts_groups.shape[1])

    def scan_body(carry, group):
        out_sum, weight_sum = carry
        group_starts, group_valid = group
        # Stack sw_batch_size windows into ONE network call (MONAI semantics:
        # better MXU utilization for small ROIs than one window at a time).
        patches = jax.vmap(gather_window)(group_starts)  # (sw, B, *roi, C)
        stacked = patches.reshape((sw * batch,) + roi_size + (channels,))
        outs = network(stacked).astype(jnp.float32)
        outs = outs.reshape((sw, batch) + roi_size + (outs.shape[-1],)) * imp

        def scatter_add(c, start_out):
            o_sum, w_sum = c
            start, out, v = start_out
            o_sum = jax.lax.dynamic_update_slice(
                o_sum, jax.lax.dynamic_slice(
                    o_sum, (0, start[0], start[1], start[2], 0),
                    out.shape) + out * v,
                (0, start[0], start[1], start[2], 0))
            w_sum = jax.lax.dynamic_update_slice(
                w_sum, jax.lax.dynamic_slice(
                    w_sum, (0, start[0], start[1], start[2], 0),
                    imp.shape) + imp * v,
                (0, start[0], start[1], start[2], 0))
            return (o_sum, w_sum), None

        (out_sum, weight_sum), _ = jax.lax.scan(scatter_add,
                                                (out_sum, weight_sum),
                                                (group_starts, outs,
                                                 group_valid))
        return (out_sum, weight_sum), None

    out_channels = jax.eval_shape(
        lambda x: network(jax.lax.dynamic_slice(
            x, (0, 0, 0, 0, 0), (batch,) + roi_size + (channels,))),
        inputs).shape[-1]
    out_sum = jnp.zeros((batch,) + tuple(padded_spatial) + (out_channels,), jnp.float32)
    weight_sum = jnp.zeros((1,) + tuple(padded_spatial) + (1,), jnp.float32)
    (out_sum, weight_sum), _ = jax.lax.scan(scan_body, (out_sum, weight_sum),
                                            (starts_groups, valid_groups))
    out = out_sum / weight_sum
    # remove padding
    slices = tuple(slice(p[0], p[0] + s) for p, s in zip(pads[1:4], spatial))
    return out[(slice(None),) + slices + (slice(None),)]


INFERER_REGISTRY = {
    "SlidingWindowInferer": SlidingWindowInferer,
    # monai's Adapt variant only adds CPU-fallback device switching, which the
    # buffer-donating TPU path handles internally — same semantics here
    "SlidingWindowInfererAdapt": SlidingWindowInferer,
    "SimpleInferer": SimpleInferer,
}


def build_inferer(name: str, **kwargs):
    """Parity: `unet3d/scripts/script_utils.py:290-293` (getattr monai.inferers)."""
    if name not in INFERER_REGISTRY:
        raise ValueError(f"Inferer {name} is not supported")
    return INFERER_REGISTRY[name](**kwargs)
