"""Intensity-normalization menu, jit-compatible.

TPU-native re-implementation of the reference's normalization library
(`unet3d/utils/normalize.py`) plus the MONAI-named normalizer the example configs
use (``NormalizeIntensityD`` with ``channel_wise``/``nonzero`` kwargs,
`examples/brats2020/brats2020_config.json` dataset section). All functions take
channel-first ``(C, D, H, W)`` arrays and are pure jnp (no host sync), so the data
pipeline can fuse them with augmentation under one jit.

Std conventions: torch ``.std()`` is unbiased (ddof=1); the reference uses it in
``zero_mean`` and foreground z-score, so we match with the Bessel correction.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def _unbiased_std(x, axis=None, keepdims=False, where=None):
    if where is None:
        n = jnp.prod(jnp.asarray([x.shape[a] for a in (axis if isinstance(axis, tuple) else (axis,))])) \
            if axis is not None else x.size
        var = jnp.var(x, axis=axis, keepdims=keepdims)
    else:
        n = jnp.sum(where, axis=axis, keepdims=keepdims)
        mean = jnp.sum(jnp.where(where, x, 0.0), axis=axis, keepdims=keepdims) / n
        var = jnp.sum(jnp.where(where, (x - mean) ** 2, 0.0), axis=axis, keepdims=keepdims) / n
    return jnp.sqrt(var * (n / jnp.maximum(n - 1, 1)))


def zero_mean(data: jnp.ndarray, axis: Tuple[int, ...] = (1, 2, 3)) -> jnp.ndarray:
    """Per-channel z-score (`unet3d/utils/normalize.py:6-9`)."""
    data = jnp.asarray(data, dtype=jnp.float32)
    mean = jnp.mean(data, axis=axis, keepdims=True)
    std = _unbiased_std(data, axis=axis, keepdims=True)
    return (data - mean) / std


def normalize_intensity(data: jnp.ndarray, subtrahend=None, divisor=None,
                        nonzero: bool = False, channel_wise: bool = False) -> jnp.ndarray:
    """MONAI ``NormalizeIntensity`` semantics (the config-default normalizer).

    z-score over the whole array or per channel; with ``nonzero`` the statistics
    and the update are restricted to nonzero voxels. Matches
    ``monai.transforms.NormalizeIntensityD`` as configured at
    `examples/brats2020/brats2020_config.json` ("channel_wise": true, "nonzero": false).
    """
    data = jnp.asarray(data, dtype=jnp.float32)
    axis = tuple(range(1, data.ndim)) if channel_wise else None
    where = (data != 0) if nonzero else None
    if subtrahend is None:
        if where is None:
            sub = jnp.mean(data, axis=axis, keepdims=True)
        else:
            cnt = jnp.maximum(jnp.sum(where, axis=axis, keepdims=True), 1)
            sub = jnp.sum(jnp.where(where, data, 0.0), axis=axis, keepdims=True) / cnt
    else:
        sub = jnp.asarray(subtrahend, dtype=jnp.float32)
        if channel_wise and sub.ndim == 1:
            sub = sub.reshape((-1,) + (1,) * (data.ndim - 1))
    if divisor is None:
        if where is None:
            div = jnp.std(data, axis=axis, keepdims=True)
        else:
            cnt = jnp.maximum(jnp.sum(where, axis=axis, keepdims=True), 1)
            mean = jnp.sum(jnp.where(where, data, 0.0), axis=axis, keepdims=True) / cnt
            div = jnp.sqrt(jnp.sum(jnp.where(where, (data - mean) ** 2, 0.0),
                                   axis=axis, keepdims=True) / cnt)
    else:
        div = jnp.asarray(divisor, dtype=jnp.float32)
        if channel_wise and div.ndim == 1:
            div = div.reshape((-1,) + (1,) * (data.ndim - 1))
    div = jnp.where(div == 0, 1.0, div)
    normed = (data - sub) / div
    if nonzero:
        return jnp.where(where, normed, data)
    return normed


def _rescale_array(arr: jnp.ndarray, minv, maxv) -> jnp.ndarray:
    """MONAI ``rescale_array``: min->minv, max->maxv. When ``minv`` or
    ``maxv`` is None the bare 0-1 norm is returned (MONAI ignores the other
    bound). Degenerate arrays (min == max) return ``arr * minv`` — or ``arr``
    unchanged when ``minv`` is None."""
    mina = jnp.min(arr)
    maxa = jnp.max(arr)
    degenerate = arr if minv is None else arr * float(minv)
    norm = (arr - mina) / jnp.where(maxa == mina, 1.0, maxa - mina)
    if minv is None or maxv is None:
        scaled = norm
    else:
        scaled = norm * (float(maxv) - float(minv)) + float(minv)
    return jnp.where(maxa == mina, degenerate, scaled)


def scale_intensity(data: jnp.ndarray, minv=0.0, maxv=1.0, factor=None,
                    channel_wise: bool = False) -> jnp.ndarray:
    """MONAI ``ScaleIntensity``: rescale to [minv, maxv], or — when minv and
    maxv are both None — multiply by ``1 + factor``."""
    data = jnp.asarray(data, dtype=jnp.float32)
    if minv is not None or maxv is not None:
        if channel_wise:
            return jnp.stack([_rescale_array(data[c], minv, maxv)
                              for c in range(data.shape[0])])
        return _rescale_array(data, minv, maxv)
    if factor is None:
        raise ValueError("scale_intensity: incompatible values: "
                         "minv=None, maxv=None and factor=None")
    return data * (1.0 + float(factor))


def scale_intensity_range(data: jnp.ndarray, a_min: float, a_max: float,
                          b_min=None, b_max=None,
                          clip: bool = False) -> jnp.ndarray:
    """MONAI ``ScaleIntensityRange``: map [a_min, a_max] -> [b_min, b_max]
    linearly; a degenerate input range shifts by ``-a_min (+ b_min)``."""
    data = jnp.asarray(data, dtype=jnp.float32)
    if float(a_max) - float(a_min) == 0.0:
        out = data - a_min
        if b_min is not None:
            out = out + b_min
    else:
        out = (data - a_min) / (float(a_max) - float(a_min))
        if b_min is not None and b_max is not None:
            out = out * (float(b_max) - float(b_min)) + b_min
    if clip:
        out = jnp.clip(out, b_min, b_max)
    return out


def scale_intensity_range_percentiles(data: jnp.ndarray, lower: float,
                                      upper: float, b_min, b_max,
                                      clip: bool = False,
                                      relative: bool = False,
                                      channel_wise: bool = False) -> jnp.ndarray:
    """MONAI ``ScaleIntensityRangePercentiles``: like scale_intensity_range
    with a_min/a_max at the lower/upper intensity percentiles; ``relative``
    scales the output window to the percentile span first."""
    if not 0.0 <= lower <= 100.0 or not 0.0 <= upper <= 100.0:
        raise ValueError("Percentiles must be in the range [0, 100]")
    data = jnp.asarray(data, dtype=jnp.float32)

    def one(img):
        a_min = jnp.percentile(img, lower)
        a_max = jnp.percentile(img, upper)
        lo, hi = b_min, b_max
        if relative:
            if b_min is None or b_max is None:
                raise ValueError("If it is relative, b_min and b_max "
                                 "should not be None.")
            lo = (b_max - b_min) * (lower / 100.0) + b_min
            hi = (b_max - b_min) * (upper / 100.0) + b_min
        # inline scale_intensity_range with traced a_min/a_max
        rng = a_max - a_min
        out = (img - a_min) / jnp.where(rng == 0, 1.0, rng)
        if lo is not None and hi is not None:
            out = out * (float(hi) - float(lo)) + lo
        degenerate = img - a_min + (lo if lo is not None else 0.0)
        out = jnp.where(rng == 0, degenerate, out)
        if clip:
            out = jnp.clip(out, lo, hi)
        return out

    if channel_wise:
        return jnp.stack([one(data[c]) for c in range(data.shape[0])])
    return one(data)


def threshold_intensity(data: jnp.ndarray, threshold: float,
                        above: bool = True, cval: float = 0.0) -> jnp.ndarray:
    """MONAI ``ThresholdIntensity``: keep voxels strictly above (or below)
    ``threshold``, set the rest to ``cval``."""
    data = jnp.asarray(data, dtype=jnp.float32)
    mask = data > threshold if above else data < threshold
    return jnp.where(mask, data, cval)


def shift_intensity(data: jnp.ndarray, offset: float) -> jnp.ndarray:
    """MONAI ``ShiftIntensity``: add a fixed offset."""
    return jnp.asarray(data, dtype=jnp.float32) + float(offset)


def percentile_window(data: jnp.ndarray, floor_percentile: float = 5,
                      ceiling_percentile: float = 95) -> jnp.ndarray:
    """Clamp to per-channel percentile window (`unet3d/utils/normalize.py:16-20`)."""
    data = jnp.asarray(data, dtype=jnp.float32)
    flat = data.reshape(data.shape[0], -1)
    floor = jnp.percentile(flat, floor_percentile, axis=1).reshape(-1, 1, 1, 1)
    ceiling = jnp.percentile(flat, ceiling_percentile, axis=1).reshape(-1, 1, 1, 1)
    return jnp.clip(data, floor, ceiling)


def foreground_zero_mean_normalize_image_data(data: jnp.ndarray, background_value: float = 0,
                                              tolerance: float = 1e-5) -> jnp.ndarray:
    """Per-channel z-score over |x| > background+tol voxels only; background untouched.

    Parity: `unet3d/utils/normalize.py:23-43`.
    """
    data = jnp.asarray(data, dtype=jnp.float32)
    axis = tuple(range(1, data.ndim))
    fg = jnp.abs(data) > (background_value + tolerance)
    cnt = jnp.maximum(jnp.sum(fg, axis=axis, keepdims=True), 1)
    mean = jnp.sum(jnp.where(fg, data, 0.0), axis=axis, keepdims=True) / cnt
    var = jnp.sum(jnp.where(fg, (data - mean) ** 2, 0.0), axis=axis, keepdims=True) / cnt
    std = jnp.sqrt(var * (cnt / jnp.maximum(cnt - 1, 1)))
    return jnp.where(fg, (data - mean) / std, data)


def window_data(data: jnp.ndarray, floor_threshold, ceiling_threshold,
                floor: float = 0, ceiling: float = 1) -> jnp.ndarray:
    """Linear window then clamp (`unet3d/utils/normalize.py:136-142`)."""
    data = (jnp.asarray(data, dtype=jnp.float32) - floor_threshold) / (
        ceiling_threshold - floor_threshold)
    return jnp.clip(data, floor, ceiling)


def radiology_style_windowing(data: jnp.ndarray, l: float, w: float,
                              floor: float = 0, ceiling: float = 1) -> jnp.ndarray:
    """Level/width CT windowing (`unet3d/utils/normalize.py:130-133`)."""
    return window_data(data, l - w / 2, l + w / 2, floor=floor, ceiling=ceiling)


def static_windows(data: jnp.ndarray, windows: Sequence[Sequence[float]],
                   floor: float = 0, ceiling: float = 1) -> jnp.ndarray:
    """Stack several predefined CT windows in the leading channel dimension.

    Parity: `unet3d/utils/normalize.py:112-127` (reference stacks in the *final*
    dimension of a squeezed volume; channel-first is our layout convention).
    """
    data = jnp.asarray(data, dtype=jnp.float32)
    squeezed = data[0] if (data.ndim == 4 and data.shape[0] == 1) else data
    return jnp.stack([radiology_style_windowing(squeezed, l, w, floor, ceiling)
                      for (l, w) in windows])


def zero_floor_normalize_image_data(data: jnp.ndarray, floor_percentile: float = 1,
                                    floor: float = 0) -> jnp.ndarray:
    """Shift per-channel floor percentile to ``floor`` then divide by channel std.

    Behavioral intent of `unet3d/utils/normalize.py:46-58` (that code calls the
    nonexistent ``torch.percentile``; the documented semantics are implemented here).
    """
    data = jnp.asarray(data, dtype=jnp.float32)
    flat = data.reshape(data.shape[0], -1)
    floor_threshold = jnp.percentile(flat, floor_percentile, axis=1).reshape(-1, 1, 1, 1)
    background = data <= floor_threshold
    data = jnp.where(background, floor, data - floor_threshold)
    std = _unbiased_std(data, axis=(1, 2, 3), keepdims=True)
    return data / std


def zero_one_window(data: jnp.ndarray, ceiling_percentile: float = 99,
                    floor_percentile: float = 1, floor: float = 0,
                    ceiling: float = 1) -> jnp.ndarray:
    """Per-channel [floor, ceiling] window: floor at the image percentile, ceiling at
    the foreground percentile. Parity: `unet3d/utils/normalize.py:61-99`.
    """
    data = jnp.asarray(data, dtype=jnp.float32)
    flat = data.reshape(data.shape[0], -1)
    floor_threshold = jnp.percentile(flat, floor_percentile, axis=1).reshape(-1, 1, 1, 1)
    fg = data > floor_threshold
    # Foreground percentile via masked quantile: push background to +inf and take the
    # quantile over the foreground count.
    out = []
    for c in range(data.shape[0]):
        chan = data[c]
        mask = fg[c]
        n_fg = jnp.sum(mask)
        vals = jnp.where(mask, chan, jnp.inf).ravel()
        vals = jnp.sort(vals)
        # index of the percentile within the foreground values (linear
        # interpolation). Degenerate cases would otherwise produce NaN from
        # inf sentinels (0*inf when frac==0 with vals[hi]=inf; inf-inf when
        # the channel has no foreground at all):
        pos = (ceiling_percentile / 100.0) * jnp.maximum(n_fg - 1, 0)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, vals.size - 1)
        hi = jnp.clip(lo + 1, 0, vals.size - 1)
        frac = pos - lo
        ceiling_threshold = jnp.where(
            frac > 0, vals[lo] * (1 - frac) + vals[hi] * frac, vals[lo])
        # no foreground above the floor: window to the channel max instead
        ceiling_threshold = jnp.where(jnp.isfinite(ceiling_threshold),
                                      ceiling_threshold, jnp.max(chan))
        out.append(window_data(chan, floor_threshold[c, 0, 0, 0], ceiling_threshold,
                               floor=floor, ceiling=ceiling))
    return jnp.stack(out)


def hist_match(source: jnp.ndarray, template: jnp.ndarray) -> jnp.ndarray:
    """Histogram matching via empirical CDF interpolation.

    Parity: `unet3d/utils/normalize.py:145-185`. The reference builds the CDF
    over UNIQUE source values (cumsum of counts), so tied voxels share one
    quantile; searchsorted(side="right") reproduces exactly that (rank-based
    argsort(argsort) would spread ties across the tie's quantile range).
    """
    source = jnp.asarray(source, dtype=jnp.float32)
    template = jnp.asarray(template, dtype=jnp.float32)
    shape = source.shape
    src = source.ravel()
    tmpl = jnp.sort(template.ravel())
    sorted_src = jnp.sort(src)
    s_quantiles = jnp.searchsorted(sorted_src, src,
                                   side="right").astype(jnp.float32) / src.size
    t_quantiles = jnp.arange(1, tmpl.size + 1, dtype=jnp.float32) / tmpl.size
    matched = jnp.interp(s_quantiles, t_quantiles, tmpl)
    return matched.reshape(shape)
