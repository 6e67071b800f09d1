"""Loss registry: Dice family, focal, cross-entropy, regression losses.

The reference resolves loss names through unet3d.losses -> torch.nn ->
monai.losses (`unet3d/scripts/script_utils.py:61-77`), so both torch names
(``MSELoss``, ``CrossEntropyLoss``) and MONAI names (``DiceLoss``,
``GeneralizedDiceLoss``) are public API. This module implements that whole menu
natively in jnp with MONAI's numerics (smooth terms, include_background, batch,
sigmoid/softmax flags).

Layout: channel-LAST ``(N, ..., C)`` — the on-device layout. Targets are one-hot
(or continuous for regression).

Mixed precision: the train step hands losses the raw (possibly bf16) network
output — casting the full 128^3 volume to f32 first costs ~2.2 ms/step
(tools/microbench_r3.py). The Dice family therefore keeps elementwise products
in the input dtype and accumulates every reduction in f32 (`_sum32`); losses
with transcendentals (focal/CE/BCE) upcast at entry instead. This mirrors the
reference's AMP semantics, where the criterion runs inside autocast
(`unet3d/train/training_utils.py:93-98`).
"""
from __future__ import annotations

from functools import partial

from typing import Callable, Optional

import jax
import jax.numpy as jnp

_sum32 = partial(jnp.sum, dtype=jnp.float32)


def _f32(pred: jnp.ndarray) -> jnp.ndarray:
    return pred.astype(jnp.float32) if pred.dtype != jnp.float32 else pred


def _apply_activation(pred, sigmoid=False, softmax=False):
    if sigmoid:
        return jax.nn.sigmoid(pred)
    if softmax:
        return jax.nn.softmax(pred, axis=-1)
    return pred


def _drop_background(pred, target, include_background: bool):
    if not include_background and pred.shape[-1] > 1:
        # channel 0 is background by MONAI convention
        return pred[..., 1:], target[..., 1:]
    return pred, target


class DiceLoss:
    """MONAI DiceLoss semantics: 1 - (2|X∩Y| + nr) / (|X| + |Y| + dr), reduced
    over spatial dims (and batch when ``batch=True``), then averaged."""

    def __init__(self, include_background: bool = True, sigmoid: bool = False,
                 softmax: bool = False, squared_pred: bool = False,
                 jaccard: bool = False, batch: bool = False,
                 smooth_nr: float = 1e-5, smooth_dr: float = 1e-5, reduction: str = "mean"):
        self.include_background = include_background
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.squared_pred = squared_pred
        self.jaccard = jaccard
        self.batch = batch
        self.smooth_nr = smooth_nr
        self.smooth_dr = smooth_dr
        self.reduction = reduction

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred = _apply_activation(pred, self.sigmoid, self.softmax)
        pred, target = _drop_background(pred, target, self.include_background)
        target = target.astype(pred.dtype)
        spatial = tuple(range(1, pred.ndim - 1))
        axes = ((0,) + spatial) if self.batch else spatial
        intersection = _sum32(target * pred, axis=axes)
        if self.squared_pred:
            ground = _sum32(target ** 2, axis=axes)
            prediction = _sum32(pred ** 2, axis=axes)
        else:
            ground = _sum32(target, axis=axes)
            prediction = _sum32(pred, axis=axes)
        denominator = ground + prediction
        if self.jaccard:
            denominator = 2.0 * (denominator - intersection)
        score = (2.0 * intersection + self.smooth_nr) / (denominator + self.smooth_dr)
        loss = 1.0 - score
        if self.reduction == "none":
            return loss
        if self.reduction == "sum":
            return jnp.sum(loss)
        return jnp.mean(loss)


class GeneralizedDiceLoss:
    """MONAI GeneralizedDiceLoss with w_type='square' default."""

    def __init__(self, include_background: bool = True, sigmoid: bool = False,
                 softmax: bool = False, w_type: str = "square", batch: bool = False,
                 smooth_nr: float = 1e-5, smooth_dr: float = 1e-5, reduction: str = "mean"):
        self.include_background = include_background
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.w_type = w_type
        self.batch = batch
        self.smooth_nr = smooth_nr
        self.smooth_dr = smooth_dr
        self.reduction = reduction

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred = _apply_activation(pred, self.sigmoid, self.softmax)
        pred, target = _drop_background(pred, target, self.include_background)
        target = target.astype(pred.dtype)
        spatial = tuple(range(1, pred.ndim - 1))
        axes = ((0,) + spatial) if self.batch else spatial
        intersection = _sum32(target * pred, axis=axes)
        ground = _sum32(target, axis=axes)
        prediction = _sum32(pred, axis=axes)
        if self.w_type == "simple":
            w = jnp.reciprocal(ground)
        elif self.w_type == "uniform":
            w = jnp.ones_like(ground)
        else:  # square
            w = jnp.reciprocal(ground * ground)
        # Empty classes get w=inf; MONAI replaces inf with the PER-SAMPLE max
        # finite weight (max over the class axis, not the whole batch) so
        # absent classes don't dominate the loss.
        finite = jnp.where(jnp.isinf(w), 0.0, w)
        w = jnp.where(jnp.isinf(w), jnp.max(finite, axis=-1, keepdims=True), w)
        class_axis = -1  # remaining axis after reduction is channels (maybe + batch)
        numer = 2.0 * jnp.sum(intersection * w, axis=class_axis) + self.smooth_nr
        denom = jnp.sum((ground + prediction) * w, axis=class_axis) + self.smooth_dr
        loss = 1.0 - numer / denom
        if self.reduction == "none":
            return loss
        if self.reduction == "sum":
            return jnp.sum(loss)
        return jnp.mean(loss)


class FocalLoss:
    """MONAI FocalLoss (binary-CE focal over one-hot channels), gamma=2."""

    def __init__(self, include_background: bool = True, gamma: float = 2.0,
                 alpha: Optional[float] = None, weight=None, reduction: str = "mean",
                 use_softmax: bool = False):
        self.include_background = include_background
        self.gamma = gamma
        self.alpha = alpha
        self.weight = weight
        self.reduction = reduction
        self.use_softmax = use_softmax

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred = _f32(pred)
        pred, target = _drop_background(pred, target, self.include_background)
        target = target.astype(pred.dtype)
        alpha = self.alpha
        if self.use_softmax:
            if not self.include_background and alpha is not None:
                # MONAI nulls alpha here with a warning: after the background
                # drop the 1-alpha factor would mislabel a foreground channel
                import warnings
                warnings.warn("FocalLoss: `include_background=False`, `alpha` "
                              "ignored when using softmax (MONAI semantics).")
                alpha = None
            logp = jax.nn.log_softmax(pred, axis=-1)
            p = jnp.exp(logp)
            loss = -target * ((1 - p) ** self.gamma) * logp
            if alpha is not None:
                # MONAI weights the first (background) channel by 1-alpha and
                # the rest by alpha (monai FocalLoss softmax_focal_loss).
                n = pred.shape[-1]
                alpha_fac = jnp.asarray([1 - alpha] + [alpha] * (n - 1),
                                        dtype=pred.dtype)
                loss = alpha_fac * loss
        else:
            # BCE-with-logits focal: p = sigmoid(x)
            p = jax.nn.sigmoid(pred)
            ce = (jax.nn.softplus(-pred) * target
                  + jax.nn.softplus(pred) * (1.0 - target))
            p_t = p * target + (1 - p) * (1 - target)
            loss = ce * ((1.0 - p_t) ** self.gamma)
            if self.alpha is not None:
                alpha_t = self.alpha * target + (1 - self.alpha) * (1 - target)
                loss = alpha_t * loss
        if self.weight is not None:
            # MONAI per-class weight, broadcast over the channel axis; a
            # sequence must match the post-background-drop channel count
            w = jnp.atleast_1d(jnp.asarray(self.weight, dtype=pred.dtype))
            if w.ndim != 1 or (w.shape[0] not in (1, pred.shape[-1])):
                raise ValueError(
                    f"FocalLoss weight has {w.shape[0]} entries for "
                    f"{pred.shape[-1]} classes (include_background="
                    f"{self.include_background})")
            loss = w * loss
        if self.reduction == "none":
            return loss
        if self.reduction == "sum":
            return jnp.sum(loss)
        return jnp.mean(loss)


class DiceCELoss:
    """MONAI DiceCELoss: weighted sum of DiceLoss and cross-entropy/BCE."""

    def __init__(self, include_background: bool = True, sigmoid: bool = False,
                 softmax: bool = False, squared_pred: bool = False, batch: bool = False,
                 smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                 lambda_dice: float = 1.0, lambda_ce: float = 1.0):
        self.dice = DiceLoss(include_background=include_background, sigmoid=sigmoid,
                             softmax=softmax, squared_pred=squared_pred, batch=batch,
                             smooth_nr=smooth_nr, smooth_dr=smooth_dr)
        self.sigmoid = sigmoid
        self.lambda_dice = lambda_dice
        self.lambda_ce = lambda_ce

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        dice = self.dice(pred, target)
        pred = _f32(pred)
        target_f = target.astype(pred.dtype)
        # MONAI routes the CE leg on CHANNEL COUNT alone (forward:
        # `self.ce(input, target) if input.shape[1] != 1 else self.bce(...)`);
        # the sigmoid/softmax flags shape only the Dice leg. torch
        # CrossEntropyLoss with probability targets is exactly
        # -mean(sum(t * log_softmax)).
        if pred.shape[-1] == 1:
            ce = jnp.mean(jax.nn.softplus(-pred) * target_f
                          + jax.nn.softplus(pred) * (1.0 - target_f))
        else:
            ce = -jnp.mean(jnp.sum(target_f * jax.nn.log_softmax(pred, axis=-1), axis=-1))
        return self.lambda_dice * dice + self.lambda_ce * ce


class DiceFocalLoss:
    """MONAI DiceFocalLoss: weighted sum of DiceLoss and FocalLoss."""

    def __init__(self, include_background: bool = True, sigmoid: bool = False,
                 softmax: bool = False, gamma: float = 2.0, batch: bool = False,
                 lambda_dice: float = 1.0, lambda_focal: float = 1.0):
        self.dice = DiceLoss(include_background=include_background, sigmoid=sigmoid,
                             softmax=softmax, batch=batch)
        self.focal = FocalLoss(include_background=include_background, gamma=gamma,
                               use_softmax=softmax)
        self.lambda_dice = lambda_dice
        self.lambda_focal = lambda_focal

    def __call__(self, pred, target):
        return (self.lambda_dice * self.dice(pred, target)
                + self.lambda_focal * self.focal(pred, target))


class GeneralizedDiceFocalLoss:
    """MONAI GeneralizedDiceFocalLoss: weighted sum of GDL and FocalLoss."""

    def __init__(self, include_background: bool = True, sigmoid: bool = False,
                 softmax: bool = False, w_type: str = "square",
                 gamma: float = 2.0, batch: bool = False,
                 smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
                 lambda_gdl: float = 1.0, lambda_focal: float = 1.0):
        self.gdl = GeneralizedDiceLoss(
            include_background=include_background, sigmoid=sigmoid,
            softmax=softmax, w_type=w_type, batch=batch,
            smooth_nr=smooth_nr, smooth_dr=smooth_dr)
        self.focal = FocalLoss(include_background=include_background,
                               gamma=gamma, use_softmax=softmax)
        self.lambda_gdl = lambda_gdl
        self.lambda_focal = lambda_focal

    def __call__(self, pred, target):
        return (self.lambda_gdl * self.gdl(pred, target)
                + self.lambda_focal * self.focal(pred, target))


class SSIMLoss:
    """MONAI SSIMLoss (3D): 1 - mean SSIM with a gaussian (or uniform) window.

    Inputs are channel-last ``(N, D, H, W, C)`` like every loss here; the
    window convolutions are VALID (MONAI pads nothing), separable, computed
    per channel in f32 on device.
    """

    def __init__(self, spatial_dims: int = 3, data_range: float = 1.0,
                 kernel_type: str = "gaussian", win_size: int = 11,
                 kernel_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
                 reduction: str = "mean"):
        if spatial_dims != 3:
            raise NotImplementedError("unet3d_tpu SSIMLoss is 3D")
        self.data_range = float(data_range)
        self.k1, self.k2 = float(k1), float(k2)
        self.reduction = reduction
        import numpy as np
        if kernel_type == "gaussian":
            half = (win_size - 1) / 2.0
            x = np.arange(win_size, dtype=np.float64) - half
            k = np.exp(-0.5 * (x / kernel_sigma) ** 2)
        elif kernel_type == "uniform":
            k = np.ones(win_size, dtype=np.float64)
        else:
            raise ValueError(f"SSIMLoss kernel_type {kernel_type!r}")
        self._kernel = jnp.asarray((k / k.sum()).astype(np.float32))

    def _window_mean(self, x: jnp.ndarray) -> jnp.ndarray:
        """Separable VALID window mean over the three spatial axes of
        (N, D, H, W, C)."""
        n, d, h, w, c = x.shape
        y = jnp.moveaxis(x, -1, 1).reshape(n * c, d, h, w)
        k = self._kernel
        for axis in (1, 2, 3):
            y = jnp.moveaxis(y, axis, -1)
            y = jax.lax.conv_general_dilated(
                y.reshape(-1, y.shape[-1])[:, None, :],
                k[None, None, :], (1,), "VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
            ).reshape(y.shape[:-1] + (-1,))
            y = jnp.moveaxis(y, -1, axis)
        out_spatial = y.shape[1:]
        return jnp.moveaxis(y.reshape((n, c) + out_spatial), 1, -1)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        win = int(self._kernel.shape[0])
        small = [s for s in pred.shape[1:4] if s < win]
        if small:
            raise ValueError(
                f"SSIMLoss win_size={win} exceeds spatial dims "
                f"{tuple(pred.shape[1:4])}; pass a smaller win_size")
        x = _f32(pred)
        y = target.astype(x.dtype)
        c1 = (self.k1 * self.data_range) ** 2
        c2 = (self.k2 * self.data_range) ** 2
        mu_x = self._window_mean(x)
        mu_y = self._window_mean(y)
        sxx = self._window_mean(x * x) - mu_x * mu_x
        syy = self._window_mean(y * y) - mu_y * mu_y
        sxy = self._window_mean(x * y) - mu_x * mu_y
        ssim = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
            (mu_x * mu_x + mu_y * mu_y + c1) * (sxx + syy + c2))
        return _reduce(1.0 - ssim, self.reduction)


class CrossEntropyLoss:
    """torch.nn.CrossEntropyLoss over one-hot/probability targets (channel-last)."""

    def __init__(self, weight=None, reduction: str = "mean", label_smoothing: float = 0.0):
        self.weight = None if weight is None else jnp.asarray(weight)
        self.reduction = reduction
        self.label_smoothing = label_smoothing

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred = _f32(pred)
        target = target.astype(pred.dtype)
        if self.label_smoothing:
            n = target.shape[-1]
            target = target * (1 - self.label_smoothing) + self.label_smoothing / n
        logp = jax.nn.log_softmax(pred, axis=-1)
        loss = -jnp.sum(target * logp, axis=-1)
        if self.weight is not None:
            w = jnp.sum(target * self.weight, axis=-1)
            if self.reduction == "mean":
                return jnp.sum(loss * w) / jnp.sum(w)
            loss = loss * w
        if self.reduction == "none":
            return loss
        if self.reduction == "sum":
            return jnp.sum(loss)
        return jnp.mean(loss)


class BCEWithLogitsLoss:
    def __init__(self, reduction: str = "mean", pos_weight=None):
        self.reduction = reduction
        self.pos_weight = None if pos_weight is None else jnp.asarray(pos_weight)

    def __call__(self, pred, target):
        pred = _f32(pred)
        target = target.astype(pred.dtype)
        pos = jax.nn.softplus(-pred) * target
        if self.pos_weight is not None:
            pos = pos * self.pos_weight
        loss = pos + jax.nn.softplus(pred) * (1.0 - target)
        if self.reduction == "none":
            return loss
        if self.reduction == "sum":
            return jnp.sum(loss)
        return jnp.mean(loss)


def _reduce(loss, reduction):
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.mean(loss)


class MSELoss:
    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, pred, target):
        pred = _f32(pred)
        return _reduce((pred - target.astype(pred.dtype)) ** 2, self.reduction)


class L1Loss:
    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, pred, target):
        pred = _f32(pred)
        return _reduce(jnp.abs(pred - target.astype(pred.dtype)), self.reduction)


class SmoothL1Loss:
    def __init__(self, reduction: str = "mean", beta: float = 1.0):
        self.reduction = reduction
        self.beta = beta

    def __call__(self, pred, target):
        pred = _f32(pred)
        diff = jnp.abs(pred - target.astype(pred.dtype))
        loss = jnp.where(diff < self.beta, 0.5 * diff ** 2 / self.beta,
                         diff - 0.5 * self.beta)
        return _reduce(loss, self.reduction)


class TverskyLoss:
    """MONAI TverskyLoss: asymmetric Dice with FP weight ``alpha`` and FN
    weight ``beta`` (monai/losses/tversky.py semantics)."""

    def __init__(self, include_background: bool = True, sigmoid: bool = False,
                 softmax: bool = False, alpha: float = 0.5, beta: float = 0.5,
                 batch: bool = False, smooth_nr: float = 1e-5,
                 smooth_dr: float = 1e-5, reduction: str = "mean"):
        self.include_background = include_background
        self.sigmoid = sigmoid
        self.softmax = softmax
        self.alpha = alpha
        self.beta = beta
        self.batch = batch
        self.smooth_nr = smooth_nr
        self.smooth_dr = smooth_dr
        self.reduction = reduction

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred = _apply_activation(pred, self.sigmoid, self.softmax)
        pred, target = _drop_background(pred, target, self.include_background)
        target = target.astype(pred.dtype)
        spatial = tuple(range(1, pred.ndim - 1))
        axes = ((0,) + spatial) if self.batch else spatial
        tp = _sum32(pred * target, axis=axes)
        fp = self.alpha * _sum32(pred * (1.0 - target), axis=axes)
        fn = self.beta * _sum32((1.0 - pred) * target, axis=axes)
        score = (tp + self.smooth_nr) / (tp + fp + fn + self.smooth_dr)
        return _reduce(1.0 - score, self.reduction)


class MaskedDiceLoss(DiceLoss):
    """MONAI MaskedDiceLoss: DiceLoss over ``pred*mask`` / ``target*mask``.
    The mask rides in as an optional third argument (or broadcastable array
    attribute set per-batch); with no mask it is plain DiceLoss."""

    def __call__(self, pred, target, mask=None):
        if mask is not None:
            mask = mask.astype(pred.dtype)
            pred = pred * mask
            target = target.astype(pred.dtype) * mask
        return super().__call__(pred, target)


class NLLLoss:
    """torch.nn.NLLLoss over channel-last log-probability inputs with
    one-hot/probability targets (matching this module's CrossEntropyLoss
    target convention)."""

    def __init__(self, weight=None, reduction: str = "mean"):
        self.weight = None if weight is None else jnp.asarray(weight)
        self.reduction = reduction

    def __call__(self, pred, target):
        pred = _f32(pred)
        target = target.astype(pred.dtype)
        loss = -jnp.sum(target * pred, axis=-1)
        if self.weight is not None:
            w = jnp.sum(target * self.weight, axis=-1)
            if self.reduction == "mean":
                return jnp.sum(loss * w) / jnp.sum(w)
            loss = loss * w
        return _reduce(loss, self.reduction)


class HuberLoss:
    """torch.nn.HuberLoss: 0.5*d^2 for |d|<delta, else delta*(|d|-0.5*delta)."""

    def __init__(self, reduction: str = "mean", delta: float = 1.0):
        self.reduction = reduction
        self.delta = delta

    def __call__(self, pred, target):
        pred = _f32(pred)
        diff = jnp.abs(pred - target.astype(pred.dtype))
        loss = jnp.where(diff < self.delta, 0.5 * diff ** 2,
                         self.delta * (diff - 0.5 * self.delta))
        return _reduce(loss, self.reduction)


class VAELoss:
    """Reconstruction + beta * KL for the VAE family (framework extension; the
    reference's custom-loss home `unet3d/losses/losses.py` is intentionally empty)."""

    def __init__(self, reconstruction: str = "MSELoss", beta: float = 1.0):
        self.recon = load_criterion(reconstruction)
        self.beta = beta
        self.wants_extras = True

    def __call__(self, pred, target, mu=None, logvar=None):
        loss = self.recon(pred, target)
        if mu is not None:
            mu, logvar = _f32(mu), _f32(logvar)
            kl = -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
            loss = loss + self.beta * kl
        return loss


LOSS_REGISTRY = {
    "DiceLoss": DiceLoss,
    "GeneralizedDiceLoss": GeneralizedDiceLoss,
    "FocalLoss": FocalLoss,
    "DiceCELoss": DiceCELoss,
    "DiceFocalLoss": DiceFocalLoss,
    "GeneralizedDiceFocalLoss": GeneralizedDiceFocalLoss,
    "SSIMLoss": SSIMLoss,
    "CrossEntropyLoss": CrossEntropyLoss,
    "BCEWithLogitsLoss": BCEWithLogitsLoss,
    "MSELoss": MSELoss,
    "L1Loss": L1Loss,
    "SmoothL1Loss": SmoothL1Loss,
    "TverskyLoss": TverskyLoss,
    "MaskedDiceLoss": MaskedDiceLoss,
    "NLLLoss": NLLLoss,
    "HuberLoss": HuberLoss,
    "VAELoss": VAELoss,
}


def load_criterion(criterion_name: str, loss_kwargs: Optional[dict] = None) -> Callable:
    """Name -> loss instance (parity with `script_utils.py:61-77` lookup chain)."""
    if loss_kwargs is None:
        loss_kwargs = {}
    if criterion_name not in LOSS_REGISTRY:
        raise ValueError(f"Loss {criterion_name} is not supported")
    return LOSS_REGISTRY[criterion_name](**loss_kwargs)
