"""Instance-norm apply from precomputed stats, with a hand-written backward.

Forward: the two-moment normalize `_StatsInstanceNorm` (models/dynunet.py)
uses — y*(inv*scale) + (bias - mean*inv*scale) from (sum, sum_sq) stats that
arrive next to the conv (`ops/conv3d.conv3d_with_stats`).

Backward: XLA's derived gradient differentiates through the s1/s2 reduction
chain, re-reading the conv output in separate fusions for the mean-path and
var-path contributions. The custom VJP emits the canonical group-norm
backward instead — ONE pass over (y, g) plus two (N, C) reductions:

    xhat  = (y - mean) * inv
    dxhat = g * scale
    dy    = inv * (dxhat - mean_sp(dxhat) - xhat * mean_sp(dxhat * xhat))

and returns ZERO cotangents for s1/s2. That is exact, not an approximation:
dy above is the TOTAL derivative through both the direct input and the
stats (s1 = sum(y), s2 = sum(y^2)), so the upstream reduction VJPs must
contribute nothing. It also holds when the stats come from a fused conv
epilogue (Pallas Winograd path) where autodiff never sees the reductions.

VERDICT r3 item 1b — implemented, measured, and left OPT-IN
(UNET3D_TPU_IN_VJP=1): in the full BraTS 128^3 train step the canonical
backward measured 127.7 ms/step vs 123.5 with XLA's derived gradient
(/tmp/bench_r4_invjp.log vs bench_r4_start.log) — the derived chain fuses
into the surrounding conv backward better than the hand-written one-pass
form, the same in-context inversion round 3 measured for the Winograd
kernel. The custom path IS more accurate (4.5e-6 vs 7.0e-6 max err against
float64 on the unit test's shapes) and keeps value for AMP-sensitive work.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _norm_apply(y, s1, s2, scale, bias, eps):
    m = float(np.prod(y.shape[1:4]))
    mean = s1 / m                                     # (N, C) f32
    var = jnp.maximum(s2 / m - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    inv = rstd * scale.astype(jnp.float32)
    shift = bias.astype(jnp.float32) - mean * inv
    out = (y.astype(jnp.float32) * inv[:, None, None, None, :]
           + shift[:, None, None, None, :])
    return out.astype(y.dtype), mean, rstd


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def instance_norm_from_stats(y, s1, s2, scale, bias, eps=1e-5):
    return _norm_apply(y, s1, s2, scale, bias, eps)[0]


def _fwd(y, s1, s2, scale, bias, eps):
    out, mean, rstd = _norm_apply(y, s1, s2, scale, bias, eps)
    # residuals: y (needed regardless) + tiny (N,C)/(C,) tensors
    return out, (y, mean, rstd, scale, s1, s2)


def _bwd(eps, res, g):
    y, mean, rstd, scale, s1, s2 = res
    m = float(np.prod(y.shape[1:4]))
    gf = g.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xhat = (yf - mean[:, None, None, None, :]) * rstd[:, None, None, None, :]
    dxhat = gf * scale.astype(jnp.float32)
    sum_dxhat = jnp.sum(dxhat, axis=(1, 2, 3))                 # (N, C)
    sum_dxhat_xhat = jnp.sum(dxhat * xhat, axis=(1, 2, 3))     # (N, C)
    dy = rstd[:, None, None, None, :] * (
        dxhat
        - (sum_dxhat / m)[:, None, None, None, :]
        - xhat * (sum_dxhat_xhat / m)[:, None, None, None, :])
    dscale = jnp.sum(jnp.sum(gf * xhat, axis=(1, 2, 3)), axis=0)
    dbias = jnp.sum(jnp.sum(gf, axis=(1, 2, 3)), axis=0)
    return (dy.astype(y.dtype), jnp.zeros_like(s1), jnp.zeros_like(s2),
            dscale.astype(scale.dtype), dbias.astype(scale.dtype))


instance_norm_from_stats.defvjp(_fwd, _bwd)


def use_custom_in_vjp() -> bool:
    return os.environ.get("UNET3D_TPU_IN_VJP", "0") == "1"
