"""Custom instance-norm-from-stats VJP == autodiff-derived gradient.

The custom backward (ops/norm.py) returns the TOTAL dy and zero ds1/ds2; the
derived reference differentiates through the s1/s2 reductions. Both must
produce identical gradients for the composed conv+stats+norm function.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.ops.norm import _norm_apply, instance_norm_from_stats


def _stats(y):
    yf = y.astype(jnp.float32)
    return jnp.sum(yf, axis=(1, 2, 3)), jnp.sum(yf * yf, axis=(1, 2, 3))


def _composed_custom(x, w, scale, bias):
    y = x * w  # stand-in for the conv producing y from upstream params
    s1, s2 = _stats(y)
    return jnp.sum(instance_norm_from_stats(y, s1, s2, scale, bias, 1e-5) ** 2)


def _composed_derived(x, w, scale, bias):
    y = x * w
    s1, s2 = _stats(y)
    return jnp.sum(_norm_apply(y, s1, s2, scale, bias, 1e-5)[0] ** 2)


def test_custom_vjp_matches_derived_f32():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 5, 6, 3), jnp.float32)
    w = jnp.asarray(1.0 + 0.1 * rng.randn(2, 4, 5, 6, 3), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 3), jnp.float32)
    bias = jnp.asarray(rng.randn(3), jnp.float32)

    out_c = _composed_custom(x, w, scale, bias)
    out_d = _composed_derived(x, w, scale, bias)
    np.testing.assert_allclose(float(out_c), float(out_d), rtol=1e-6)

    gc = jax.grad(_composed_custom, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    gd = jax.grad(_composed_derived, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    # both paths round differently through the cancellation-heavy norm
    # backward; measured against float64 truth the custom path is CLOSER
    # (4.5e-6 vs 7.0e-6 max err on this input), so the bar here is
    # agreement at f32-noise scale, not bit identity
    for c, d in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(c, np.float32),
                                   np.asarray(d, np.float32),
                                   rtol=1e-3, atol=5e-5)


def test_custom_vjp_bf16_no_worse_than_derived():
    """AMP sanity: with bf16 inputs, both backwards are dominated by the
    bf16 rounding of y itself (normalization makes dx a near-cancellation,
    so NEITHER path tracks the f32 truth pointwise — measured ~0.05 abs err
    on both for a ~1e-4-scale true gradient). Assert the custom path is
    finite and no worse than the derived one, and that the param-side
    grads (scale/bias, no cancellation) stay accurate."""
    rng = np.random.RandomState(0)
    xf = rng.randn(2, 4, 5, 6, 3).astype(np.float32)
    wf = (1.0 + 0.1 * rng.randn(2, 4, 5, 6, 3)).astype(np.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 3), jnp.float32)
    bias = jnp.asarray(rng.randn(3), jnp.float32)
    truth = jax.grad(_composed_derived, argnums=(0, 1, 2, 3))(
        jnp.asarray(xf), jnp.asarray(wf), scale, bias)
    x16, w16 = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)
    gc = jax.grad(_composed_custom, argnums=(0, 1, 2, 3))(x16, w16, scale, bias)
    gd = jax.grad(_composed_derived, argnums=(0, 1, 2, 3))(x16, w16, scale, bias)
    for c, d, t in zip(gc, gd, truth):
        assert np.all(np.isfinite(np.asarray(c, np.float32)))
        err_c = float(jnp.max(jnp.abs(c.astype(jnp.float32) - t)))
        err_d = float(jnp.max(jnp.abs(d.astype(jnp.float32) - t)))
        scale_t = float(jnp.max(jnp.abs(t))) + 1e-12
        assert err_c <= max(err_d * 1.5, 0.02 * scale_t), (err_c, err_d)
    # scale/bias grads are plain reductions — they must track truth tightly
    for c, t in zip(gc[2:], truth[2:]):
        np.testing.assert_allclose(np.asarray(c, np.float32), t,
                                   rtol=2e-2, atol=1e-3)


def test_zero_scale_gradient():
    # scale == 0 must not produce NaN/inf through the custom backward
    rng = np.random.RandomState(1)
    y = jnp.asarray(rng.randn(1, 4, 4, 4, 2), jnp.float32)
    s1, s2 = _stats(y)
    scale = jnp.zeros(2)
    bias = jnp.zeros(2)

    def f(y, scale, bias):
        s1, s2 = _stats(y)
        return jnp.sum(instance_norm_from_stats(y, s1, s2, scale, bias, 1e-5))

    g = jax.grad(f, argnums=(0, 1, 2))(y, scale, bias)
    for t in g:
        assert np.all(np.isfinite(np.asarray(t)))


def test_dynunet_grads_unchanged_by_flag(monkeypatch):
    """Full-model gradient identity: custom-VJP path vs derived path."""
    from unet3d_tpu.models.registry import create_model, init_params

    model = create_model("DynUNet", in_channels=2, out_channels=2,
                         spatial_dims=3, strides=[[1, 1, 1], [2, 2, 2]],
                         filters=[4, 8], kernel_size=[[3, 3, 3]] * 2,
                         upsample_kernel_size=[[2, 2, 2]],
                         deep_supervision=False)
    variables = init_params(model, (8, 8, 8, 2))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 8, 8, 8, 2), jnp.float32)

    def loss(params):
        return jnp.sum(model.apply({"params": params}, x, False) ** 2)

    grads = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("UNET3D_TPU_IN_VJP", flag)
        grads[flag] = jax.grad(loss)(variables["params"])
    flat1 = jax.tree_util.tree_leaves(grads["1"])
    flat0 = jax.tree_util.tree_leaves(grads["0"])
    for a, b in zip(flat1, flat0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
