"""Conv strategy tests: decomp2d exactness and dispatch rules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.ops import conv3d as c3


def _pair(shape=(2, 7, 9, 11, 5), cout=6, k=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(*shape), jnp.float32)
    w = jnp.asarray(rng.rand(k, k, k, shape[-1], cout), jnp.float32) * 0.2
    return x, w


def test_decomp2d_matches_xla():
    x, w = _pair()
    ref = c3.conv3d_xla(x, w, (1, 1, 1), "SAME")
    got = c3.conv3d_decomp2d(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_decomp2d_matches_xla_5tap():
    x, w = _pair(k=5)
    ref = c3.conv3d_xla(x, w, (1, 1, 1), "SAME")
    got = c3.conv3d_decomp2d(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_gradients_match():
    x, w = _pair(shape=(1, 4, 6, 6, 3), cout=3)

    def loss_ref(x, w):
        return jnp.sum(c3.conv3d_xla(x, w, (1, 1, 1), "SAME") ** 2)

    def loss_fast(x, w):
        return jnp.sum(c3.conv3d_decomp2d(x, w) ** 2)

    gx_r, gw_r = jax.grad(loss_ref, (0, 1))(x, w)
    gx_f, gw_f = jax.grad(loss_fast, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=1e-3)


def test_dispatch_falls_back_for_stride2():
    x, w = _pair()
    out = c3.conv3d(x, w, (2, 2, 2), "SAME")
    ref = c3.conv3d_xla(x, w, (2, 2, 2), "SAME")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dispatch_env_override(monkeypatch):
    x, w = _pair(shape=(1, 4, 4, 4, 2), cout=2)
    monkeypatch.setattr(c3, "_ENV_STRATEGY", "xla")
    ref = c3.conv3d(x, w)
    monkeypatch.setattr(c3, "_ENV_STRATEGY", "decomp2d")
    got = c3.conv3d(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_availability_rules():
    from unet3d_tpu.ops.pallas.conv3d_kernel import pallas_conv3d_available
    assert pallas_conv3d_available((1, 64, 64, 64, 64), (3, 3, 3, 64, 64),
                                   (1, 1, 1), "SAME")
    # stride 2: no
    assert not pallas_conv3d_available((1, 64, 64, 64, 64), (3, 3, 3, 64, 64),
                                       (2, 2, 2), "SAME")
    # 5-tap kernel: no
    assert not pallas_conv3d_available((1, 64, 64, 64, 64), (5, 5, 5, 64, 64),
                                       (1, 1, 1), "SAME")
    # odd W: no
    assert not pallas_conv3d_available((1, 64, 64, 17, 64), (3, 3, 3, 64, 64),
                                       (1, 1, 1), "SAME")
