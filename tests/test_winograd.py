"""Winograd conv tests: XLA formulation + Pallas kernel (interpret mode).

The Pallas kernel's TPU measurements live in tools/probe_winograd_tpu.py /
PERF.md; here interpret mode validates the math (including halo block maps,
batch folding, and the custom VJP) on the CPU backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.ops.conv3d import conv3d_decomp2d, conv3d_xla
from unet3d_tpu.ops.winograd import winograd_conv3d_xla

try:
    from jax.experimental.pallas import tpu as pltpu
    from unet3d_tpu.ops.pallas.winograd_kernel import (_winograd_batched,
                                                       winograd_available,
                                                       winograd_conv3d)
    PALLAS = True
except Exception:  # pragma: no cover
    PALLAS = False


def _case(n, d, h, w, c, co, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, c, co)), jnp.float32)
    return x, k


def test_winograd_xla_matches_conv():
    x, w = _case(2, 8, 10, 12, 5, 7)
    ref = conv3d_xla(x, w, (1, 1, 1), "SAME")
    got = winograd_conv3d_xla(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("shape", [(1, 8, 16, 12, 5, 7), (2, 4, 8, 8, 3, 4),
                                   (1, 6, 8, 10, 8, 8), (1, 4, 32, 16, 4, 6)])
def test_pallas_winograd_interpret_matches_conv(shape):
    n, d, h, w, c, co = shape
    x, k = _case(n, d, h, w, c, co)
    ref = conv3d_xla(x, k, (1, 1, 1), "SAME")
    got = _winograd_batched(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.skipif(not PALLAS, reason="pallas unavailable")
def test_pallas_winograd_gradients_interpret():
    x, k = _case(1, 4, 8, 8, 4, 4)

    def loss_w(x, k):
        return jnp.sum(winograd_conv3d(x, k) ** 2)

    def loss_ref(x, k):
        return jnp.sum(conv3d_decomp2d(x, k) ** 2)

    with pltpu.force_tpu_interpret_mode():
        dx, dk = jax.grad(loss_w, (0, 1))(x, k)
    rx, rk = jax.grad(loss_ref, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.skipif(not PALLAS, reason="pallas unavailable")
def test_winograd_availability_rules():
    # CPU backend: never available (Mosaic-lowered kernel)
    assert not winograd_available((1, 8, 16, 16, 128), (3, 3, 3, 128, 64),
                                  (1, 1, 1), "SAME")
    if jax.default_backend() == "tpu":  # pragma: no cover - CPU test env
        assert winograd_available((1, 8, 16, 16, 128), (3, 3, 3, 128, 64),
                                  (1, 1, 1), "SAME")
        # odd spatial dims / strides / kernel: rejected
        assert not winograd_available((1, 7, 16, 16, 128), (3, 3, 3, 128, 64),
                                      (1, 1, 1), "SAME")
        assert not winograd_available((1, 8, 16, 16, 128), (3, 3, 3, 128, 64),
                                      (2, 2, 2), "SAME")
        assert not winograd_available((1, 8, 16, 16, 128), (1, 1, 1, 128, 64),
                                      (1, 1, 1), "SAME")


def test_conv3d_dispatch_on_cpu_avoids_pallas():
    """On the CPU backend the default dispatch must not route big-channel
    convs into the Mosaic kernel."""
    x, k = _case(1, 4, 8, 8, 96, 16, seed=1)
    from unet3d_tpu.ops.conv3d import conv3d
    ref = conv3d_xla(x, k, (1, 1, 1), "SAME")
    got = conv3d(x, k)  # would crash if it picked the pallas path on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
