"""Stride-2 conv weight-gradient Pallas kernel (interpret mode) + dispatch.

The kernel's TPU measurements live in PERF.md (round 4); here interpret mode
validates the math — the w-parity lane merge, host-side h-parity
deinterleave, per-step DMA windows, padded-cotangent alignment trick, and
the 27-of-36 tap scatter — on the CPU backend, plus the custom-VJP conv
wrapper end to end (forward + both gradients).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.ops.conv3d import conv3d_s2_pallas_wgrad, conv3d_xla

try:
    from jax.experimental.pallas import tpu as pltpu
    from unet3d_tpu.ops.pallas.s2_wgrad_kernel import (s2_wgrad_available,
                                                       s2_wgrad_pallas)
    PALLAS = True
except Exception:  # pragma: no cover
    PALLAS = False

_S2_PADS = ((1, 1), (1, 1), (1, 1))


def _wgrad_ref(x, g, co):
    w0 = jnp.zeros((3, 3, 3, x.shape[-1], co), jnp.float32)
    return jax.grad(
        lambda w: jnp.sum(conv3d_xla(x, w, (2, 2, 2), _S2_PADS) * g))(w0)


@pytest.mark.skipif(not PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("shape", [(1, 8, 8, 16, 64, 8),
                                   (2, 4, 6, 8, 64, 16)])
def test_s2_wgrad_interpret_matches_xla(shape):
    n, d, h, w, c, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d, h, w, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(n, d // 2, h // 2, w // 2, co)),
                    jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        dw = s2_wgrad_pallas(x, g)
    ref = _wgrad_ref(x, g, co)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.skipif(not PALLAS, reason="pallas unavailable")
def test_s2_wgrad_custom_vjp_conv():
    """The UNET3D_TPU_S2GRAD=pallas conv wrapper: forward identical to XLA,
    data-grad from XLA's transposed conv, weight-grad from the kernel."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 8)), jnp.float32)

    def loss(fn, x, w):
        return jnp.sum(fn(x, w) ** 2)

    ref_fn = lambda x, w: conv3d_xla(x, w, (2, 2, 2), _S2_PADS)
    y_ref = ref_fn(x, w)
    rx, rw = jax.grad(loss, (1, 2))(ref_fn, x, w)
    with pltpu.force_tpu_interpret_mode():
        y = conv3d_s2_pallas_wgrad(x, w)
        dx, dw = jax.grad(loss, (1, 2))(conv3d_s2_pallas_wgrad, x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw),
                               atol=2e-3, rtol=1e-4)


@pytest.mark.skipif(not PALLAS, reason="pallas unavailable")
def test_s2_wgrad_availability_rules():
    ok = (1, 128, 128, 128, 64)
    g_ok = (1, 64, 64, 64, 96)
    # CPU backend: never available (Mosaic-lowered kernel)
    assert not s2_wgrad_available(ok, g_ok)
    if jax.default_backend() == "tpu":  # pragma: no cover - CPU test env
        assert s2_wgrad_available(ok, g_ok)
        # channel block must fill 128 lanes as (2, C)
        assert not s2_wgrad_available((1, 128, 128, 128, 48), g_ok)
        # even spatial dims only
        assert not s2_wgrad_available((1, 127, 128, 128, 64), g_ok)
        # k3 only
        assert not s2_wgrad_available(ok, g_ok, k=(2, 2, 2))
        # cotangent shape must be the halved grid
        assert not s2_wgrad_available(ok, (1, 64, 64, 63, 96))
