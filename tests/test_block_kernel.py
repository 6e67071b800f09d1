"""Fused affine+lrelu+conv Pallas block kernel: interpret-mode parity.

The pass-removal experiment (VERDICT r4 item 3) — semantics pinned against
the XLA formulation that materializes the normalized activation. Interpret
mode validates kernel logic including the DMAs on CPU (CLAUDE.md rule:
bisect there before burning TPU compile round-trips); the TPU-side economics
live in tools/bench_block_kernel.py / PERF.md.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from unet3d_tpu.ops.pallas.block_kernel import pallas_block_conv3d


def _reference(x, w, scale, shift, alpha=0.01):
    z = x.astype(jnp.float32) * scale + shift
    z = jnp.where(z >= 0, z, z * alpha).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        z, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(jnp.float32)


@pytest.mark.parametrize("shape,cin,cout,dtype", [
    ((1, 4, 16, 16), 8, 8, jnp.float32),
    ((2, 6, 8, 16), 4, 8, jnp.bfloat16),   # batch>1, both depth edges
])
def test_block_kernel_matches_xla(shape, cin, cout, dtype):
    if pltpu is None:
        pytest.skip("pallas tpu backend unavailable")
    rng = np.random.RandomState(0)
    n, d, h, w_ = shape
    x = jnp.asarray(rng.randn(n, d, h, w_, cin), dtype)
    w = jnp.asarray(rng.randn(3, 3, 3, cin, cout) * 0.1, dtype)
    scale = jnp.asarray(rng.rand(cin) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(cin) * 0.3, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_block_conv3d(x, w, scale, shift).astype(jnp.float32)
    want = _reference(x, w, scale, shift)
    scale_ref = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) / scale_ref < (
        5e-3 if dtype == jnp.bfloat16 else 1e-5)
