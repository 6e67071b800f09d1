"""Gradient accumulation (framework extension; config key
``training.gradient_accumulation_steps``): K microbatches scanned inside the
step with f32 gradient accumulation and ONE optimizer update, so effective
batches beyond a chip's HBM still train. Under SGD the accumulated step is
mathematically identical to the full-batch step (mean of equal-size
microbatch means); Adam is excluded from identity checks by design — its
first step is lr*sign(g), which amplifies reduction-order noise (CLAUDE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unet3d_tpu.models.registry import create_model, init_params
from unet3d_tpu.train.losses import DiceLoss
from unet3d_tpu.train.step import create_train_state, make_train_step


def _fresh(variables):
    # each jitted step donates its TrainState; states must not share buffers
    return jax.tree_util.tree_map(jnp.array, variables)


def _setup(seed=0):
    model = create_model("DynUNet", in_channels=2, out_channels=2,
                         spatial_dims=3, strides=[[1, 1, 1], [2, 2, 2]],
                         filters=[4, 8], kernel_size=[[3, 3, 3]] * 2,
                         upsample_kernel_size=[[2, 2, 2]],
                         deep_supervision=False)
    variables = init_params(model, (8, 8, 8, 2))
    tx = optax.sgd(1e-2)
    criterion = DiceLoss(sigmoid=True, include_background=True)
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(4, 2, 8, 8, 8), jnp.float32)
    labels = jnp.asarray((rng.rand(4, 2, 8, 8, 8) > 0.5).astype(np.float32))
    return model, variables, tx, criterion, images, labels


@pytest.mark.parametrize("k", [2, 4])
def test_grad_accum_matches_full_batch_sgd(k):
    model, variables, tx, criterion, images, labels = _setup()
    step_full = make_train_step(model, criterion, tx)
    step_acc = make_train_step(model, criterion, tx, grad_accum=k)

    s1, loss1 = step_full(create_train_state(_fresh(variables), tx), images, labels)
    s2, loss2 = step_acc(create_train_state(_fresh(variables), tx), images, labels)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-7)


def test_grad_accum_rejects_ragged_batch():
    model, variables, tx, criterion, images, labels = _setup()
    step = make_train_step(model, criterion, tx, grad_accum=3)
    variables = _fresh(variables)
    with pytest.raises(ValueError, match="not divisible"):
        step(create_train_state(variables, tx), images, labels)


def test_grad_accum_on_mesh():
    """The sharded path shares train_step_body: data-parallel microbatching
    compiles and runs on the virtual mesh."""
    from unet3d_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                          replicate_state, shard_batch)
    model, variables, tx, criterion, images, labels = _setup()
    mesh = make_mesh({"data": 2})
    state = replicate_state(create_train_state(_fresh(variables), tx), mesh)
    step = make_sharded_train_step(model, criterion, tx, mesh, grad_accum=2)
    new_state, loss = step(state, shard_batch(images, mesh),
                           shard_batch(labels, mesh))
    assert np.isfinite(float(loss))

    # identity against the single-device accumulated step (SGD)
    plain = make_train_step(model, criterion, tx, grad_accum=2)
    ref_state, ref_loss = plain(create_train_state(_fresh(variables), tx),
                                images, labels)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-7)
