"""Multi-device sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
the TPU-world answer to testing multi-node without a cluster)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.models.registry import create_model, init_params
from unet3d_tpu.parallel.mesh import (make_mesh, make_sharded_train_step,
                                      replicate_state, shard_batch)
from unet3d_tpu.train.losses import DiceLoss
from unet3d_tpu.train.optim import build_optimizer
from unet3d_tpu.train.step import create_train_state, make_train_step


def _setup(batch=8, size=8):
    model = create_model("UNet3D", base_width=2, encoder_blocks=[1, 1], n_outputs=1)
    variables = init_params(model, (size, size, size, 1))
    tx = build_optimizer("Adam", lr=1e-2)
    state = create_train_state(variables, tx)
    rng = np.random.RandomState(0)
    images = rng.rand(batch, 1, size, size, size).astype(np.float32)
    labels = (rng.rand(batch, 1, size, size, size) > 0.5).astype(np.float32)
    return model, tx, state, images, labels


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_data_parallel_step_runs():
    model, tx, state, images, labels = _setup()
    mesh = make_mesh({"data": 8})
    step = make_sharded_train_step(model, DiceLoss(sigmoid=True), tx, mesh)
    state = replicate_state(state, mesh)
    x = shard_batch(jnp.asarray(images), mesh)
    y = shard_batch(jnp.asarray(labels), mesh)
    new_state, loss = step(state, x, y)
    assert np.isfinite(float(loss))
    # params updated and still replicated
    assert int(new_state.step) == 1


def test_dp_matches_single_device():
    # The mesh-sharded step must compute the same update as the single-device step.
    model, tx, state, images, labels = _setup()
    single = make_train_step(model, DiceLoss(sigmoid=True), tx)
    s1, loss1 = single(state, jnp.asarray(images), jnp.asarray(labels))

    model, tx, state, _, _ = _setup()
    mesh = make_mesh({"data": 8})
    sharded = make_sharded_train_step(model, DiceLoss(sigmoid=True), tx, mesh)
    state = replicate_state(state, mesh)
    s2, loss2 = sharded(state, shard_batch(jnp.asarray(images), mesh),
                        shard_batch(jnp.asarray(labels), mesh))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    k1 = jax.device_get(s1.params)["encoder"]["layer0"]["block0"]["conv1"]["conv"]["kernel"]
    k2 = jax.device_get(s2.params)["encoder"]["layer0"]["block0"]["conv1"]["conv"]["kernel"]
    np.testing.assert_allclose(k1, k2, atol=2e-6)


def test_spatial_parallel_step_runs():
    # DP x SP mesh: batch over 'data', D spatial axis over 'space' — XLA SPMD
    # inserts halo exchanges for the convolutions.
    model, tx, state, images, labels = _setup(batch=2, size=16)
    mesh = make_mesh({"data": 2, "space": 4})
    step = make_sharded_train_step(model, DiceLoss(sigmoid=True), tx, mesh)
    state = replicate_state(state, mesh)
    new_state, loss = step(state, shard_batch(jnp.asarray(images), mesh),
                           shard_batch(jnp.asarray(labels), mesh))
    assert np.isfinite(float(loss))


def test_sp_matches_single_device():
    model, tx, state, images, labels = _setup(batch=2, size=16)
    single = make_train_step(model, DiceLoss(sigmoid=True), tx)
    s1, loss1 = single(state, jnp.asarray(images), jnp.asarray(labels))

    model, tx, state, _, _ = _setup(batch=2, size=16)
    mesh = make_mesh({"data": 2, "space": 4})
    sharded = make_sharded_train_step(model, DiceLoss(sigmoid=True), tx, mesh)
    state = replicate_state(state, mesh)
    s2, loss2 = sharded(state, shard_batch(jnp.asarray(images), mesh),
                        shard_batch(jnp.asarray(labels), mesh))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)


def test_sharded_forward_matches_single_device():
    # whole-volume inference with the depth axis sharded over 'space'
    from unet3d_tpu.parallel.mesh import make_sharded_forward, ndhwc_batch_spec
    from jax.sharding import NamedSharding
    import jax.numpy as jnp

    model = create_model("UNet3D", base_width=2, encoder_blocks=[1, 1], n_outputs=2)
    variables = init_params(model, (16, 16, 16, 1))
    state = create_train_state(variables, build_optimizer("Adam"))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 16, 1), jnp.float32)
    ref = model.apply({"params": state.params}, x, False)

    mesh = make_mesh({"data": 1, "space": 8})
    fwd = make_sharded_forward(model, mesh)
    state_r = replicate_state(state, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, ndhwc_batch_spec(mesh)))
    out = fwd(state_r, xs)
    # halo-exchange accumulation order differs slightly from single-device
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sharded_train_step_accepts_rank2_labels():
    """Classification targets (B, C) must shard over the mesh too — a fixed
    rank-5 label PartitionSpec rejected them at jit time."""
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.parallel.mesh import make_mesh, make_sharded_train_step, replicate_state
    from unet3d_tpu.train.losses import load_criterion
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state

    model = create_model("resnet_18", n_outputs=3, n_features=1)
    variables = init_params(model, (8, 8, 8, 1))
    tx = build_optimizer("Adam", lr=1e-3)
    state = create_train_state(variables, tx)
    mesh = make_mesh({"data": 2})
    state = replicate_state(state, mesh)
    step = make_sharded_train_step(model, load_criterion("MSELoss"), tx, mesh)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 1, 8, 8, 8), jnp.float32)
    labels = jnp.asarray(rng.rand(2, 3), jnp.float32)  # rank-2 targets
    state, loss = step(state, images, labels)
    assert np.isfinite(float(loss))


def _flagship_dynunet(filters=(2, 4, 4, 8, 8, 8), in_ch=2, out_ch=2):
    """The full 6-level BraTS/SPPIN DynUNet topology at test-size filters —
    5 stride-2 boundaries, so a space=4 mesh exercises halo exchanges at
    every level including depths smaller than the mesh axis."""
    n = len(filters)
    strides = [[1, 1, 1]] + [[2, 2, 2]] * (n - 1)
    return create_model(
        "DynUNet", in_channels=in_ch, out_channels=out_ch, spatial_dims=3,
        strides=strides, filters=list(filters), kernel_size=[[3, 3, 3]] * n,
        upsample_kernel_size=[list(s) for s in strides[1:]],
        deep_supervision=False)


def test_flagship_six_level_sp_matches_single_device():
    """VERDICT r2 item 3: shard the REAL 6-level flagship topology over
    {"data": 2, "space": 4} and assert numeric identity with single-device.
    At 32-cubed input the deepest level is 1-voxel deep — smaller than the
    space axis — which is exactly where odd-shard halo bugs would live."""
    model = _flagship_dynunet()
    variables = init_params(model, (32, 32, 32, 2))
    # SGD, not Adam: params move by lr*g, so the identity tolerance scales
    # with the gradient itself. Adam's first step is lr*sign(g), which turns
    # reduction-order noise on near-zero grads into full-step sign flips —
    # a property of the optimizer, not of the sharding being tested.
    tx = build_optimizer("sgd", lr=1e-1)
    state = create_train_state(variables, tx)
    rng = np.random.RandomState(0)
    images = rng.rand(2, 2, 32, 32, 32).astype(np.float32)
    labels = (rng.rand(2, 2, 32, 32, 32) > 0.5).astype(np.float32)

    single = make_train_step(model, DiceLoss(sigmoid=True), tx)
    s1, loss1 = single(state, jnp.asarray(images), jnp.asarray(labels))

    state2 = create_train_state(init_params(model, (32, 32, 32, 2)), tx)
    mesh = make_mesh({"data": 2, "space": 4})
    sharded = make_sharded_train_step(model, DiceLoss(sigmoid=True), tx, mesh)
    state2 = replicate_state(state2, mesh)
    s2, loss2 = sharded(state2, shard_batch(jnp.asarray(images), mesh),
                        shard_batch(jnp.asarray(labels), mesh))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    # every parameter updated identically (deepest halo levels included)
    p1 = jax.device_get(s1.params)
    p2 = jax.device_get(s2.params)
    flat1 = {"/".join(map(str, k)): v for k, v in
             jax.tree_util.tree_flatten_with_path(p1)[0]}
    flat2 = {"/".join(map(str, k)): v for k, v in
             jax.tree_util.tree_flatten_with_path(p2)[0]}
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(flat1[k], flat2[k], atol=1e-5,
                                   err_msg=f"param {k} diverged")


def test_sppin_192_cube_trains_on_space_mesh():
    """VERDICT r2 item 8: the SPPIN config's 192-cubed volume (the size that
    OOMs a single 16 GB chip, PERF.md) trains end-to-end on the space mesh —
    reduced filters, full 6-level topology and volume size."""
    model = _flagship_dynunet(filters=(1, 2, 2, 2, 2, 2), in_ch=1, out_ch=1)
    variables = init_params(model, (32, 32, 32, 1))
    tx = build_optimizer("Adam", lr=1e-3)
    state = create_train_state(variables, tx)
    mesh = make_mesh({"data": 1, "space": 8})
    step = make_sharded_train_step(model, DiceLoss(sigmoid=True), tx, mesh,
                                   amp=True)
    state = replicate_state(state, mesh)
    rng = np.random.RandomState(0)
    images = shard_batch(jnp.asarray(rng.rand(1, 1, 192, 192, 192), jnp.float32),
                         mesh)
    labels = shard_batch(jnp.asarray(
        (rng.rand(1, 1, 192, 192, 192) > 0.5).astype(np.float32)), mesh)
    new_state, loss = step(state, images, labels)
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1


def test_dp_batchnorm_model_matches_single_device():
    """SegResNetDS carries batch_stats: under data sharding XLA SPMD reduces
    the BN statistics over the GLOBAL batch, so the sharded step must equal
    the single-device step exactly (SGD per the Adam reduction-order caveat
    in CLAUDE.md)."""
    def setup():
        model = create_model("SegResNetDS", init_filters=2, in_channels=1,
                             out_channels=1, blocks_down=(1, 1))
        variables = init_params(model, (8, 8, 8, 1))
        tx = build_optimizer("SGD", lr=1e-2)
        return model, tx, create_train_state(variables, tx)

    rng = np.random.RandomState(1)
    images = rng.rand(4, 1, 8, 8, 8).astype(np.float32)
    labels = (rng.rand(4, 1, 8, 8, 8) > 0.5).astype(np.float32)

    model, tx, state = setup()
    single = make_train_step(model, DiceLoss(sigmoid=True), tx)
    s1, loss1 = single(state, jnp.asarray(images), jnp.asarray(labels))

    model, tx, state = setup()
    mesh = make_mesh({"data": 4})
    sharded = make_sharded_train_step(model, DiceLoss(sigmoid=True), tx, mesh)
    state = replicate_state(state, mesh)
    s2, loss2 = sharded(state, shard_batch(jnp.asarray(images), mesh),
                        shard_batch(jnp.asarray(labels), mesh))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    k1 = jax.device_get(s1.params)["conv_init"]["kernel"]
    k2 = jax.device_get(s2.params)["conv_init"]["kernel"]
    np.testing.assert_allclose(k1, k2, atol=1e-6)
    # BN running stats must also agree (global-batch statistics)
    m1 = jax.device_get(s1.extra_variables["batch_stats"])
    m2 = jax.device_get(s2.extra_variables["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(m1),
                    jax.tree_util.tree_leaves(m2)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_dp_swin_attention_model_runs_sharded():
    """SwinUNETR's window partition/roll reshapes must compile and run under
    batch sharding."""
    model = create_model("SwinUNETR", img_size=(32, 32, 32), in_channels=1,
                         out_channels=1, feature_size=2,
                         depths=(1, 1, 1, 1), num_heads=(1, 1, 2, 2),
                         window_size=2)
    variables = init_params(model, (32, 32, 32, 1))
    tx = build_optimizer("SGD", lr=1e-2)
    state = create_train_state(variables, tx)
    rng = np.random.RandomState(2)
    images = rng.rand(2, 1, 32, 32, 32).astype(np.float32)
    labels = (rng.rand(2, 1, 32, 32, 32) > 0.5).astype(np.float32)
    mesh = make_mesh({"data": 2})
    step = make_sharded_train_step(model, DiceLoss(sigmoid=True), tx, mesh)
    state = replicate_state(state, mesh)
    new_state, loss = step(state, shard_batch(jnp.asarray(images), mesh),
                           shard_batch(jnp.asarray(labels), mesh))
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1
