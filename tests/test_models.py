"""Model-zoo shape/behavior tests (tiny configs so CPU compiles stay fast)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.models.registry import create_model, init_params, fetch_model_by_name


def test_unet3d_shapes_and_odd_sizes():
    # decoder must center-pad odd intermediate sizes back to the skip's shape
    m = create_model("UNet3D", base_width=2, encoder_blocks=[1, 1], n_outputs=3)
    v = init_params(m, (10, 10, 10, 1))
    y = m.apply(v, jnp.zeros((1, 10, 10, 10, 1)))
    assert y.shape == (1, 10, 10, 10, 3)


def test_unet3d_transposed_convolutions():
    m = create_model("UNet3D", base_width=2, encoder_blocks=[1, 1], n_outputs=1,
                     use_transposed_convolutions=True)
    v = init_params(m, (8, 8, 8, 1))
    assert m.apply(v, jnp.zeros((1, 8, 8, 8, 1))).shape == (1, 8, 8, 8, 1)


def test_unet3d_sigmoid_activation():
    m = create_model("UNet3D", base_width=2, encoder_blocks=[1, 1], n_outputs=1,
                     activation="sigmoid")
    v = init_params(m, (8, 8, 8, 1))
    y = np.asarray(m.apply(v, jnp.zeros((1, 8, 8, 8, 1))))
    assert (y >= 0).all() and (y <= 1).all()


def test_dynunet_brats_topology():
    m = create_model("DynUNet", in_channels=2, out_channels=3, spatial_dims=3,
                     strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2]], filters=[4, 8, 16],
                     kernel_size=[[3, 3, 3]] * 3, upsample_kernel_size=[[2, 2, 2]] * 2)
    v = init_params(m, (16, 16, 16, 2))
    assert m.apply(v, jnp.zeros((1, 16, 16, 16, 2))).shape == (1, 16, 16, 16, 3)


def test_dynunet_res_block_and_anisotropic_stride():
    m = create_model("DynUNet", in_channels=1, out_channels=1, spatial_dims=3,
                     strides=[[1, 1, 1], [2, 2, 1]], filters=[4, 8],
                     kernel_size=[[3, 3, 3]] * 2, upsample_kernel_size=[[2, 2, 1]],
                     res_block=True)
    v = init_params(m, (8, 8, 4, 1))
    assert m.apply(v, jnp.zeros((1, 8, 8, 4, 1))).shape == (1, 8, 8, 4, 1)


def test_dynunet_deep_supervision_train_vs_eval():
    m = create_model("DynUNet", in_channels=1, out_channels=2, spatial_dims=3,
                     strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2], [2, 2, 2]],
                     filters=[2, 4, 8, 16], kernel_size=[[3, 3, 3]] * 4,
                     upsample_kernel_size=[[2, 2, 2]] * 3,
                     deep_supervision=True, deep_supr_num=2)
    v = init_params(m, (16, 16, 16, 1), train=True)
    y_train = m.apply(v, jnp.zeros((1, 16, 16, 16, 1)), train=True,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    y_eval = m.apply(v, jnp.zeros((1, 16, 16, 16, 1)), train=False)
    assert y_train.shape == (1, 3, 16, 16, 16, 2)  # main + 2 heads stacked
    assert y_eval.shape == (1, 16, 16, 16, 2)


def test_autoimplant_residual_output():
    m = create_model("AutoImplantUNet", base_width=2, encoder_blocks=[1, 1], n_outputs=1)
    v = init_params(m, (8, 8, 8, 1))
    x = jnp.ones((1, 8, 8, 8, 1))
    y = m.apply(v, x)
    y_test = m.apply(v, x, test=True)
    np.testing.assert_allclose(np.asarray(y_test - y), 1.0, atol=1e-5)


def test_vae_returns_mu_logvar_and_test_mode_deterministic():
    m = create_model("VariationalAutoEncoder", n_features=1, base_width=2,
                     encoder_blocks=[1, 1], input_shape=[8, 8, 8], vae_features=4,
                     n_reduced_latent_feature_maps=2)
    v = init_params(m, (8, 8, 8, 1))
    x = jnp.ones((1, 8, 8, 8, 1))
    out1, mu, logvar = m.apply(v, x, sample=False)
    out2, _, _ = m.apply(v, x, sample=False)
    assert mu.shape == (1, 4) and logvar.shape == (1, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # sampling path differs run to run
    s1, _, _ = m.apply(v, x, sample=True, rngs={"sample": jax.random.PRNGKey(1)})
    s2, _, _ = m.apply(v, x, sample=True, rngs={"sample": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_resnet_classifier_and_batch_stats():
    m = create_model("resnet_18", n_outputs=4)
    v = init_params(m, (16, 16, 16, 1))
    assert "batch_stats" in v
    y, updates = m.apply(v, jnp.zeros((2, 16, 16, 16, 1)), train=True,
                         mutable=["batch_stats"])
    assert y.shape == (2, 4)
    assert "batch_stats" in updates


def test_resnext_grouped_conv():
    m = create_model("resnext_50_32x4d", n_outputs=2)
    v = init_params(m, (16, 16, 16, 1))
    assert m.apply(v, jnp.zeros((1, 16, 16, 16, 1))).shape == (1, 2)


def test_registry_error_contract():
    with pytest.raises(ValueError, match="not supported"):
        fetch_model_by_name("NoSuchModel")


def test_cae_mirrored_decoder_shape_symmetric():
    m = create_model("ConvolutionalAutoEncoder", n_features=2, base_width=2,
                     encoder_blocks=[1, 1], decoder_mirrors_encoder=True)
    v = init_params(m, (8, 8, 8, 2))
    assert m.apply(v, jnp.zeros((1, 8, 8, 8, 2))).shape == (1, 8, 8, 8, 2)


def test_subpixel_transposed_conv_matches_flax():
    import flax.linen as nn
    from unet3d_tpu.models.layers import SubpixelConvTranspose, transposed_conv
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 5, 6, 3), jnp.float32)
    ref_mod = nn.ConvTranspose(6, (2, 2, 2), strides=(2, 2, 2),
                               padding=((1, 1),) * 3, use_bias=True)
    v = ref_mod.init(jax.random.PRNGKey(0), x)
    fast = transposed_conv(6, 2, 2, use_bias=True)
    assert isinstance(fast, SubpixelConvTranspose)
    np.testing.assert_allclose(np.asarray(fast.apply(v, x)),
                               np.asarray(ref_mod.apply(v, x)), atol=1e-5)
    # k != s keeps the flax path
    assert isinstance(transposed_conv(6, 3, 2), nn.ConvTranspose)


def test_fastconv_tuple_matches_concat():
    # FastConv can convolve a virtual channel-concat via a kernel split
    # (kept as an opt-in formulation; measured slower than XLA's fused
    # concat for the DynUNet decoder on v5e, see models/dynunet.py note)
    from unet3d_tpu.models.layers import FastConv
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 6, 6, 6, 3), jnp.float32)
    b = jnp.asarray(rng.rand(1, 6, 6, 6, 5), jnp.float32)
    mod = FastConv(4, (3, 3, 3), use_bias=True)
    v = mod.init(jax.random.PRNGKey(0), (a, b))
    split = mod.apply(v, (a, b))
    cat = mod.apply(v, jnp.concatenate([a, b], axis=-1))
    np.testing.assert_allclose(np.asarray(split), np.asarray(cat), atol=2e-5)


def test_dynunet_per_block_remat_matches_plain():
    """model.remat recomputes block activations in the backward pass; the
    forward must be bit-identical to the plain model with the same params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params

    kwargs = dict(in_channels=2, out_channels=2, spatial_dims=3,
                  strides=[[1, 1, 1], [2, 2, 2]], filters=[4, 8],
                  kernel_size=[[3, 3, 3]] * 2,
                  upsample_kernel_size=[[2, 2, 2]])
    plain = create_model("DynUNet", **kwargs)
    rem = create_model("DynUNet", remat=True, **kwargs)
    variables = init_params(plain, (8, 8, 8, 2))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 8, 2), jnp.float32)
    np.testing.assert_array_equal(np.asarray(plain.apply(variables, x)),
                                  np.asarray(rem.apply(variables, x)))
    # grads exist and are finite through the remat path
    def loss(params):
        return jnp.sum(rem.apply({"params": params}, x) ** 2)
    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
