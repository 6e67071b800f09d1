"""Registration family: RegUNet / GlobalNet / LocalNet + warp_image.

The reference resolves these via its `monai.networks.nets` star-import
(`models/pytorch/__init__.py:1`); registration is a distinct capability, so
beyond shapes these tests pin the behavioral contracts: GlobalNet's
zero-init affine head emits an exactly-zero DDF, warp by zero DDF is the
identity, and warp by a constant integer shift is an exact translation."""
import jax
import jax.numpy as jnp
import numpy as np

from unet3d_tpu.models.registry import create_model, init_params
from unet3d_tpu.models.regunet import warp_image


def _pair(seed=0, size=16):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(1, size, size, size, 2), jnp.float32)


def test_regunet_ddf_shape_and_grad():
    m = create_model("RegUNet", in_channels=2, num_channel_initial=2, depth=2)
    v = init_params(m, (16, 16, 16, 2))
    x = _pair()
    ddf, _ = m.apply(v, x, True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(0)})
    assert ddf.shape == (1, 16, 16, 16, 3)

    def loss(params):
        y = m.apply({"params": params,
                     "batch_stats": v["batch_stats"]}, x, False)
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(v["params"])
    leaf = np.asarray(g["encode_0"]["conv"]["conv"]["kernel"])
    assert np.abs(leaf).sum() > 0


def test_regunet_multi_level_extraction():
    m = create_model("RegUNet", in_channels=2, num_channel_initial=2, depth=2,
                     extract_levels=[0, 1, 2], concat_skip=True)
    v = init_params(m, (16, 16, 16, 2))
    ddf = m.apply(v, _pair(), False)
    assert ddf.shape == (1, 16, 16, 16, 3)


def test_globalnet_initial_ddf_is_zero():
    m = create_model("GlobalNet", in_channels=2, num_channel_initial=2, depth=2)
    v = init_params(m, (16, 16, 16, 2))
    ddf = m.apply(v, _pair(), False)
    # zero-kernel + identity-bias affine head => identity transform => DDF 0
    np.testing.assert_allclose(np.asarray(ddf), 0.0, atol=1e-5)


def test_globalnet_indivisible_raises():
    import pytest
    m = create_model("GlobalNet", in_channels=2, num_channel_initial=2, depth=3)
    with pytest.raises(ValueError, match="divisible"):
        init_params(m, (12, 12, 12, 2))


def test_localnet_defaults():
    m = create_model("LocalNet", in_channels=2, num_channel_initial=2, depth=2)
    assert m.extract_levels == (0, 1, 2)
    assert m.encode_kernel_sizes == (7, 3, 3)
    v = init_params(m, (16, 16, 16, 2))
    ddf = m.apply(v, _pair(), False)
    assert ddf.shape == (1, 16, 16, 16, 3)


def test_warp_identity_and_translation():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, 8, 8, 8, 2), jnp.float32)
    zero = jnp.zeros((1, 8, 8, 8, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(warp_image(img, zero)),
                               np.asarray(img), atol=1e-6)
    # shift +1 voxel along D: out(p) = img(p + 1)
    shift = zero.at[..., 0].set(1.0)
    out = np.asarray(warp_image(img, shift))
    np.testing.assert_allclose(out[:, :7], np.asarray(img)[:, 1:], atol=1e-6)
    np.testing.assert_allclose(out[:, 7], 0.0, atol=1e-6)  # zero padding
