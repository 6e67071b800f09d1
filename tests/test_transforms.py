"""Augmentation-registry tests: every MONAI-named transform runs, respects prob
gating, and applies shared distortions to image+label."""
import numpy as np
import pytest

from unet3d_tpu.data.transforms import TRANSFORM_REGISTRY, build_transform


def _sample():
    rng = np.random.RandomState(0)
    img = rng.rand(2, 12, 12, 12).astype(np.float32)
    lbl = (rng.rand(1, 12, 12, 12) > 0.5).astype(np.float32)
    return img, lbl


SPECS = [
    {"name": "RandFlipD", "prob": 1.0, "spatial_axis": 0},
    {"name": "RandRotate90D", "prob": 1.0},
    {"name": "RandRotateD", "prob": 1.0, "range_x": 0.3},
    {"name": "RandZoomD", "prob": 1.0, "min_zoom": 0.8, "max_zoom": 0.9},
    {"name": "RandAffineD", "prob": 1.0, "rotate_range": 0.2, "scale_range": 0.1,
     "translate_range": 0.05},
    {"name": "RandScaleIntensityD", "prob": 1.0, "factors": 0.2},
    {"name": "RandShiftIntensityD", "prob": 1.0, "offsets": 0.2},
    {"name": "RandGaussianNoiseD", "prob": 1.0, "std": 0.05},
    {"name": "RandGaussianSmoothD", "prob": 1.0},
    {"name": "RandAdjustContrastD", "prob": 1.0, "gamma": (1.5, 2.0)},
]


@pytest.mark.parametrize("spec", SPECS, ids=[s["name"] for s in SPECS])
def test_transform_applies(spec):
    img, lbl = _sample()
    t = build_transform(spec)
    out_img, out_lbl = t(np.random.RandomState(1), img, lbl)
    assert np.asarray(out_img).shape == img.shape
    assert not np.allclose(np.asarray(out_img), img)  # prob=1 must change image
    if t.spatial:
        assert not np.array_equal(np.asarray(out_lbl), lbl) or spec["name"] == "RandZoomD"
    else:
        np.testing.assert_array_equal(np.asarray(out_lbl), lbl)


@pytest.mark.parametrize("spec", SPECS, ids=[s["name"] for s in SPECS])
def test_prob_zero_is_identity(spec):
    img, lbl = _sample()
    t = build_transform({**spec, "prob": 0.0})
    out_img, out_lbl = t(np.random.RandomState(1), img, lbl)
    np.testing.assert_array_equal(np.asarray(out_img), img)


def test_flip_applies_same_to_label():
    img, lbl = _sample()
    t = build_transform({"name": "RandFlipD", "prob": 1.0, "spatial_axis": 1})
    oi, ol = t(np.random.RandomState(0), img, lbl)
    np.testing.assert_array_equal(np.asarray(oi), img[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(ol), lbl[:, :, ::-1])


def test_lowercase_monai_spelling():
    assert "RandFlipd" in TRANSFORM_REGISTRY
    t = build_transform({"name": "RandFlipd", "prob": 1.0, "spatial_axis": 0})
    img, lbl = _sample()
    oi, _ = t(np.random.RandomState(0), img, lbl)
    np.testing.assert_array_equal(np.asarray(oi), img[:, ::-1])


def test_unknown_transform_raises():
    with pytest.raises(ValueError, match="not supported"):
        build_transform({"name": "RandNoSuchD"})


def test_rotate_deterministic_given_rng():
    img, lbl = _sample()
    t = build_transform({"name": "RandRotateD", "prob": 1.0, "range_x": 0.3})
    a, _ = t(np.random.RandomState(7), img, lbl)
    b, _ = t(np.random.RandomState(7), img, lbl)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rand_rotate_tuple_range_is_min_max():
    """MONAI: range_x=(a, b) samples U(a, b); a scalar samples U(-r, r).
    Regression: tuple ranges collapsed to U(-a, a), silently disabling
    rotation for (0, b) configs."""
    import numpy as np

    from unet3d_tpu.data.transforms import RandRotateD

    t = RandRotateD(prob=1.0, range_x=(0.2, 0.3))
    assert t.ranges[0] == (0.2, 0.3)
    assert t.ranges[1] == (0.0, 0.0)
    rng = np.random.RandomState(0)
    img = np.random.RandomState(1).rand(1, 8, 8, 8).astype(np.float32)
    out, _ = t(rng, img, None)
    assert not np.allclose(np.asarray(out), img)  # rotation actually applied


def test_rand_affine_scalar_range_first_axis_only():
    """MONAI RandAffined: a scalar rotate_range applies to the FIRST axis
    only (ensure_tuple), not broadcast to all three."""
    from unet3d_tpu.data.transforms import RandAffineD

    t = RandAffineD(prob=1.0, rotate_range=0.26)
    assert t.rotate_range[0] == (-0.26, 0.26)
    assert t.rotate_range[1] == (0.0, 0.0)
    assert t.rotate_range[2] == (0.0, 0.0)


def test_rand_affine_shear_is_applied():
    import numpy as np

    from unet3d_tpu.data.transforms import RandAffineD

    t = RandAffineD(prob=1.0, shear_range=[0.3, 0.3])
    img = np.random.RandomState(1).rand(1, 8, 8, 8).astype(np.float32)
    out, _ = t(np.random.RandomState(0), img, None)
    assert not np.allclose(np.asarray(out), img)


def test_rand_zoom_out_pads_with_edge_values():
    """MONAI RandZoomd keep_size pads zoom-out with edge values, not zeros."""
    import numpy as np

    from unet3d_tpu.data.transforms import RandZoomD

    t = RandZoomD(prob=1.0, min_zoom=0.5, max_zoom=0.5)
    img = np.full((1, 8, 8, 8), 7.0, np.float32)
    out, _ = t(np.random.RandomState(0), img, None)
    # a zero-filled border would pull corner values toward 0
    assert float(np.asarray(out).min()) > 6.9


def test_pad_or_crop_center_matches_monai_convention():
    """CenterSpatialCrop starts at s//2 - t//2 (one voxel later than (s-t)//2
    when s is even and t odd)."""
    import numpy as np

    from unet3d_tpu.ops.crop import pad_or_crop

    arr = np.arange(4, dtype=np.float32).reshape(1, 4, 1, 1)
    arr = np.broadcast_to(arr, (1, 4, 4, 4)).copy()
    out = pad_or_crop(arr, (3, 4, 4))
    # s=4, t=3: start = 4//2 - 3//2 = 1 -> values 1, 2, 3
    np.testing.assert_array_equal(out[0, :, 0, 0], [1.0, 2.0, 3.0])


# ---------------------------------------------------------------- round 3


NEW_SPECS = [
    {"name": "RandBiasFieldD", "prob": 1.0, "degree": 2,
     "coeff_range": (0.2, 0.4)},
    {"name": "RandHistogramShiftD", "prob": 1.0, "num_control_points": 6},
    {"name": "RandGaussianSharpenD", "prob": 1.0},
    {"name": "RandCoarseDropoutD", "prob": 1.0, "holes": 3, "spatial_size": 4},
]


@pytest.mark.parametrize("spec", NEW_SPECS, ids=[s["name"] for s in NEW_SPECS])
def test_new_intensity_transform_applies(spec):
    img, lbl = _sample()
    t = build_transform(spec)
    out_img, out_lbl = t(np.random.RandomState(1), img, lbl)
    assert np.asarray(out_img).shape == img.shape
    assert not np.allclose(np.asarray(out_img), img)
    assert np.array_equal(np.asarray(out_lbl), lbl)  # intensity-only


def test_bias_field_is_positive_multiplicative():
    img = np.ones((1, 8, 8, 8), np.float32)
    t = build_transform({"name": "RandBiasFieldD", "prob": 1.0,
                         "coeff_range": (0.1, 0.3)})
    out, _ = t(np.random.RandomState(0), img, None)
    out = np.asarray(out)
    assert (out > 0).all()          # exp field is strictly positive
    assert out.std() > 0            # spatially varying
    # multiplicative: doubling the image doubles the output (same rng draw)
    out2, _ = t(np.random.RandomState(0), 2 * img, None)
    np.testing.assert_allclose(np.asarray(out2), 2 * out, rtol=1e-5)


def test_histogram_shift_monotone_and_range_preserving():
    img, _ = _sample()
    t = build_transform({"name": "RandHistogramShiftD", "prob": 1.0,
                         "num_control_points": (5, 8)})
    out, _ = t(np.random.RandomState(3), img, None)
    out = np.asarray(out)
    # endpoints are fixed points: min/max preserved
    np.testing.assert_allclose(out.min(), img.min(), atol=1e-5)
    np.testing.assert_allclose(out.max(), img.max(), atol=1e-5)
    # monotone: ordering of voxel intensities is preserved
    flat_in = img.ravel()
    flat_out = out.ravel()
    order = np.argsort(flat_in)
    assert (np.diff(flat_out[order]) >= -1e-6).all()


def test_gaussian_sharpen_formula():
    from unet3d_tpu.data.transforms import separable_gaussian_blur
    img, _ = _sample()
    # pair-valued sigmas pin every draw so the unsharp formula is exact
    t = build_transform({"name": "RandGaussianSharpenD", "prob": 1.0,
                         "sigma1_x": 1.0, "sigma1_y": 1.0, "sigma1_z": 1.0,
                         "sigma2_x": (0.5, 0.5), "sigma2_y": (0.5, 0.5),
                         "sigma2_z": (0.5, 0.5), "alpha": (20.0, 20.0)})
    out, _ = t(np.random.RandomState(0), img, None)
    b1 = separable_gaussian_blur(img, [1.0, 1.0, 1.0], pad_mode="zero",
                                 approx="erf")
    b2 = separable_gaussian_blur(b1, [0.5, 0.5, 0.5], pad_mode="zero",
                                 approx="erf")
    expected = b1 + 20.0 * (b1 - b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-4)


def test_gaussian_sharpen_scalar_sigma2_samples_up_to_sigma1():
    """MONAI: a SCALAR sigma2 component x samples U(x, sampled_sigma1), not a
    fixed x — with sigma1 pinned to 1.0 and sigma2_x=0.5 the drawn sigma2 must
    land strictly inside (0.5, 1.0) for some seed (fixed-x behavior never
    moves off 0.5)."""
    from unet3d_tpu.data.transforms import RandGaussianSharpenD, \
        separable_gaussian_blur
    img, _ = _sample()
    t = RandGaussianSharpenD(prob=1.0, sigma1_x=(1.0, 1.0), sigma1_y=(1.0, 1.0),
                             sigma1_z=(1.0, 1.0), sigma2_x=0.5, sigma2_y=0.5,
                             sigma2_z=0.5, alpha=(20.0, 20.0))
    rng = np.random.RandomState(3)
    out, _ = t(rng, img, None)
    fixed_rng = np.random.RandomState(3)
    fixed_rng.rand()  # the prob gate draw
    b1 = separable_gaussian_blur(img, [1.0, 1.0, 1.0], pad_mode="zero",
                                 approx="erf")
    b2_fixed = separable_gaussian_blur(b1, [0.5, 0.5, 0.5], pad_mode="zero",
                                       approx="erf")
    fixed = b1 + 20.0 * (b1 - b2_fixed)
    assert not np.allclose(np.asarray(out), np.asarray(fixed), rtol=1e-4)


def test_coarse_dropout_holes_and_inverse():
    img = np.full((1, 12, 12, 12), 5.0, np.float32)
    t = build_transform({"name": "RandCoarseDropoutD", "prob": 1.0, "holes": 2,
                         "spatial_size": 4, "fill_value": 0.0})
    out, _ = t(np.random.RandomState(0), img, None)
    out = np.asarray(out)
    assert (out == 0).any() and (out == 5.0).any()
    # dropout_holes=False fills everything OUTSIDE the holes
    t_inv = build_transform({"name": "RandCoarseDropoutD", "prob": 1.0,
                             "holes": 2, "spatial_size": 4,
                             "dropout_holes": False, "fill_value": -1.0})
    out_inv, _ = t_inv(np.random.RandomState(0), img, None)
    out_inv = np.asarray(out_inv)
    # same rng -> same holes: the kept/filled regions are complementary
    np.testing.assert_array_equal(out == 0.0, out_inv == 5.0)


def test_coarse_dropout_random_fill_range():
    img = np.zeros((1, 10, 10, 10), np.float32)
    t = build_transform({"name": "RandCoarseDropoutD", "prob": 1.0, "holes": 1,
                         "spatial_size": 6, "fill_value": (2.0, 3.0)})
    out = np.asarray(t(np.random.RandomState(1), img, None)[0])
    filled = out[out != 0]
    assert filled.size > 0
    assert (filled >= 2.0).all() and (filled < 3.0).all()
    assert filled.std() > 0  # per-voxel random, not constant


def test_rand_spatial_crop_samples_stacks():
    img, lbl = _sample()
    t = build_transform({"name": "RandSpatialCropSamplesD",
                         "roi_size": [6, 6, 6], "num_samples": 4})
    out_img, out_lbl = t(np.random.RandomState(0), img, lbl)
    assert np.asarray(out_img).shape == (4, 2, 6, 6, 6)
    assert np.asarray(out_lbl).shape == (4, 1, 6, 6, 6)
    # crops are (almost surely) different
    assert not np.allclose(np.asarray(out_img)[0], np.asarray(out_img)[1])


# ------------------------------------------------------- round 3 session 3


SESSION3_INTENSITY_SPECS = [
    {"name": "RandStdShiftIntensityD", "prob": 1.0, "factors": (0.5, 0.5)},
    {"name": "RandRicianNoiseD", "prob": 1.0, "std": 0.5, "sample_std": False},
    {"name": "RandGibbsNoiseD", "prob": 1.0, "alpha": (0.8, 0.8)},
]


@pytest.mark.parametrize("spec", SESSION3_INTENSITY_SPECS,
                         ids=[s["name"] for s in SESSION3_INTENSITY_SPECS])
def test_session3_intensity_transform_applies(spec):
    img, lbl = _sample()
    t = build_transform(spec)
    out_img, out_lbl = t(np.random.RandomState(2), img, lbl)
    assert np.asarray(out_img).shape == img.shape
    assert not np.allclose(np.asarray(out_img), img)
    assert np.array_equal(np.asarray(out_lbl), lbl)


def test_std_shift_matches_formula():
    img, _ = _sample()
    t = build_transform({"name": "RandStdShiftIntensityD", "prob": 1.0,
                         "factors": (0.5, 0.5)})
    out, _ = t(np.random.RandomState(0), img, None)
    # MONAI's torch path uses the Bessel-corrected std (torch.std default)
    np.testing.assert_allclose(np.asarray(out), img + 0.5 * img.std(ddof=1),
                               rtol=1e-5, atol=1e-5)


def test_rician_noise_is_nonnegative_magnitude():
    img = np.zeros((1, 8, 8, 8), np.float32)
    t = build_transform({"name": "RandRicianNoiseD", "prob": 1.0, "std": 1.0,
                         "sample_std": False})
    out, _ = t(np.random.RandomState(3), img, None)
    assert np.all(np.asarray(out) >= 0)  # |n1 + i n2| of pure noise
    assert np.asarray(out).mean() > 0.5


def test_gibbs_alpha_zero_is_identity():
    img, _ = _sample()
    t = build_transform({"name": "RandGibbsNoiseD", "prob": 1.0,
                         "alpha": (0.0, 0.0)})
    out, _ = t(np.random.RandomState(4), img, None)
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-4, atol=1e-4)


def test_elastic_warps_image_and_label_together():
    img, lbl = _sample()
    t = build_transform({"name": "Rand3DElasticD", "prob": 1.0,
                         "sigma_range": (2.0, 2.0),
                         "magnitude_range": (8.0, 8.0)})
    out_img, out_lbl = t(np.random.RandomState(5), img, lbl)
    assert np.asarray(out_img).shape == img.shape
    assert not np.allclose(np.asarray(out_img), img)
    # nearest-warped label stays integral
    vals = np.unique(np.asarray(out_lbl))
    assert set(vals).issubset(set(np.unique(lbl)))
    assert not np.array_equal(np.asarray(out_lbl), lbl)


def test_elastic_rejects_affine_extras():
    with pytest.raises(NotImplementedError, match="RandAffineD"):
        build_transform({"name": "Rand3DElasticD", "prob": 1.0,
                         "rotate_range": 0.3})


def test_center_spatial_crop_centers():
    img = np.arange(8, dtype=np.float32).reshape(1, 8, 1, 1)
    img = np.broadcast_to(img, (1, 8, 8, 8)).copy()
    lbl = img.copy()
    t = build_transform({"name": "CenterSpatialCropD", "roi_size": [4, -1, 8]})
    out_img, out_lbl = t(np.random.RandomState(0), img, lbl)
    assert np.asarray(out_img).shape == (1, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(out_img)[0, :, 0, 0],
                                  [2.0, 3.0, 4.0, 5.0])
    assert np.asarray(out_lbl).shape == (1, 4, 8, 8)


def test_rand_affine_reflection_matches_torch_grid_sample():
    """The reflection padding added for MONAI RandAffined's default maps
    out-of-volume coords exactly like torch grid_sample
    padding_mode='reflection', align_corners=True."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import jax.numpy as jnp

    from unet3d_tpu.ops.resample import resample_transform

    rng = np.random.RandomState(5)
    vol = rng.rand(1, 7, 8, 9).astype(np.float32)
    # a transform that pushes well outside the volume on every axis
    tr = np.eye(4)
    tr[:3, :3] = np.diag([1.3, 0.7, 1.1])
    tr[:3, 3] = [-2.5, 3.0, -4.0]
    ours = np.asarray(resample_transform(jnp.asarray(vol), jnp.asarray(tr),
                                         (7, 8, 9), mode="trilinear",
                                         reflect=True))[0]
    zz, yy, xx = np.meshgrid(np.arange(7), np.arange(8), np.arange(9),
                             indexing="ij")
    dst = np.stack([zz, yy, xx, np.ones_like(zz)]).reshape(4, -1)
    src = (tr @ dst)[:3].reshape(3, 7, 8, 9)
    norm = [2 * src[i] / (s - 1) - 1 for i, s in enumerate((7, 8, 9))]
    grid = np.stack([norm[2], norm[1], norm[0]], axis=-1)[None].astype(np.float32)
    want = F.grid_sample(torch.from_numpy(vol[None]), torch.from_numpy(grid),
                         mode="bilinear", padding_mode="reflection",
                         align_corners=True)[0, 0].numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_keep_size_false_fails_fast():
    from unet3d_tpu.data.transforms import RandRotateD, RandZoomD

    with pytest.raises(NotImplementedError, match="keep_size"):
        RandRotateD(prob=1.0, range_x=0.3, keep_size=False)
    with pytest.raises(NotImplementedError, match="keep_size"):
        RandZoomD(prob=1.0, keep_size=False)


def test_per_key_mode_sequence_maps_image_and_label():
    """MONAI dict-transform configs pass mode=['bilinear', 'nearest'] matched
    to keys=('image', 'label'); previously this crashed at resample time."""
    from unet3d_tpu.data.transforms import RandRotateD

    t = RandRotateD(prob=1.0, range_x=0.3, mode=["bilinear", "nearest"])
    assert t.mode == "trilinear" and t.label_mode == "nearest"
    img, lbl = _sample()
    out_img, out_lbl = t(np.random.RandomState(2), img, lbl)
    # nearest-warped label stays integral
    assert set(np.unique(np.asarray(out_lbl))).issubset({0.0, 1.0})
    with pytest.raises(ValueError, match="per-key"):
        RandRotateD(prob=1.0, mode=["bilinear", "nearest"],
                    label_mode="nearest")


def test_intensity_single_element_sequence_rejected():
    """A 1-element factors/offsets sequence previously fell through to
    np.random.uniform(low=x, high=1.0) — MONAI rejects it."""
    from unet3d_tpu.data.transforms import (RandScaleIntensityD,
                                            RandShiftIntensityD)

    with pytest.raises(ValueError, match="factors"):
        RandScaleIntensityD(prob=1.0, factors=[0.1])
    with pytest.raises(ValueError, match="offsets"):
        RandShiftIntensityD(prob=1.0, offsets=[0.1])
    # scalar keeps MONAI's U(-x, x); pair keeps U(a, b)
    assert RandScaleIntensityD(factors=0.2).factors == (-0.2, 0.2)
    assert RandShiftIntensityD(offsets=(0.1, 0.3)).offsets == (0.1, 0.3)


def test_rand_affine_padding_mode_border_and_zeros():
    from unet3d_tpu.data.transforms import RandAffineD

    img = np.full((1, 8, 8, 8), 7.0, np.float32)
    # large translation: zeros must pull the border toward 0, border must not
    z, _ = RandAffineD(prob=1.0, translate_range=[(4.0, 4.0)],
                       padding_mode="zeros")(np.random.RandomState(0), img, None)
    b, _ = RandAffineD(prob=1.0, translate_range=[(4.0, 4.0)],
                       padding_mode="border")(np.random.RandomState(0), img, None)
    r, _ = RandAffineD(prob=1.0, translate_range=[(4.0, 4.0)])(
        np.random.RandomState(0), img, None)  # default: reflection
    assert float(np.asarray(z).min()) == 0.0
    assert float(np.asarray(b).min()) > 6.9
    assert float(np.asarray(r).min()) > 6.9  # constant volume reflects to itself
    with pytest.raises(ValueError, match="padding_mode"):
        RandAffineD(prob=1.0, padding_mode="wrap")


def test_gibbs_binary_lowpass_mask_semantics():
    """MONAI GibbsNoise truncates k-space with a BINARY mask of radius
    (1-alpha)*max(shape)*sqrt(2)/2 around the center (GibbsNoise._apply_mask)
    — not a smooth attenuation. alpha=1 keeps nothing (output ~0 on an
    even-shaped image where no voxel sits exactly at the k-space center);
    alpha in [0,1] is validated."""
    img, _ = _sample()
    t = build_transform({"name": "RandGibbsNoiseD", "prob": 1.0,
                         "alpha": (1.0, 1.0)})
    out, _ = t(np.random.RandomState(0), img, None)
    assert float(np.abs(np.asarray(out)).max()) < 1e-4
    # moderate alpha: a low-pass truncation preserves the image mean (DC term)
    t = build_transform({"name": "RandGibbsNoiseD", "prob": 1.0,
                         "alpha": (0.6, 0.6)})
    out, _ = t(np.random.RandomState(1), img, None)
    assert not np.allclose(np.asarray(out), img)
    np.testing.assert_allclose(float(np.asarray(out).mean()),
                               float(np.asarray(img).mean()), rtol=1e-3)
    with pytest.raises(ValueError, match="alpha"):
        build_transform({"name": "RandGibbsNoiseD", "alpha": (0.0, 1.5)})


def test_bias_field_matches_monai_polygrid3d():
    """MONAI RandBiasField builds exp(polygrid3d(coords, coeff_mat)) with
    monomial exponents enumerated i-major (i+j+k <= degree) and ONE uniform
    draw for the coefficient vector (_generate_random_field). Replicate that
    exactly with numpy.polynomial and the same RandomState draws."""
    img, _ = _sample()
    degree, rng_seed = 3, 7
    t = build_transform({"name": "RandBiasFieldD", "prob": 1.0,
                         "degree": degree, "coeff_range": (0.0, 0.1)})
    out, _ = t(np.random.RandomState(rng_seed), img, None)

    ref_rng = np.random.RandomState(rng_seed)
    assert ref_rng.rand() < 1.0  # the prob gate consumes one draw
    pts = [(i, j, k)
           for i in range(degree + 1)
           for j in range(degree + 1 - i)
           for k in range(degree + 1 - i - j)]
    coeff = ref_rng.uniform(0.0, 0.1, size=len(pts))
    coeff_mat = np.zeros((degree + 1,) * 3)
    for c, (i, j, k) in zip(coeff, pts):
        coeff_mat[i, j, k] = c
    shape = img.shape[-3:]
    coords = [np.linspace(-1.0, 1.0, s, dtype=np.float32) for s in shape]
    field = np.polynomial.polynomial.polygrid3d(*coords, coeff_mat)
    expected = np.asarray(img) * np.exp(field)[None]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


def test_histogram_shift_matches_monai_control_point_algorithm():
    """MONAI RandHistogramShift.randomize: n = randint(lo, hi+1) control
    points over linspace(0,1,n); each interior floating point is redrawn as
    U(floating[i-1], reference[i+1]); apply() linearly interpolates between
    the point sets scaled to the image range. Replicate with the same
    RandomState and assert exact agreement (modulo f32)."""
    img, _ = _sample()
    seed = 11
    t = build_transform({"name": "RandHistogramShiftD", "prob": 1.0,
                         "num_control_points": (5, 8)})
    out, _ = t(np.random.RandomState(seed), img, None)

    ref_rng = np.random.RandomState(seed)
    assert ref_rng.rand() < 1.0  # prob gate draw
    n = ref_rng.randint(5, 9)
    reference = np.linspace(0.0, 1.0, n)
    floating = reference.copy()
    for i in range(1, n - 1):
        floating[i] = ref_rng.uniform(floating[i - 1], reference[i + 1])
    imgn = np.asarray(img, np.float32)
    vmin, vmax = imgn.min(), imgn.max()
    scale = vmax - vmin
    expected = np.interp(imgn,
                         reference.astype(np.float32) * scale + vmin,
                         floating.astype(np.float32) * scale + vmin)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=2e-6)
