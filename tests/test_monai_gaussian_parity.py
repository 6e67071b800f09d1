"""Pin gaussian-filter and intensity transforms to MONAI's exact numerics.

MONAI is not installable here, so each test replicates the relevant MONAI
routine in torch from its published source semantics and asserts our device
transform matches:

- ``gaussian_1d(..., approx="erf", normalize=False)`` (monai
  networks/layers/convutils.py): the voxel-integrated erf kernel with
  ``tail = int(max(sigma*truncated, 0.5) + 0.5)``, clamped at 0, NOT
  renormalized. ``GaussianFilter``/``GaussianSmooth`` apply it via
  ``separable_filtering(..., mode="zeros")`` — zero padding.
- ``AdjustContrast`` (monai transforms/intensity/array.py):
  ``((img-min)/(range+1e-7))**gamma * range + min`` with optional
  invert_image / retain_stats (torch-unbiased std).
- ``StdShiftIntensity``: offset = factor * torch.std(img[slice]) (unbiased),
  added to the sliced voxels only.

The reference wires these by name through monai.transforms
(`unet3d/datasets/segmentation.py:72-92`).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from unet3d_tpu.data.transforms import (RandAdjustContrastD,
                                        RandGaussianSmoothD,
                                        RandSpatialCropD,
                                        RandStdShiftIntensityD,
                                        gaussian_kernel1d,
                                        separable_gaussian_blur)


def monai_gaussian_1d_erf(sigma: float, truncated: float) -> torch.Tensor:
    sigma_t = torch.tensor(float(sigma))
    tail = int(max(float(sigma) * truncated, 0.5) + 0.5)
    x = torch.arange(-tail, tail + 1, dtype=torch.float)
    t = 0.70710678 / torch.abs(sigma_t)
    out = 0.5 * ((t * (x + 0.5)).erf() - (t * (x - 0.5)).erf())
    return out.clamp(min=0)


def monai_separable_blur(vol: np.ndarray, sigmas, truncated: float = 4.0):
    """MONAI GaussianFilter.forward: separable 1D convs, zero padding."""
    x = torch.from_numpy(np.asarray(vol, np.float32))[None]  # (1, C, D, H, W)
    for axis, sigma in enumerate(sigmas):
        if sigma <= 0:
            continue
        k = monai_gaussian_1d_erf(sigma, truncated)
        r = (len(k) - 1) // 2
        shape = [1, 1, 1, 1, 1]
        shape[2 + axis] = len(k)
        weight = k.reshape(shape).repeat(x.shape[1], 1, 1, 1, 1)
        pad = [0, 0, 0]
        pad[axis] = r
        x = torch.nn.functional.conv3d(x, weight, padding=tuple(pad),
                                       groups=x.shape[1])
    return x[0].numpy()


@pytest.mark.parametrize("sigma", [0.25, 0.7, 1.5, 2.4])
@pytest.mark.parametrize("truncated", [3.0, 4.0])
def test_erf_kernel_matches_monai_gaussian_1d(sigma, truncated):
    ours = gaussian_kernel1d(sigma, truncated=truncated, approx="erf")
    ref = monai_gaussian_1d_erf(sigma, truncated).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
    # the MONAI erf kernel is NOT renormalized (sums to slightly under 1)
    assert ours.sum() <= 1.0 + 1e-6


@pytest.mark.parametrize("sigmas,truncated", [
    ((0.8, 0.8, 0.8), 4.0),
    ((0.5, 1.2, 2.0), 4.0),
    ((1.4, 1.4, 1.4), 3.0),  # Rand3DElastic's GaussianFilter(3, sigma, 3.0)
])
def test_separable_blur_matches_monai_gaussian_filter(sigmas, truncated):
    rng = np.random.RandomState(0)
    vol = rng.rand(2, 10, 12, 9).astype(np.float32)
    ours = np.asarray(separable_gaussian_blur(
        jnp.asarray(vol), sigmas, pad_mode="zero", truncated=truncated,
        approx="erf"))
    ref = monai_separable_blur(vol, sigmas, truncated)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_rand_gaussian_smooth_applies_monai_filter():
    rng_img = np.random.RandomState(1)
    vol = rng_img.rand(1, 8, 9, 10).astype(np.float32)
    t = RandGaussianSmoothD(prob=1.0, sigma_x=(0.9, 0.9), sigma_y=(1.3, 1.3),
                            sigma_z=(0.6, 0.6))
    out, _ = t(np.random.RandomState(2), vol, None)
    ref = monai_separable_blur(vol, (0.9, 1.3, 0.6))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-6)


def monai_adjust_contrast(img: torch.Tensor, gamma: float,
                          invert_image: bool = False,
                          retain_stats: bool = False) -> torch.Tensor:
    epsilon = 1e-7
    if invert_image:
        img = -img
    if retain_stats:
        img_mean = img.mean()
        img_std = img.std()
    img_min = img.min()
    img_range = img.max() - img.min()
    ret = ((img - img_min) / float(img_range + epsilon)) ** gamma \
        * img_range + img_min
    if retain_stats:
        ret = ret - ret.mean()
        ret = ret / (ret.std() + 1e-8)
        ret = img_std * ret + img_mean
    if invert_image:
        ret = -ret
    return ret


@pytest.mark.parametrize("invert,retain", [(False, False), (True, False),
                                           (False, True), (True, True)])
def test_adjust_contrast_matches_monai(invert, retain):
    rng_img = np.random.RandomState(3)
    vol = (rng_img.rand(2, 6, 7, 8).astype(np.float32) * 4.0 - 1.0)
    gamma = 1.7
    t = RandAdjustContrastD(prob=1.0, gamma=(gamma, gamma),
                            invert_image=invert, retain_stats=retain)
    out, _ = t(np.random.RandomState(0), vol, None)
    ref = monai_adjust_contrast(torch.from_numpy(vol), gamma,
                                invert_image=invert, retain_stats=retain)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_adjust_contrast_scalar_gamma_validation():
    with pytest.raises(ValueError):
        RandAdjustContrastD(prob=1.0, gamma=0.4)
    t = RandAdjustContrastD(prob=1.0, gamma=2.0)
    assert t.gamma == (0.5, 2.0)


def monai_std_shift(img: torch.Tensor, factor: float, nonzero: bool,
                    channel_wise: bool) -> torch.Tensor:
    def shift_one(x):
        slices = (x != 0) if nonzero else torch.ones_like(x, dtype=torch.bool)
        if not slices.any():
            return x
        offset = factor * torch.std(x[slices])  # torch.std: unbiased
        out = x.clone()
        out[slices] = out[slices] + offset
        return out

    if channel_wise:
        return torch.stack([shift_one(img[c]) for c in range(img.shape[0])])
    return shift_one(img)


@pytest.mark.parametrize("nonzero,channel_wise", [(False, False),
                                                  (True, False),
                                                  (True, True),
                                                  (False, True)])
def test_std_shift_matches_monai(nonzero, channel_wise):
    rng_img = np.random.RandomState(4)
    vol = rng_img.rand(3, 5, 6, 7).astype(np.float32)
    vol[vol < 0.3] = 0.0  # give the nonzero mask something to exclude
    factor = 0.8
    t = RandStdShiftIntensityD(factors=(factor, factor), prob=1.0,
                               nonzero=nonzero, channel_wise=channel_wise)
    out, _ = t(np.random.RandomState(0), vol, None)
    ref = monai_std_shift(torch.from_numpy(vol), factor, nonzero, channel_wise)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_std_shift_all_zero_slice_is_noop():
    vol = np.zeros((1, 4, 4, 4), np.float32)
    t = RandStdShiftIntensityD(factors=(0.5, 0.5), prob=1.0, nonzero=True)
    out, _ = t(np.random.RandomState(0), vol, None)
    np.testing.assert_array_equal(np.asarray(out), vol)


def test_rand_spatial_crop_shapes_and_content():
    rng_img = np.random.RandomState(5)
    img = rng_img.rand(2, 12, 10, 14).astype(np.float32)
    lbl = rng_img.rand(1, 12, 10, 14).astype(np.float32)
    t = RandSpatialCropD(roi_size=(4, -1, 6))  # -1 keeps the full extent
    out_i, out_l = t(np.random.RandomState(0), img, lbl)
    out_i, out_l = np.asarray(out_i), np.asarray(out_l)
    assert out_i.shape == (2, 4, 10, 6)
    assert out_l.shape == (1, 4, 10, 6)
    # the crop window is shared between image and label and is a true slice
    found = False
    for d in range(12 - 4 + 1):
        for w in range(14 - 6 + 1):
            if np.array_equal(img[:, d:d + 4, :, w:w + 6], out_i):
                assert np.array_equal(lbl[:, d:d + 4, :, w:w + 6], out_l)
                found = True
    assert found


def test_rand_spatial_crop_roi_larger_than_volume():
    img = np.arange(2 * 4 * 4 * 4, dtype=np.float32).reshape(2, 4, 4, 4)
    t = RandSpatialCropD(roi_size=8)
    out, _ = t(np.random.RandomState(0), img, None)
    np.testing.assert_array_equal(np.asarray(out), img)
