"""Golden tests of device ops against the actual scipy.ndimage routines the
reference calls (not replicas): gaussian blur (`augment.py:414-419` /
elastic smoothing `augment.py:390-411`), binary erosion (contours,
`utils/one_hot.py:161-168`), and map_coordinates trilinear sampling with
reflect boundaries (elastic warp).
"""
import numpy as np
import pytest

scipy_ndimage = pytest.importorskip("scipy.ndimage")

import jax.numpy as jnp  # noqa: E402

from unet3d_tpu.data.transforms import separable_gaussian_blur
from unet3d_tpu.ops.one_hot import binary_erosion_3x3, estimate_binary_contour
from unet3d_tpu.ops.resample import sample_at_coords


@pytest.mark.parametrize("sigma", [0.8, 1.5, 2.5])
@pytest.mark.parametrize("mode,scipy_mode", [("zero", "constant"),
                                             ("edge", "nearest")])
def test_gaussian_blur_matches_scipy(sigma, mode, scipy_mode):
    rng = np.random.RandomState(0)
    vol = rng.rand(2, 12, 10, 14).astype(np.float32)
    ours = np.asarray(separable_gaussian_blur(jnp.asarray(vol),
                                              (sigma,) * 3, pad_mode=mode))
    ref = np.stack([scipy_ndimage.gaussian_filter(
        vol[c].astype(np.float64), sigma, mode=scipy_mode, truncate=4.0)
        for c in range(2)])
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_anisotropic_blur_matches_scipy():
    rng = np.random.RandomState(1)
    vol = rng.rand(1, 12, 12, 12).astype(np.float32)
    sigmas = (0.7, 1.3, 2.1)
    ours = np.asarray(separable_gaussian_blur(jnp.asarray(vol), sigmas,
                                              pad_mode="zero"))
    ref = scipy_ndimage.gaussian_filter(vol[0].astype(np.float64), sigmas,
                                        mode="constant", truncate=4.0)[None]
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_binary_erosion_matches_scipy_default_structure():
    rng = np.random.RandomState(2)
    mask = rng.rand(12, 12, 12) > 0.4
    ours = np.asarray(binary_erosion_3x3(jnp.asarray(mask)))
    # scipy default: 6-connected (connectivity-1) structuring element,
    # border_value=0
    ref = scipy_ndimage.binary_erosion(mask)
    np.testing.assert_array_equal(ours, ref)


def test_contours_match_scipy_xor():
    rng = np.random.RandomState(3)
    mask = rng.rand(10, 10, 10) > 0.5
    ours = np.asarray(estimate_binary_contour(jnp.asarray(mask)))
    ref = np.logical_xor(mask, scipy_ndimage.binary_erosion(mask))
    np.testing.assert_array_equal(ours, ref)


def test_trilinear_sampling_matches_map_coordinates_interior():
    rng = np.random.RandomState(4)
    vol = rng.rand(1, 10, 11, 12).astype(np.float32)
    # interior float coords (no boundary handling in play)
    coords = np.stack([rng.uniform(1, s - 2, size=(6, 5, 4))
                       for s in vol.shape[1:]]).astype(np.float32)
    ours = np.asarray(sample_at_coords(jnp.asarray(vol),
                                       jnp.asarray(coords)))[0]
    ref = scipy_ndimage.map_coordinates(vol[0].astype(np.float64), coords,
                                        order=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_elastic_reflect_boundary_matches_map_coordinates():
    """The elastic warp's half-sample reflection (ops/augment.py:313-319)
    against scipy map_coordinates(mode="reflect") on out-of-bounds coords."""
    rng = np.random.RandomState(5)
    vol = rng.rand(1, 8, 8, 8).astype(np.float32)
    spatial = vol.shape[1:]
    coords = np.stack([rng.uniform(-2.4, s + 1.6, size=(5, 5, 5))
                       for s in spatial]).astype(np.float32)
    # apply the same reflection the elastic path applies, then sample
    refl = coords.copy()
    for i, s in enumerate(spatial):
        c = refl[i]
        c = np.where(c < 0, -1.0 - c, c)
        c = np.where(c > s - 1, 2.0 * s - 1.0 - c, c)
        refl[i] = np.clip(c, 0, s - 1)
    ours = np.asarray(sample_at_coords(jnp.asarray(vol),
                                       jnp.asarray(refl)))[0]
    ref = scipy_ndimage.map_coordinates(vol[0].astype(np.float64), coords,
                                        order=1, mode="reflect")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
