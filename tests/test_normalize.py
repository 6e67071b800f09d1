"""Normalization menu tests (`unet3d/utils/normalize.py` semantics)."""
import numpy as np
import pytest

from unet3d_tpu.ops import normalize as nm


def rand(shape=(2, 4, 5, 6), seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32) * 10


def test_zero_mean_per_channel():
    x = rand()
    out = np.asarray(nm.zero_mean(x))
    for c in range(x.shape[0]):
        assert abs(out[c].mean()) < 1e-5
        assert abs(out[c].std(ddof=1) - 1.0) < 1e-4


def test_normalize_intensity_global():
    x = rand()
    out = np.asarray(nm.normalize_intensity(x))
    assert abs(out.mean()) < 1e-5
    assert abs(out.std() - 1.0) < 1e-4


def test_normalize_intensity_channel_wise():
    x = rand()
    out = np.asarray(nm.normalize_intensity(x, channel_wise=True))
    for c in range(x.shape[0]):
        assert abs(out[c].mean()) < 1e-5
        assert abs(out[c].std() - 1.0) < 1e-4


def test_normalize_intensity_nonzero_leaves_background():
    x = rand()
    x[:, :2] = 0.0
    out = np.asarray(nm.normalize_intensity(x, nonzero=True, channel_wise=True))
    assert (out[:, :2] == 0).all()
    fg = out[:, 2:]
    assert abs(fg.mean()) < 1e-4


def test_normalize_intensity_explicit_sub_div():
    x = rand()
    out = np.asarray(nm.normalize_intensity(x, subtrahend=5.0, divisor=2.0))
    np.testing.assert_allclose(out, (x - 5.0) / 2.0, atol=1e-6)


def test_percentile_window_clamps():
    x = rand()
    out = np.asarray(nm.percentile_window(x, 10, 90))
    for c in range(x.shape[0]):
        lo = np.percentile(x[c], 10)
        hi = np.percentile(x[c], 90)
        assert out[c].min() >= lo - 1e-5
        assert out[c].max() <= hi + 1e-5


def test_foreground_zero_mean():
    x = rand()
    x[:, 0] = 0.0  # background slab
    out = np.asarray(nm.foreground_zero_mean_normalize_image_data(x))
    assert (out[:, 0] == 0).all()
    for c in range(x.shape[0]):
        fg = out[c][np.abs(x[c]) > 1e-5]
        assert abs(fg.mean()) < 1e-4
        assert abs(fg.std(ddof=1) - 1.0) < 1e-3


def test_window_data():
    x = np.linspace(-100, 200, 64, dtype=np.float32).reshape(1, 4, 4, 4)
    out = np.asarray(nm.radiology_style_windowing(x, l=50, w=100))
    assert out.min() == 0.0 and out.max() == 1.0
    mid = np.asarray(nm.window_data(np.float32([[[[50.0]]]]), 0, 100, 0, 1))
    np.testing.assert_allclose(mid, 0.5)


def test_static_windows_stacks_channels():
    x = rand((1, 4, 4, 4))
    out = np.asarray(nm.static_windows(x, windows=[(40, 80), (600, 2800)]))
    assert out.shape == (2, 4, 4, 4)


def test_zero_one_window_range():
    x = rand()
    out = np.asarray(nm.zero_one_window(x))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_hist_match_distribution():
    src = rand((1, 6, 6, 6), seed=1)
    tmpl = rand((1, 6, 6, 6), seed=2) * 5 + 100
    out = np.asarray(nm.hist_match(src, tmpl))
    # matched output takes values from the template's range
    assert out.min() >= tmpl.min() - 1e-3
    assert out.max() <= tmpl.max() + 1e-3
    # order is preserved
    flat_src = src.ravel()
    flat_out = out.ravel()
    idx = np.argsort(flat_src)
    assert (np.diff(flat_out[idx]) >= -1e-5).all()


# ---------------------------------------------------------------- MONAI scale
# numpy replicas of monai.transforms intensity normalizers (MONAI is not
# installable here); the reference resolves these by name through
# monai.transforms (`unet3d/datasets/segmentation.py:80-87`).

def _monai_rescale_array(arr, minv, maxv):
    mina, maxa = arr.min(), arr.max()
    if mina == maxa:
        return arr * minv
    norm = (arr - mina) / (maxa - mina)
    return norm * (maxv - minv) + minv


def test_scale_intensity_matches_monai():
    from unet3d_tpu.ops.normalize import scale_intensity
    rng = np.random.RandomState(0)
    vol = (rng.rand(2, 5, 6, 7).astype(np.float32) * 9.0 - 3.0)
    out = np.asarray(scale_intensity(vol, minv=-1.0, maxv=2.0))
    np.testing.assert_allclose(out, _monai_rescale_array(vol, -1.0, 2.0),
                               rtol=1e-6, atol=1e-6)
    # channel_wise rescales each channel independently
    out_cw = np.asarray(scale_intensity(vol, minv=0.0, maxv=1.0,
                                        channel_wise=True))
    ref_cw = np.stack([_monai_rescale_array(vol[c], 0.0, 1.0)
                       for c in range(2)])
    np.testing.assert_allclose(out_cw, ref_cw, rtol=1e-6, atol=1e-6)
    # factor form: x * (1 + factor)
    out_f = np.asarray(scale_intensity(vol, minv=None, maxv=None, factor=0.25))
    np.testing.assert_allclose(out_f, vol * 1.25, rtol=1e-6)
    # degenerate constant array maps to arr * minv
    const = np.full((1, 4, 4, 4), 3.0, np.float32)
    np.testing.assert_allclose(
        np.asarray(scale_intensity(const, minv=0.5, maxv=1.0)), const * 0.5)
    # MONAI rescale_array: when minv OR maxv is None the bare 0-1 norm is
    # returned (the other bound is ignored)
    norm01 = (vol - vol.min()) / (vol.max() - vol.min())
    np.testing.assert_allclose(
        np.asarray(scale_intensity(vol, minv=None, maxv=5.0)), norm01,
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scale_intensity(vol, minv=-2.0, maxv=None)), norm01,
        rtol=1e-6, atol=1e-6)
    # degenerate + minv None: MONAI returns the array unchanged
    np.testing.assert_allclose(
        np.asarray(scale_intensity(const, minv=None, maxv=1.0)), const)


def test_scale_intensity_range_matches_monai():
    from unet3d_tpu.ops.normalize import scale_intensity_range
    rng = np.random.RandomState(1)
    vol = (rng.rand(1, 6, 6, 6).astype(np.float32) * 2000.0 - 1000.0)
    # CT windowing style: [-57, 164] HU -> [0, 1], clipped
    out = np.asarray(scale_intensity_range(vol, a_min=-57.0, a_max=164.0,
                                           b_min=0.0, b_max=1.0, clip=True))
    ref = (vol - (-57.0)) / (164.0 - (-57.0))
    ref = np.clip(ref * 1.0 + 0.0, 0.0, 1.0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    # no output range: just the affine map to [0, 1] of the input window
    out2 = np.asarray(scale_intensity_range(vol, a_min=0.0, a_max=100.0))
    np.testing.assert_allclose(out2, vol / 100.0, rtol=1e-5, atol=1e-6)


def test_scale_intensity_range_percentiles_matches_monai():
    from unet3d_tpu.ops.normalize import scale_intensity_range_percentiles
    rng = np.random.RandomState(2)
    vol = rng.rand(2, 6, 6, 6).astype(np.float32) * 50.0
    lower, upper = 5.0, 95.0
    out = np.asarray(scale_intensity_range_percentiles(
        vol, lower=lower, upper=upper, b_min=0.0, b_max=1.0, clip=True))
    a_min = np.percentile(vol, lower)
    a_max = np.percentile(vol, upper)
    ref = np.clip((vol - a_min) / (a_max - a_min), 0.0, 1.0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # relative mode rescales the output window to the percentile span
    out_rel = np.asarray(scale_intensity_range_percentiles(
        vol, lower=lower, upper=upper, b_min=0.0, b_max=10.0, relative=True))
    b_min_rel = 10.0 * (lower / 100.0)
    b_max_rel = 10.0 * (upper / 100.0)
    ref_rel = ((vol - a_min) / (a_max - a_min)) * (b_max_rel - b_min_rel) \
        + b_min_rel
    np.testing.assert_allclose(out_rel, ref_rel, rtol=1e-4, atol=1e-4)
    # channel_wise computes the percentiles per channel
    out_cw = np.asarray(scale_intensity_range_percentiles(
        vol, lower=lower, upper=upper, b_min=0.0, b_max=1.0,
        channel_wise=True))
    refs = []
    for c in range(2):
        lo = np.percentile(vol[c], lower)
        hi = np.percentile(vol[c], upper)
        refs.append((vol[c] - lo) / (hi - lo))
    np.testing.assert_allclose(out_cw, np.stack(refs), rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError):
        scale_intensity_range_percentiles(vol, lower=-1.0, upper=95.0,
                                          b_min=0.0, b_max=1.0)


def test_threshold_and_shift_intensity_match_monai():
    from unet3d_tpu.ops.normalize import shift_intensity, threshold_intensity
    vol = np.arange(-4, 4, dtype=np.float32).reshape(1, 2, 2, 2)
    out = np.asarray(threshold_intensity(vol, threshold=0.0, above=True,
                                         cval=-9.0))
    np.testing.assert_array_equal(out, np.where(vol > 0, vol, -9.0))
    out_b = np.asarray(threshold_intensity(vol, threshold=0.0, above=False,
                                           cval=7.0))
    np.testing.assert_array_equal(out_b, np.where(vol < 0, vol, 7.0))
    np.testing.assert_allclose(np.asarray(shift_intensity(vol, 2.5)),
                               vol + 2.5)


def test_monai_scale_names_resolve_in_dataset_registry():
    from unet3d_tpu.data.dataset import apply_normalization
    vol = np.random.RandomState(3).rand(1, 4, 4, 4).astype(np.float32) * 10
    out = np.asarray(apply_normalization(
        vol, "ScaleIntensityRangeD",
        {"a_min": 0.0, "a_max": 10.0, "b_min": 0.0, "b_max": 1.0,
         "clip": True}))
    assert out.min() >= 0.0 and out.max() <= 1.0
    out2 = np.asarray(apply_normalization(vol, "ScaleIntensityD",
                                          {"minv": 0.0, "maxv": 1.0}))
    np.testing.assert_allclose(out2.max(), 1.0, atol=1e-6)
