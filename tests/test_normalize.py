"""Normalization menu tests (`unet3d/utils/normalize.py` semantics)."""
import numpy as np

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
