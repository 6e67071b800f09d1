"""Native C++ NIfTI reader: availability, parity with the Python codec."""
import numpy as np
import pytest

from unet3d_tpu import native
from unet3d_tpu.data import nifti


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    affine = np.diag([-1.5, 2.0, 2.5, 1.0])
    affine[:3, 3] = [10, -20, 30]
    f32 = (np.random.RandomState(0).rand(20, 22, 24) * 1000).astype(np.float32)
    i16 = (np.random.RandomState(1).rand(10, 12, 14) * 100).astype(np.int16)
    fns = {}
    for name, data, ext in (("f32", f32, ".nii.gz"), ("i16", i16, ".nii"),
                            ("f32raw", f32, ".nii")):
        fn = str(root / (name + ext))
        nifti.save(fn, data, affine)
        fns[name] = (fn, data, affine)
    return fns


def test_native_builds():
    assert native.available()


def test_native_python_parity(files):
    for name, (fn, data, affine) in files.items():
        d_py, a_py, _ = nifti.load(fn, prefer_native=False)
        d_c, a_c, _ = nifti.load(fn, prefer_native=True)
        np.testing.assert_array_equal(d_py, d_c)
        np.testing.assert_allclose(a_py, a_c)
        np.testing.assert_array_equal(np.asarray(d_c), data)
        assert d_c.dtype == data.dtype


def test_native_missing_file_returns_none():
    assert native.load_nifti("/nonexistent/file.nii.gz") is None


def test_native_garbage_file_returns_none(tmp_path):
    fn = str(tmp_path / "junk.nii")
    open(fn, "wb").write(b"definitely not a nifti" * 30)
    assert native.load_nifti(fn) is None


def test_native_4d(tmp_path):
    data = np.random.RandomState(2).rand(6, 7, 8, 3).astype(np.float32)
    fn = str(tmp_path / "x4.nii.gz")
    nifti.save(fn, data, np.eye(4))
    result = native.load_nifti(fn)
    assert result is not None
    np.testing.assert_allclose(result[0], data)


def test_native_scl_scaling_parity(tmp_path):
    """scl_slope/scl_inter applied identically to the Python codec, including
    the sanitized non-finite intercept (malformed-header) case."""
    import struct

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    for slope, inter in ((2.0, 5.0), (float("nan"), 5.0),
                         (2.0, float("nan")), (0.0, 3.0)):
        fn = str(tmp_path / f"scl_{slope}_{inter}.nii")
        nifti.save(fn, data, np.eye(4))
        with open(fn, "r+b") as f:
            f.seek(112)
            f.write(struct.pack("<2f", slope, inter))
        d_py, _, _ = nifti.load(fn, prefer_native=False)
        d_c, _, _ = nifti.load(fn, prefer_native=True)
        assert np.isfinite(np.asarray(d_c)).all()
        np.testing.assert_array_equal(np.asarray(d_py), np.asarray(d_c))
