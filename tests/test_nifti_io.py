"""NIfTI codec + Volume IO tests (temp files, like `test/test_predict_volumetric.py`)."""
import numpy as np
import pytest

from unet3d_tpu.data import nifti
from unet3d_tpu.data.image import Volume
from unet3d_tpu.data.io import (load_image, load_single_image,
                                break_down_volume_into_half_size_volumes,
                                combine_half_size_volumes)
from unet3d_tpu.data.orientation import (apply_orientation, io_orientation,
                                         axcodes_to_orientation, orientation_to_axcodes)


def test_nifti_roundtrip(tmp_path):
    data = np.random.RandomState(0).rand(6, 7, 8).astype(np.float32)
    affine = np.diag([2.0, 3.0, 4.0, 1.0])
    affine[:3, 3] = [-10, 5, 7]
    fn = str(tmp_path / "x.nii.gz")
    nifti.save(fn, data, affine)
    out, out_affine, hdr = nifti.load(fn)
    np.testing.assert_allclose(out, data)
    np.testing.assert_allclose(out_affine, affine)


def test_nifti_roundtrip_uncompressed(tmp_path):
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    fn = str(tmp_path / "x.nii")
    nifti.save(fn, data, np.eye(4))
    out, _, hdr = nifti.load(fn)
    np.testing.assert_array_equal(out, data)
    assert out.dtype == np.int16


def test_nifti_4d_roundtrip(tmp_path):
    data = np.random.RandomState(1).rand(5, 6, 7, 3).astype(np.float32)
    fn = str(tmp_path / "x4.nii.gz")
    nifti.save(fn, data, np.eye(4))
    out, _, _ = nifti.load(fn)
    np.testing.assert_allclose(out, data)


def test_load_single_image_channel_first(tmp_path):
    data = np.random.RandomState(2).rand(4, 5, 6).astype(np.float32)
    fn = str(tmp_path / "img.nii.gz")
    nifti.save(fn, data, np.eye(4))
    vol = load_single_image(fn)
    assert vol.shape == (1, 4, 5, 6)
    np.testing.assert_allclose(np.asarray(vol.data)[0], data)


def test_load_image_multifile_concat(tmp_path):
    fns = []
    for i in range(3):
        fn = str(tmp_path / f"m{i}.nii.gz")
        nifti.save(fn, np.full((4, 4, 4), float(i), dtype=np.float32), np.eye(4))
        fns.append(fn)
    vol = load_image(fns)
    assert vol.shape == (3, 4, 4, 4)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(vol.data)[i], float(i))


def test_uint16_becomes_int16(tmp_path):
    data = np.arange(64, dtype=np.uint16).reshape(4, 4, 4)
    fn = str(tmp_path / "u16.nii.gz")
    nifti.save(fn, data, np.eye(4))
    vol = load_single_image(fn)
    assert np.asarray(vol.data).dtype == np.int16


def test_volume_to_filename_roundtrip(tmp_path):
    data = np.random.RandomState(3).rand(2, 4, 4, 4).astype(np.float32)
    vol = Volume(data=data, affine=np.diag([1.0, 1.0, 2.0, 1.0]))
    fn = str(tmp_path / "v.nii.gz")
    vol.to_filename(fn)
    out, affine, _ = nifti.load(fn)
    assert out.shape == (4, 4, 4, 2)  # channels moved last
    np.testing.assert_allclose(np.moveaxis(out, -1, 0), data)


def test_orientation_codes():
    assert orientation_to_axcodes(io_orientation(np.eye(4))) == "RAS"
    las = np.diag([-1.0, 1.0, 1.0, 1.0])
    assert orientation_to_axcodes(io_orientation(las)) == "LAS"


def test_reorder_to_ras_flips_data_and_affine():
    data = np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2)
    las = np.diag([-1.0, 1.0, 1.0, 1.0])  # first axis points Left
    out, affine = apply_orientation(data, las, "RAS")
    assert orientation_to_axcodes(io_orientation(affine)) == "RAS"
    np.testing.assert_array_equal(out[0], data[0][::-1])
    # world position of a voxel must be invariant under reorientation
    world_before = las @ np.array([0, 0, 0, 1.0])
    world_after = affine @ np.array([1, 0, 0, 1.0])
    np.testing.assert_allclose(world_before, world_after)


def test_reorder_axis_permutation():
    data = np.random.RandomState(4).rand(1, 3, 4, 5).astype(np.float32)
    # affine mapping voxel axes (0,1,2) -> world axes (1,0,2): PSR-ish ordering
    affine = np.zeros((4, 4))
    affine[1, 0] = 1.0
    affine[0, 1] = 1.0
    affine[2, 2] = 1.0
    affine[3, 3] = 1.0
    out, new_affine = apply_orientation(data, affine, "RAS")
    assert out.shape == (1, 4, 3, 5)
    assert orientation_to_axcodes(io_orientation(new_affine)) == "RAS"


def test_halfsize_roundtrip():
    data = np.random.RandomState(5).rand(8, 8, 8).astype(np.float32)
    parts = break_down_volume_into_half_size_volumes(data)
    assert len(parts) == 8
    np.testing.assert_array_equal(combine_half_size_volumes(list(parts)), data)


def test_axcodes_validation():
    with pytest.raises(ValueError):
        axcodes_to_orientation("RASX")


def _write_with_scl(tmp_path, slope, inter):
    """Save a plain int16 volume then patch scl_slope/scl_inter (offsets
    112/116 in the NIfTI-1 header) — nifti.save always writes (1, 0)."""
    import struct

    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    fn = str(tmp_path / "scl.nii")  # uncompressed: patch bytes in place
    nifti.save(fn, data, np.eye(4))
    with open(fn, "r+b") as f:
        f.seek(112)
        f.write(struct.pack("<2f", slope, inter))
    return fn, data


def test_scl_slope_inter_applied(tmp_path):
    fn, raw = _write_with_scl(tmp_path, 2.0, 5.0)
    out, _, hdr = nifti.load(fn)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, raw.astype(np.float32) * 2.0 + 5.0)
    unscaled, _, _ = nifti.load(fn, scale=False)
    np.testing.assert_array_equal(unscaled, raw)


def test_scl_nan_slope_means_no_scaling(tmp_path):
    fn, raw = _write_with_scl(tmp_path, float("nan"), 5.0)
    out, _, _ = nifti.load(fn)
    np.testing.assert_array_equal(out, raw)
    fn, raw = _write_with_scl(tmp_path, 0.0, 5.0)
    out, _, _ = nifti.load(fn)
    np.testing.assert_array_equal(out, raw)


def test_scl_nan_inter_sanitized_not_propagated(tmp_path):
    """A valid slope with a non-finite intercept is a malformed header
    (nibabel refuses to read it); the codec must not NaN every voxel."""
    fn, raw = _write_with_scl(tmp_path, 2.0, float("nan"))
    out, _, _ = nifti.load(fn)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(out, raw.astype(np.float32) * 2.0)
