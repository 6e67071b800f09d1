"""One-hot codec tests, parity-modeled on `test/test_utils.py:103-128` and the
hierarchy decode at `unet3d/utils/one_hot.py:101-118`."""
import numpy as np

from unet3d_tpu.ops import one_hot


def test_single_label_encode():
    lm = np.zeros((4, 4, 4), dtype=np.float32)
    lm[1, 1, 1] = 1
    enc = np.asarray(one_hot.label_map_to_one_hot(lm, labels=[1]))
    assert enc.shape == (1, 4, 4, 4)
    assert enc[0, 1, 1, 1] == 1
    assert enc.sum() == 1


def test_multi_label_encode():
    lm = np.zeros((4, 4, 4), dtype=np.float32)
    lm[0, 0, 0] = 2
    lm[1, 1, 1] = 1
    lm[2, 2, 2] = 4
    enc = np.asarray(one_hot.label_map_to_one_hot(lm, labels=[2, 1, 4]))
    assert enc.shape == (3, 4, 4, 4)
    assert enc[0, 0, 0, 0] == 1 and enc[1, 1, 1, 1] == 1 and enc[2, 2, 2, 2] == 1
    assert enc.sum() == 3


def test_grouped_labels_encode():
    # [[2, 1, 4], [1, 4], [4]] — BraTS hierarchy channels (WT, TC, ET)
    lm = np.zeros((4, 4, 4), dtype=np.float32)
    lm[0, 0, 0] = 2
    lm[1, 1, 1] = 1
    lm[2, 2, 2] = 4
    enc = np.asarray(one_hot.label_map_to_one_hot(lm, labels=[[2, 1, 4], [1, 4], [4]]))
    assert enc[0].sum() == 3  # whole tumor covers all three voxels
    assert enc[1].sum() == 2  # tumor core = labels 1 and 4
    assert enc[2].sum() == 1  # enhancing tumor = label 4


def test_rounding_of_float_labels():
    lm = np.full((2, 2, 2), 0.9, dtype=np.float32)
    enc = np.asarray(one_hot.label_map_to_one_hot(lm, labels=[1]))
    assert enc.sum() == 8  # 0.9 rounds to 1


def test_4d_input_with_channel():
    lm = np.zeros((1, 2, 2, 2), dtype=np.float32)
    lm[0, 0, 0, 0] = 1
    enc = np.asarray(one_hot.label_map_to_one_hot(lm, labels=[1]))
    assert enc.shape == (1, 2, 2, 2)


def test_decode_argmax():
    enc = np.zeros((2, 2, 2, 2), dtype=np.float32)
    enc[0, 0, 0, 0] = 0.9
    enc[1, 1, 1, 1] = 0.8
    lm = np.asarray(one_hot.one_hot_to_label_map(enc, labels=[5, 7]))
    assert lm[0, 0, 0] == 5
    assert lm[1, 1, 1] == 7
    assert lm.sum() == 12


def test_decode_sum_then_threshold():
    enc = np.full((2, 2, 2, 2), 0.3, dtype=np.float32)
    # any > 0.5 fails, but sum = 0.6 > 0.5 passes
    lm_any = np.asarray(one_hot.one_hot_to_label_map(enc, labels=[1, 2]))
    lm_sum = np.asarray(one_hot.one_hot_to_label_map(enc, labels=[1, 2], sum_then_threshold=True))
    assert lm_any.sum() == 0
    assert (lm_sum > 0).all()


def test_decode_hierarchy():
    # WT predicted everywhere, TC in a sub-box, ET nowhere
    enc = np.zeros((3, 4, 4, 4), dtype=np.float32)
    enc[0] = 0.9
    enc[1, :2] = 0.9
    lm = np.asarray(one_hot.one_hot_to_label_map(enc, labels=[2, 1, 4], label_hierarchy=True))
    assert (lm[2:] == 2).all()   # whole tumor only -> label 2
    assert (lm[:2] == 1).all()   # tumor core region -> label 1
    assert (lm == 4).sum() == 0  # no enhancing tumor


def test_hierarchy_requires_containment():
    # TC predicted outside WT must NOT be labeled
    enc = np.zeros((2, 2, 2, 2), dtype=np.float32)
    enc[1, 0, 0, 0] = 0.9  # TC positive but WT negative
    lm = np.asarray(one_hot.one_hot_to_label_map(enc, labels=[2, 1], label_hierarchy=True))
    assert lm.sum() == 0


def test_grouped_decode_multi_volume():
    enc = np.zeros((3, 2, 2, 2), dtype=np.float32)
    enc[0, 0, 0, 0] = 0.9  # group A label 1
    enc[2, 1, 1, 1] = 0.9  # group B label 9
    lm = np.asarray(one_hot.one_hot_to_label_map(enc, labels=[[1, 2], [9]]))
    assert lm.shape == (2, 2, 2, 2)
    assert lm[0, 0, 0, 0] == 1
    assert lm[1, 1, 1, 1] == 9


def test_contours():
    enc = np.zeros((1, 8, 8, 8), dtype=np.float32)
    enc[0, 2:6, 2:6, 2:6] = 1
    out = np.asarray(one_hot.add_one_hot_encoding_contours(enc))
    assert out.shape == (2, 8, 8, 8)
    # interior voxels are not contour; surface voxels are
    assert out[1, 3, 3, 3] == 0
    assert out[1, 2, 3, 3] == 1
