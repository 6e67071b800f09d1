"""Checkpoint save/load + flexible tile/truncate surgery
(parity: `unet3d/models/build.py:32-64`)."""
import numpy as np
import pytest

from unet3d_tpu.train.checkpoint import (load_checkpoint, load_into,
                                         match_state_shapes, match_tensor_sizes,
                                         save_checkpoint)


def test_roundtrip(tmp_path):
    variables = {"params": {"layer": {"kernel": np.arange(12, dtype=np.float32)
                                      .reshape(3, 4),
                                      "bias": np.zeros(4, np.float32)}}}
    fn = str(tmp_path / "model.npz")
    save_checkpoint(variables, fn)
    loaded = load_checkpoint(fn)
    np.testing.assert_array_equal(loaded["params"]["layer"]["kernel"],
                                  variables["params"]["layer"]["kernel"])


def test_match_tensor_sizes_tile_then_truncate():
    # grow: tile whole tensor then cut — 2 channels -> 5 = [0,1,0,1,0]
    moving = np.asarray([[1.0, 2.0]])
    fixed = np.zeros((1, 5))
    out = match_tensor_sizes(fixed, moving)
    np.testing.assert_array_equal(out, [[1.0, 2.0, 1.0, 2.0, 1.0]])
    # shrink: truncate
    out2 = match_tensor_sizes(np.zeros((1, 1)), moving)
    np.testing.assert_array_equal(out2, [[1.0]])


def test_match_state_shapes_transfer_labels():
    fixed = {"params": {"final": {"kernel": np.zeros((1, 1, 1, 4, 5), np.float32)}}}
    moving = {"params": {"final": {"kernel": np.ones((1, 1, 1, 4, 3), np.float32)}}}
    out = match_state_shapes(fixed, moving)
    assert out["params"]["final"]["kernel"].shape == (1, 1, 1, 4, 5)
    assert (out["params"]["final"]["kernel"] == 1).all()


def test_flexible_load_keeps_missing_keys(tmp_path):
    fn = str(tmp_path / "m.npz")
    save_checkpoint({"params": {"a": np.ones(3, np.float32)}}, fn)
    target = {"params": {"a": np.zeros(3, np.float32),
                         "b": np.full(2, 7.0, np.float32)}}
    out = load_into(target, fn, strict=False)
    np.testing.assert_array_equal(out["params"]["a"], 1.0)
    np.testing.assert_array_equal(out["params"]["b"], 7.0)  # kept from init


def test_strict_load_rejects_mismatch(tmp_path):
    fn = str(tmp_path / "m.npz")
    save_checkpoint({"params": {"a": np.ones(3, np.float32)}}, fn)
    with pytest.raises(ValueError, match="Strict load"):
        load_into({"params": {"a": np.zeros(3, np.float32),
                              "b": np.zeros(2, np.float32)}}, fn, strict=True)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_into({"params": {"a": np.zeros(4, np.float32)}}, fn, strict=True)
