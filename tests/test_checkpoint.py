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


def test_opt_state_roundtrip_keyed(tmp_path):
    import optax
    from unet3d_tpu.train.checkpoint import load_opt_state, save_opt_state
    params = {"w": np.ones((3, 2), np.float32), "b": np.zeros((2,), np.float32)}
    tx = optax.adam(1e-3)
    state = tx.init(params)
    grads = {"w": np.full((3, 2), 0.5, np.float32),
             "b": np.full((2,), 0.25, np.float32)}
    _, state = tx.update(grads, state, params)
    path = str(tmp_path / "opt.npz")
    save_opt_state(state, path)
    template = tx.init(params)
    restored = load_opt_state(template, path)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_opt_state_mismatch_raises(tmp_path):
    import optax
    import pytest
    from unet3d_tpu.train.checkpoint import (OptStateMismatchError,
                                             load_opt_state, save_opt_state)
    tx = optax.adam(1e-3)
    params = {"w": np.ones((3, 2), np.float32)}
    path = str(tmp_path / "opt.npz")
    save_opt_state(tx.init(params), path)
    # changed model shape -> loud failure, not a silent fresh template
    other = tx.init({"w": np.ones((4, 2), np.float32)})
    with pytest.raises(OptStateMismatchError, match="shape"):
        load_opt_state(other, path)
    # corrupt file -> loud failure
    bad = str(tmp_path / "bad.npz")
    with open(bad, "wb") as f:
        f.write(b"not-an-npz")
    with pytest.raises(OptStateMismatchError, match="Cannot read"):
        load_opt_state(tx.init(params), bad)
    # structurally different optimizer -> loud failure
    sgd_state = optax.sgd(1e-3, momentum=0.9).init(params)
    with pytest.raises(OptStateMismatchError):
        load_opt_state(sgd_state, path)
