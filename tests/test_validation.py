"""Error-contract tests: bare inputs must produce instructive errors
(modeled on `test/test_predict_volumetric.py:74-141` and
`test/test_augment_validation.py`)."""
import numpy as np
import pytest

from unet3d_tpu.data.image import Volume
from unet3d_tpu.utils.validation import (validate_batch_item, validate_has_affine,
                                         validate_spatial_volume)


def test_bare_array_lacks_affine():
    with pytest.raises(TypeError, match="affine"):
        validate_has_affine(np.zeros((1, 4, 4, 4)), context="resampling")


def test_error_message_is_instructive():
    with pytest.raises(TypeError, match="unet3d_tpu.data.load_image"):
        validate_has_affine([1, 2, 3])


def test_volume_passes():
    validate_has_affine(Volume(data=np.zeros((1, 2, 2, 2)), affine=np.eye(4)))


def test_batch_missing_key():
    with pytest.raises(KeyError, match="source_filename"):
        validate_batch_item({"image": 1, "affine": 2}, "source_filename")


def test_batch_error_lists_available_keys():
    with pytest.raises(KeyError, match="image"):
        validate_batch_item({"image": 1}, "label", context="training")


def test_spatial_volume_validation():
    validate_spatial_volume(np.zeros((1, 4, 4, 4)))
    validate_spatial_volume(np.zeros((4, 4, 4)))
    with pytest.raises(TypeError, match="hannel-first"):
        validate_spatial_volume(np.zeros((4, 4)))
    with pytest.raises(TypeError, match="ndim"):
        validate_spatial_volume("not an array")


def test_predict_rejects_bare_batches():
    from unet3d_tpu.predict.volumetric import volumetric_predictions
    from unet3d_tpu.train.step import create_train_state
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.models.registry import create_model, init_params

    model = create_model("UNet3D", base_width=2, encoder_blocks=[1, 1], n_outputs=1)
    variables = init_params(model, (8, 8, 8, 1))
    state = create_train_state(variables, build_optimizer("Adam"))
    bad_loader = [{"image": np.zeros((1, 1, 8, 8, 8), np.float32)}]  # no affine/meta
    with pytest.raises(KeyError, match="affine"):
        volumetric_predictions(model, state, bad_loader, "/tmp/should_not_write")


def test_collate_flatten():
    from unet3d_tpu.data.loader import collate_5d_flatten
    b = {"image": np.zeros((2, 3, 1, 8, 8, 8)), "label": np.zeros((2, 3, 1, 8, 8, 8)),
         "meta": [1, 2]}
    out = collate_5d_flatten(b)
    assert out["image"].shape == (6, 1, 8, 8, 8)
    assert out["meta"] == [1, 2]
    # already-5D batches pass through untouched
    assert collate_5d_flatten({"image": np.zeros((2, 1, 4, 4, 4))})["image"].shape \
        == (2, 1, 4, 4, 4)


def test_infer_subject_id():
    from unet3d_tpu.predict.volumetric import infer_subject_id
    fns = ["/data/sub01/t1.nii.gz", "/data/sub02/t1.nii.gz"]
    assert infer_subject_id(fns[0], fns) == "sub01"
    assert infer_subject_id("/x/caseA/img.nii.gz") == "caseA"


def test_train_step_accepts_compact_transfer_dtypes():
    """bf16-shipped images/labels must produce the same AMP step as f32
    inputs (the step casts to bf16 anyway; 0/1 labels are exact in bf16)."""
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, make_train_step

    model = create_model("UNet", in_channels=2, out_channels=2,
                         channels=(2, 4), strides=(2,))
    variables = init_params(model, (8, 8, 8, 2))
    tx = build_optimizer("Adam", lr=1e-3)
    step = make_train_step(model, DiceLoss(sigmoid=True), tx, amp=True)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 2, 8, 8, 8).astype(np.float32)
    lab = (rng.rand(1, 2, 8, 8, 8) > 0.5).astype(np.float32)

    import jax
    fresh = lambda: jax.tree_util.tree_map(jnp.copy, variables)
    s1 = create_train_state(fresh(), tx)
    _, loss_f32 = step(s1, jnp.asarray(img), jnp.asarray(lab))

    s2 = create_train_state(fresh(), tx)
    _, loss_bf16 = step(s2, jnp.asarray(img, jnp.bfloat16),
                        jnp.asarray(lab, jnp.bfloat16))
    np.testing.assert_allclose(float(loss_f32), float(loss_bf16),
                               rtol=2e-2)

    s3 = create_train_state(fresh(), tx)
    _, loss_u8 = step(s3, jnp.asarray(img, jnp.bfloat16),
                      jnp.asarray(lab.astype(np.uint8)))
    np.testing.assert_allclose(float(loss_bf16), float(loss_u8), rtol=2e-2)


def test_first_step_failure_carries_oom_guidance():
    """An opaque compile/memory failure on the very first step is re-raised
    with the reference's OOM guidance (doc/FAQ.md)."""
    import numpy as np
    import pytest

    from unet3d_tpu.train.train import epoch_training

    class Loader:
        def __len__(self):
            return 1

        def __iter__(self):
            yield {"image": np.zeros((1, 1, 8, 8, 8), np.float32),
                   "label": np.zeros((1, 1, 8, 8, 8), np.float32)}

    def exploding_step(state, images, labels):
        raise ValueError("RESOURCE_EXHAUSTED: out of memory")

    with pytest.raises(RuntimeError, match="desired_shape"):
        epoch_training(Loader(), exploding_step, state=None, epoch=1)
