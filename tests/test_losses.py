"""Loss registry numerics (MONAI/torch semantics, channel-last)."""
import jax.numpy as jnp
import numpy as np
import pytest

from unet3d_tpu.train.losses import (LOSS_REGISTRY, BCEWithLogitsLoss,
                                     CrossEntropyLoss, DiceLoss, FocalLoss,
                                     GeneralizedDiceLoss, MSELoss, load_criterion)


def _pair(seed=0, shape=(2, 4, 4, 4, 3)):
    rng = np.random.RandomState(seed)
    pred = rng.randn(*shape).astype(np.float32)
    target = (rng.rand(*shape) > 0.5).astype(np.float32)
    return jnp.asarray(pred), jnp.asarray(target)


def test_dice_perfect_prediction_near_zero():
    target = jnp.asarray((np.random.RandomState(0).rand(1, 4, 4, 4, 2) > 0.5)
                         .astype(np.float32))
    loss = DiceLoss()(target, target)
    assert float(loss) < 1e-4


def test_dice_disjoint_prediction_near_one():
    t = np.zeros((1, 4, 4, 4, 1), np.float32)
    t[0, :2] = 1
    p = np.zeros_like(t)
    p[0, 2:] = 1
    assert float(DiceLoss()(jnp.asarray(p), jnp.asarray(t))) > 0.99


def test_dice_sigmoid_flag():
    pred, target = _pair()
    manual = DiceLoss()(jnp.asarray(1 / (1 + np.exp(-np.asarray(pred)))), target)
    flagged = DiceLoss(sigmoid=True)(pred, target)
    np.testing.assert_allclose(float(manual), float(flagged), rtol=1e-5)


def test_dice_include_background_drops_channel0():
    pred, target = _pair()
    full = DiceLoss(sigmoid=True)(pred, target)
    no_bg = DiceLoss(sigmoid=True, include_background=False)(pred, target)
    manual = DiceLoss(sigmoid=True)(pred[..., 1:], target[..., 1:])
    np.testing.assert_allclose(float(no_bg), float(manual), rtol=1e-6)
    assert float(no_bg) != float(full)


def test_dice_batch_flag_changes_reduction():
    pred, target = _pair()
    a = DiceLoss(sigmoid=True, batch=False)(pred, target)
    b = DiceLoss(sigmoid=True, batch=True)(pred, target)
    assert float(a) != float(b)


def test_generalized_dice_perfect():
    target = jnp.asarray((np.random.RandomState(1).rand(1, 4, 4, 4, 3) > 0.5)
                         .astype(np.float32))
    assert float(GeneralizedDiceLoss()(target, target)) < 1e-3


def test_cross_entropy_matches_manual():
    pred, target = _pair(shape=(2, 4, 4, 4, 3))
    # make target a proper one-hot distribution over channels
    idx = np.random.RandomState(2).randint(0, 3, size=(2, 4, 4, 4))
    onehot = np.eye(3, dtype=np.float32)[idx]
    logp = np.asarray(pred) - np.log(
        np.exp(np.asarray(pred)).sum(-1, keepdims=True))
    manual = -np.mean((onehot * logp).sum(-1))
    out = CrossEntropyLoss()(pred, jnp.asarray(onehot))
    np.testing.assert_allclose(float(out), manual, rtol=1e-4)


def test_bce_with_logits_matches_manual():
    pred, target = _pair(shape=(2, 4, 4, 4, 1))
    p = np.asarray(pred, dtype=np.float64)
    t = np.asarray(target, dtype=np.float64)
    manual = np.mean(np.log1p(np.exp(-p)) * t + np.log1p(np.exp(p)) * (1 - t))
    np.testing.assert_allclose(float(BCEWithLogitsLoss()(pred, target)), manual,
                               rtol=1e-4)


def test_focal_reduces_to_bce_at_gamma0():
    pred, target = _pair(shape=(1, 4, 4, 4, 2))
    focal = FocalLoss(gamma=0.0)(pred, target)
    bce = BCEWithLogitsLoss()(pred, target)
    np.testing.assert_allclose(float(focal), float(bce), rtol=1e-5)


def test_mse():
    pred = jnp.asarray(np.float32([[1.0, 2.0]]))
    target = jnp.asarray(np.float32([[0.0, 0.0]]))
    np.testing.assert_allclose(float(MSELoss()(pred, target)), 2.5)


def test_registry_error_and_kwargs():
    with pytest.raises(ValueError):
        load_criterion("NoSuchLoss")
    crit = load_criterion("DiceLoss", {"include_background": False, "sigmoid": True})
    assert crit.sigmoid and not crit.include_background


def test_all_registered_losses_run():
    pred, target = _pair(shape=(1, 4, 4, 4, 2))
    for name in LOSS_REGISTRY:
        loss = load_criterion(name)(pred, target)
        assert np.isfinite(float(loss)), name


def test_deep_supervision_weighting():
    from unet3d_tpu.train.step import compute_criterion
    pred_main = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 4, 2),
                            jnp.float32)
    pred_head = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 4, 2),
                            jnp.float32)
    target = jnp.asarray((np.random.RandomState(2).rand(1, 4, 4, 4, 2) > 0.5)
                         .astype(np.float32))
    crit = DiceLoss(sigmoid=True)
    stacked = jnp.stack([pred_main, pred_head], axis=1)  # (B, heads, ...)
    out = compute_criterion(crit, stacked, target)
    # nnU-Net 1/2^i weights normalized: (2/3)*main + (1/3)*head
    expected = (2 / 3) * crit(pred_main, target) + (1 / 3) * crit(pred_head, target)
    np.testing.assert_allclose(float(out), float(expected), rtol=1e-6)


def test_vae_loss_extras_routing():
    from unet3d_tpu.train.step import compute_criterion
    from unet3d_tpu.train.losses import VAELoss
    pred = jnp.zeros((1, 4, 4, 4, 1))
    target = jnp.zeros((1, 4, 4, 4, 1))
    mu = jnp.ones((1, 3))
    logvar = jnp.zeros((1, 3))
    out = compute_criterion(VAELoss(beta=1.0), (pred, mu, logvar), target)
    # recon 0 + KL of (mu=1, logvar=0): -0.5*mean(1 + 0 - 1 - 1) = 0.5
    np.testing.assert_allclose(float(out), 0.5, rtol=1e-6)
