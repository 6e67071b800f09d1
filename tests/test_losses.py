"""Loss registry numerics (MONAI/torch semantics, channel-last)."""
import jax
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
        kwargs = {"win_size": 3} if name == "SSIMLoss" else None
        loss = load_criterion(name, kwargs)(pred, target)
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


def test_generalized_dice_empty_class_uses_max_finite_weight():
    # An all-background (empty) class gets w=inf from 1/ground^2; MONAI
    # replaces inf with the max finite weight so absent classes do not
    # dominate (ADVICE r1). With the old 1e-8 clamp the empty class carried
    # w~1e16 and GDL saturated toward 1 regardless of the other channels.
    rng = np.random.RandomState(3)
    target = (rng.rand(1, 4, 4, 4, 3) > 0.5).astype(np.float32)
    target[..., 2] = 0.0  # empty class
    pred = target.copy()
    loss = float(GeneralizedDiceLoss()(jnp.asarray(pred), jnp.asarray(target)))
    # perfect prediction on present classes, empty class contributes
    # w*0 to both numerator terms -> near-zero loss
    assert loss < 1e-3

    # and the manual MONAI weighting must match: w_i = 1/ground_i^2 with
    # inf -> max finite
    pred2 = rng.rand(1, 4, 4, 4, 3).astype(np.float32)
    loss2 = float(GeneralizedDiceLoss()(jnp.asarray(pred2), jnp.asarray(target)))
    ground = target.reshape(1, -1, 3).sum(1)
    w = 1.0 / (ground * ground)
    finite_max = w[np.isfinite(w)].max()
    w = np.where(np.isinf(w), finite_max, w)
    inter = (target * pred2).reshape(1, -1, 3).sum(1)
    psum = pred2.reshape(1, -1, 3).sum(1)
    expected = 1 - (2 * (inter * w).sum(-1) + 1e-5) / (
        ((ground + psum) * w).sum(-1) + 1e-5)
    np.testing.assert_allclose(loss2, expected.mean(), rtol=1e-4)


def test_focal_softmax_alpha_background_weighting():
    # MONAI softmax FocalLoss weights channel 0 by (1-alpha) and the rest by
    # alpha (ADVICE r1: a uniform alpha is wrong).
    pred, target = _pair(shape=(1, 4, 4, 4, 3))
    alpha = 0.25
    out = float(FocalLoss(alpha=alpha, gamma=2.0, use_softmax=True)(pred, target))
    p = np.asarray(jnp.exp(jnp.asarray(pred) - jnp.max(pred, -1, keepdims=True)))
    p = p / p.sum(-1, keepdims=True)
    logp = np.log(p)
    t = np.asarray(target)
    base = -t * ((1 - p) ** 2.0) * logp
    alpha_fac = np.asarray([1 - alpha, alpha, alpha], np.float32)
    np.testing.assert_allclose(out, (alpha_fac * base).mean(), rtol=1e-4)


def test_generalized_dice_empty_class_uses_per_sample_max():
    """MONAI replaces an empty class's inf weight with that SAMPLE's max
    finite weight; using the global batch max changes the loss whenever
    another sample has much larger weights."""
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.train.losses import GeneralizedDiceLoss

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(2, 4, 4, 4, 2), jnp.float32)
    target = np.zeros((2, 4, 4, 4, 2), np.float32)
    # sample 0: class 0 moderate foreground, class 1 EMPTY
    target[0, :2, :2, :2, 0] = 1.0
    # sample 1: tiny foreground in both classes -> huge weights
    target[1, 0, 0, 0, 0] = 1.0
    target[1, 0, 0, 1, 1] = 1.0
    loss_batched = GeneralizedDiceLoss(reduction="none")(
        pred, jnp.asarray(target))
    # per-sample semantics: each sample alone must give the same loss
    for i in range(2):
        alone = GeneralizedDiceLoss(reduction="none")(
            pred[i:i + 1], jnp.asarray(target[i:i + 1]))
        np.testing.assert_allclose(np.asarray(loss_batched)[i],
                                   np.asarray(alone)[0], rtol=1e-6)


# ---- round-3 registry breadth -----------------------------------------------

def test_tversky_alpha_beta_half_equals_dice():
    from unet3d_tpu.train.losses import TverskyLoss
    pred, target = _pair(shape=(2, 4, 4, 4, 3))
    tv = TverskyLoss(sigmoid=True, alpha=0.5, beta=0.5)
    dice = DiceLoss(sigmoid=True)
    # tp + 0.5 fp + 0.5 fn = 0.5 (|X| + |Y|): Tversky(0.5, 0.5) == Dice
    np.testing.assert_allclose(float(tv(pred, target)),
                               float(dice(pred, target)), rtol=1e-5)


def test_tversky_asymmetry_penalizes_fn_more_with_high_beta():
    from unet3d_tpu.train.losses import TverskyLoss
    rng = np.random.RandomState(3)
    target = jnp.asarray((rng.rand(1, 6, 6, 6, 1) > 0.5).astype(np.float32))
    under = jnp.asarray(np.asarray(target) * 0.3)   # many FN, no FP
    high_beta = TverskyLoss(alpha=0.1, beta=0.9)
    low_beta = TverskyLoss(alpha=0.9, beta=0.1)
    assert float(high_beta(under, target)) > float(low_beta(under, target))


def test_masked_dice_ignores_masked_out_region():
    from unet3d_tpu.train.losses import MaskedDiceLoss
    rng = np.random.RandomState(4)
    target = jnp.asarray((rng.rand(1, 4, 4, 4, 1) > 0.5).astype(np.float32))
    pred = target.copy()
    # corrupt one corner, then mask that corner out
    corrupted = pred.at[0, :2, :2, :2, 0].set(1.0 - pred[0, :2, :2, :2, 0])
    mask = jnp.ones_like(pred).at[0, :2, :2, :2, 0].set(0.0)
    loss = MaskedDiceLoss()
    masked = float(loss(corrupted, target, mask=mask))
    clean = float(DiceLoss()(pred * mask, target * mask))
    np.testing.assert_allclose(masked, clean, rtol=1e-6)
    assert masked < float(loss(corrupted, target))  # unmasked sees the damage


def test_nll_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(5)
    logits = rng.randn(2, 4, 4, 4, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(2, 4, 4, 4))
    logp = np.asarray(jnp.asarray(logits) - jnp.log(
        jnp.sum(jnp.exp(jnp.asarray(logits)), -1, keepdims=True)))
    onehot = np.eye(3, dtype=np.float32)[labels]
    from unet3d_tpu.train.losses import NLLLoss
    ours = float(NLLLoss(weight=[1.0, 2.0, 0.5])(jnp.asarray(logp), jnp.asarray(onehot)))
    t = torch.nn.NLLLoss(weight=torch.tensor([1.0, 2.0, 0.5]))(
        torch.tensor(logp).permute(0, 4, 1, 2, 3), torch.tensor(labels))
    np.testing.assert_allclose(ours, float(t), rtol=1e-5)


def test_huber_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(6)
    pred = rng.randn(3, 5).astype(np.float32) * 2
    target = rng.randn(3, 5).astype(np.float32)
    from unet3d_tpu.train.losses import HuberLoss
    ours = float(HuberLoss(delta=1.3)(jnp.asarray(pred), jnp.asarray(target)))
    t = torch.nn.HuberLoss(delta=1.3)(torch.tensor(pred), torch.tensor(target))
    np.testing.assert_allclose(ours, float(t), rtol=1e-6)


# ------------------------------------------------- session-3 registry names


def test_generalized_dice_focal_is_weighted_sum():
    from unet3d_tpu.train.losses import (FocalLoss, GeneralizedDiceLoss,
                                         load_criterion)
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(2, 4, 4, 4, 3).astype(np.float32))
    target = jnp.asarray((rng.rand(2, 4, 4, 4, 3) > 0.5).astype(np.float32))
    combo = load_criterion("GeneralizedDiceFocalLoss",
                           {"sigmoid": True, "lambda_gdl": 0.7,
                            "lambda_focal": 0.3})
    gdl = GeneralizedDiceLoss(sigmoid=True)
    focal = FocalLoss()
    expected = 0.7 * float(gdl(pred, target)) + 0.3 * float(focal(pred, target))
    assert float(combo(pred, target)) == pytest.approx(expected, rel=1e-5)


def test_ssim_loss_properties():
    from unet3d_tpu.train.losses import load_criterion
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 14, 14, 14, 2).astype(np.float32))
    loss = load_criterion("SSIMLoss", {"win_size": 7})
    # identical volumes: SSIM = 1 -> loss 0
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-5)
    # small noise hurts less than big noise; both positive
    small = loss(x + 0.05 * jnp.asarray(rng.randn(*x.shape).astype(np.float32)), x)
    big = loss(x + 0.5 * jnp.asarray(rng.randn(*x.shape).astype(np.float32)), x)
    assert 0 < float(small) < float(big) <= 2.0
    # gradient flows
    g = jax.grad(lambda p: loss(p, x))(x + 0.1)
    assert float(jnp.abs(g).sum()) > 0


def test_ssim_matches_uniform_window_numpy_reference():
    """Independent numpy reference with a uniform window (exact box means)."""
    from unet3d_tpu.train.losses import SSIMLoss
    rng = np.random.RandomState(2)
    x = rng.rand(1, 9, 9, 9, 1).astype(np.float32)
    y = rng.rand(1, 9, 9, 9, 1).astype(np.float32)
    win, dr = 3, 1.0
    loss = SSIMLoss(win_size=win, kernel_type="uniform", data_range=dr)
    got = float(loss(jnp.asarray(x), jnp.asarray(y)))

    def box(v):  # valid box mean over 3 axes
        from numpy.lib.stride_tricks import sliding_window_view
        w = sliding_window_view(v[0, ..., 0], (win, win, win))
        return w.mean(axis=(-1, -2, -3))

    mx, my = box(x), box(y)
    sxx = box(x * x) - mx ** 2
    syy = box(y * y) - my ** 2
    sxy = box(x * y) - mx * my
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx ** 2 + my ** 2 + c1) * (sxx + syy + c2))
    assert got == pytest.approx(float(1 - ssim.mean()), rel=1e-4)


def test_torch_named_losses_match_torch_functional():
    """Real-torch goldens for every torch-named loss (not manual formulas)."""
    torch = pytest.importorskip("torch")
    from unet3d_tpu.train.losses import load_criterion
    rng = np.random.RandomState(7)
    pred = rng.randn(2, 4, 4, 4, 3).astype(np.float32)
    target = rng.rand(2, 4, 4, 4, 3).astype(np.float32)
    tp = torch.tensor(pred)
    tt = torch.tensor(target)
    cases = [
        ("MSELoss", {}, torch.nn.functional.mse_loss(tp, tt)),
        ("L1Loss", {}, torch.nn.functional.l1_loss(tp, tt)),
        ("SmoothL1Loss", {"beta": 0.5},
         torch.nn.functional.smooth_l1_loss(tp, tt, beta=0.5)),
        ("HuberLoss", {"delta": 0.7},
         torch.nn.functional.huber_loss(tp, tt, delta=0.7)),
        ("BCEWithLogitsLoss", {},
         torch.nn.functional.binary_cross_entropy_with_logits(tp, tt)),
    ]
    for name, kwargs, expected in cases:
        got = float(load_criterion(name, kwargs)(jnp.asarray(pred),
                                                 jnp.asarray(target)))
        assert got == pytest.approx(float(expected), rel=1e-5), name


def test_cross_entropy_matches_torch_onehot_and_probabilities():
    torch = pytest.importorskip("torch")
    from unet3d_tpu.train.losses import load_criterion
    rng = np.random.RandomState(8)
    pred = rng.randn(2, 4, 4, 4, 3).astype(np.float32)
    # soft probability targets (torch CE accepts class probabilities)
    raw = rng.rand(2, 4, 4, 4, 3).astype(np.float32)
    target = raw / raw.sum(-1, keepdims=True)
    got = float(load_criterion("CrossEntropyLoss")(jnp.asarray(pred),
                                                   jnp.asarray(target)))
    # torch: (N, C, ...) channel-first
    tp = torch.tensor(pred.transpose(0, 4, 1, 2, 3))
    tt = torch.tensor(target.transpose(0, 4, 1, 2, 3))
    expected = float(torch.nn.functional.cross_entropy(tp, tt))
    assert got == pytest.approx(expected, rel=1e-5)


def test_focal_per_class_weight_applied():
    """MONAI FocalLoss `weight` multiplies the per-class loss (broadcast over
    the channel axis); a silently-ignored weight was a round-5 review find."""
    pred, target = _pair(shape=(1, 4, 4, 4, 3))
    w = [0.1, 1.0, 2.0]
    base = np.asarray(FocalLoss(gamma=2.0, reduction="none")(pred, target))
    out = float(FocalLoss(gamma=2.0, weight=w)(pred, target))
    np.testing.assert_allclose(out, (np.asarray(w, np.float32) * base).mean(),
                               rtol=1e-5)
    with pytest.raises(ValueError, match="weight"):
        FocalLoss(weight=[1.0, 2.0])(pred, target)  # 2 weights, 3 classes


def test_focal_softmax_alpha_nulled_without_background():
    """MONAI nulls alpha (with a warning) for softmax + include_background=False
    — the 1-alpha factor would otherwise hit a FOREGROUND channel."""
    import warnings

    pred, target = _pair(shape=(1, 4, 4, 4, 3))
    plain = float(FocalLoss(include_background=False, use_softmax=True,
                            gamma=2.0)(pred, target))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = float(FocalLoss(include_background=False, use_softmax=True,
                              gamma=2.0, alpha=0.75)(pred, target))
    assert any("alpha" in str(w.message) for w in caught)
    np.testing.assert_allclose(out, plain, rtol=1e-6)


def test_dice_ce_multichannel_uses_softmax_ce_regardless_of_sigmoid():
    """MONAI DiceCELoss routes the CE leg on channel count alone
    (`self.ce(input, target) if input.shape[1] != 1 else self.bce(...)`);
    sigmoid/softmax flags shape only the Dice leg."""
    from unet3d_tpu.train.losses import DiceCELoss, DiceLoss

    pred, target = _pair(shape=(2, 4, 4, 4, 3))
    out = float(DiceCELoss(sigmoid=True)(pred, target))
    dice = float(DiceLoss(sigmoid=True)(pred, target))
    t = np.asarray(target, np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(pred), axis=-1))
    ce = float(-np.mean(np.sum(t * logp, axis=-1)))
    np.testing.assert_allclose(out, dice + ce, rtol=1e-5)
