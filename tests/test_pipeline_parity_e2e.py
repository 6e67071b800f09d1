"""Whole-pipeline predict-loop parity against an independent torch stack
(VERDICT r4 item 5).

Per-component goldens pin each op (resample vs grid_sample, losses vs torch
functionals, DynUNet forward vs a torch transplant); this test upgrades that
to END-TO-END agreement on whole cases: the same transplanted weights are run
through

  * this framework's real predict path — ``volumetric_predictions`` with the
    jitted ``SlidingWindowInferer`` (gaussian overlap blending), sigmoid
    activation, resample back to the native grid, NIfTI write, one-hot
    decode — exactly what the predict CLI executes, and
  * an independent torch re-implementation of the reference's predict loop
    (`unet3d/predict/volumetric.py:131-177`): MONAI-semantics sliding window
    + gaussian importance blending, torch.sigmoid, grid_sample
    resample-to-match (`ResampleToMatch(mode="trilinear")`), and the
    reference's one-hot label decode (`unet3d/utils/one_hot.py:46-92`),

then asserts the probability maps agree and the decoded label maps reach
case-level Dice ~= 1.0 — the closest available stand-in for the real-data
Dice-parity leg of BASELINE.json (monai itself is uninstallable here).

The preprocessed model input is shared between the stacks (preprocessing
composition is pinned by tests/test_pipeline_golden.py); everything after the
network boundary runs twice, independently.
"""
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from test_parity_dynunet import (  # noqa: E402
    IN_CH, OUT_CH, TorchDynUNet, _conv_w, _flax_dynunet, _load_block,
    _transp_w)

from unet3d_tpu.data import nifti  # noqa: E402
from unet3d_tpu.data.dataset import SegmentationDataset  # noqa: E402
from unet3d_tpu.data.io import load_image  # noqa: E402
from unet3d_tpu.data.loader import build_loader  # noqa: E402
from unet3d_tpu.ops.one_hot import one_hot_to_label_map  # noqa: E402
from unet3d_tpu.predict.sliding_window import SlidingWindowInferer  # noqa: E402
from unet3d_tpu.predict.volumetric import volumetric_predictions  # noqa: E402
from unet3d_tpu.train.optim import build_optimizer  # noqa: E402
from unet3d_tpu.train.step import create_train_state  # noqa: E402

pytestmark = pytest.mark.slow

NATIVE_SHAPE = (28, 30, 26)
MODEL_SHAPE = (24, 24, 24)
ROI = (16, 16, 16)
OVERLAP = 0.5
LABELS = (1, 2, 4)


def _write_cases(root, n_cases=2):
    aff = np.diag([1.2, 1.0, 0.9, 1.0])
    aff[:3, 3] = [-10.0, 4.0, 2.5]
    rng = np.random.RandomState(11)
    fns = []
    for i in range(n_cases):
        case = {}
        imgs = []
        for mod in range(IN_CH):
            arr = rng.randn(*NATIVE_SHAPE).astype(np.float32)
            c = rng.randint(8, 18, size=3)
            zz, yy, xx = np.mgrid[: NATIVE_SHAPE[0], : NATIVE_SHAPE[1],
                                  : NATIVE_SHAPE[2]]
            blob = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) < 36
            arr[blob] += 3.0
            fn = os.path.join(root, f"case{i}_mod{mod}.nii.gz")
            nifti.save(fn, arr, aff)
            imgs.append(fn)
        case["image"] = imgs
        fns.append(case)
    return fns


def _transplanted_nets():
    """One random flax DynUNet + its torch twin, output head scaled so the
    sigmoid probabilities spread away from the 0.5 decision boundary (an
    untrained head emits ~0 logits everywhere, which would turn the decode
    comparison into a coin flip on float noise)."""
    import jax
    model, variables = _flax_dynunet()
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params["output_block"]["kernel"] = params["output_block"]["kernel"] * 8.0
    params["output_block"]["bias"] = np.asarray([0.5, -0.5, 0.25], np.float32)
    variables = {"params": params}

    tnet = TorchDynUNet().eval()
    _load_block(tnet.input_block, params["input_block"])
    _load_block(tnet.downsample0, params["downsample0"])
    _load_block(tnet.bottleneck, params["bottleneck"])
    for j in range(2):
        up = params[f"upsample{j}"]
        tnet.up[j]["transp_conv"].weight.data = _transp_w(up["transp_conv"]["kernel"])
        _load_block(tnet.up[j]["conv_block"], up["conv_block"])
    tnet.output_block.weight.data = _conv_w(params["output_block"]["kernel"])
    tnet.output_block.bias.data = torch.tensor(
        np.asarray(params["output_block"]["bias"]))
    return model, variables, tnet


# ---- independent torch re-implementation of the reference predict loop ----

def _axis_starts(size, roi, interval):
    if size <= roi:
        return [0]
    n = int(math.ceil((size - roi) / interval)) + 1
    return sorted({min(i * interval, size - roi) for i in range(n)})


def _torch_gaussian_map(roi, sigma_scale=0.125):
    grids = []
    for s in roi:
        x = np.arange(s, dtype=np.float64)
        sigma = max(s * sigma_scale, 1e-6)
        grids.append(np.exp(-0.5 * ((x - (s - 1) / 2.0) / sigma) ** 2))
    m = grids[0][:, None, None] * grids[1][None, :, None] * grids[2][None, None, :]
    m = np.clip(m / m.max(), np.finfo(np.float32).tiny, None)
    return torch.tensor(m.astype(np.float32))


def _torch_sliding_window(x, net, roi, overlap):
    """MONAI-semantics gaussian-blended sliding window, torch only.

    Reference path: SlidingWindowInferer resolved by config name
    (`unet3d/scripts/script_utils.py:290-293`) and applied in the predict loop
    (`unet3d/predict/volumetric.py:147-150`)."""
    spatial = x.shape[2:]
    interval = [r if r == s else max(int(r * (1.0 - overlap)), 1)
                for s, r in zip(spatial, roi)]
    starts = [_axis_starts(s, r, st)
              for s, r, st in zip(spatial, roi, interval)]
    imp = _torch_gaussian_map(roi)
    out_sum = w_sum = None
    with torch.no_grad():
        for z in starts[0]:
            for y in starts[1]:
                for xx in starts[2]:
                    patch = x[..., z:z + roi[0], y:y + roi[1], xx:xx + roi[2]]
                    out = net(patch) * imp
                    if out_sum is None:
                        out_sum = torch.zeros(
                            (x.shape[0], out.shape[1]) + tuple(spatial))
                        w_sum = torch.zeros((1, 1) + tuple(spatial))
                    out_sum[..., z:z + roi[0], y:y + roi[1], xx:xx + roi[2]] += out
                    w_sum[..., z:z + roi[0], y:y + roi[1], xx:xx + roi[2]] += imp
    return out_sum / w_sum


def _torch_resample_to(pred, src_affine, dst_affine, dst_shape):
    """ResampleToMatch(mode='trilinear') equivalence: grid_sample with the
    voxel->voxel affine map, align_corners=True, zero padding (the convention
    the per-op goldens in tests/test_resample.py pin)."""
    m = np.linalg.inv(src_affine) @ dst_affine  # dst voxel -> src voxel
    zz, yy, xx = np.meshgrid(*(np.arange(s) for s in dst_shape), indexing="ij")
    vox = np.stack([zz, yy, xx, np.ones_like(zz)]).reshape(4, -1).astype(np.float64)
    src_vox = (m @ vox)[:3]
    in_shape = pred.shape[-3:]
    norm = [2 * src_vox[i] / (in_shape[i] - 1) - 1 for i in range(3)]
    grid = np.stack([norm[2], norm[1], norm[0]], axis=-1).reshape(
        (1,) + tuple(dst_shape) + (3,)).astype(np.float32)
    return F.grid_sample(pred[None], torch.from_numpy(grid), mode="bilinear",
                         padding_mode="zeros", align_corners=True)[0]


def _torch_decode(probs, labels, threshold=0.5):
    """`unet3d/utils/one_hot.py:46-92`: any-channel threshold mask, argmax
    winner, index->label assignment."""
    mask = (probs > threshold).any(dim=0)
    winner = probs.argmax(dim=0)
    label_map = torch.zeros(probs.shape[1:], dtype=torch.int16)
    for idx, label in enumerate(labels):
        label_map[mask & (winner == idx)] = label
    return label_map


def _dice(a, b):
    a, b = np.asarray(a, bool), np.asarray(b, bool)
    if not a.any() and not b.any():
        return 1.0
    return 2.0 * np.logical_and(a, b).sum() / (a.sum() + b.sum())


def test_predict_loop_end_to_end_matches_torch_stack(tmp_path):
    cases = _write_cases(str(tmp_path))
    model, variables, tnet = _transplanted_nets()
    state = create_train_state(variables, build_optimizer("SGD", lr=0.0))

    dataset = SegmentationDataset(
        filenames=cases, desired_shape=list(MODEL_SHAPE),
        normalization="zero_mean", crop_foreground=False, resample=True,
        orientation="RAS")
    loader = build_loader(dataset, batch_size=1, shuffle=False)

    pred_dir = str(tmp_path / "preds")
    inferer = SlidingWindowInferer(roi_size=ROI, sw_batch_size=2,
                                   overlap=OVERLAP, mode="gaussian")
    written = volumetric_predictions(
        model, state, loader, pred_dir, activation="sigmoid", resample=True,
        interpolation="trilinear", inferer=inferer)
    assert len(written) == len(cases)

    for case, pred_fn in zip(cases, written):
        # --- torch stack on the same preprocessed input ---
        sample = dataset[dataset.filenames.index(case)]
        x = torch.tensor(np.asarray(sample["image"], np.float32))[None]
        logits = _torch_sliding_window(x, tnet, ROI, OVERLAP)
        probs = torch.sigmoid(logits)[0]
        native = load_image(case["image"][0], reorder=False)
        probs_native = _torch_resample_to(
            probs, np.asarray(sample["affine"], np.float64), native.affine,
            native.spatial_shape)
        torch_labels = _torch_decode(probs_native, LABELS)

        # --- this framework's written artifact ---
        vol = load_image(pred_fn, reorder=False)
        ours = np.asarray(vol.data, np.float32)
        assert ours.shape == tuple(probs_native.shape)
        np.testing.assert_allclose(vol.affine, native.affine, atol=1e-6)
        np.testing.assert_allclose(ours, probs_native.numpy(), atol=2e-3)

        our_labels = np.asarray(one_hot_to_label_map(ours, list(LABELS)))
        tl = torch_labels.numpy()
        for label in LABELS:
            d = _dice(our_labels == label, tl == label)
            assert d >= 0.995, (label, d)
        # overall decoded agreement, not just per-label overlap
        assert (our_labels == tl).mean() >= 0.999
