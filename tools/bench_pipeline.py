#!/usr/bin/env python
"""End-to-end training-pipeline benchmark: does the host data path keep the
chip fed at the 126.5 ms/step device rate?

Builds a synthetic BraTS-shaped dataset on disk (8 subjects, 4 modalities +
hierarchical seg at 180x200x160 voxels), runs the real stack — persistent-
cache SegmentationDataset -> threaded DataLoader -> jitted bf16 train step —
and reports s/sample for the cold-cache epoch and two warm epochs.

Host preprocessing measured 6.1 s/sample uncached, 0.19 s/sample cached
(CLAUDE.md); with num_workers=4 the warm path should hide entirely behind the
0.127 s device step. Run via nohup (one TPU process at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_data(root, n_subjects=8, shape=(180, 200, 160)):
    import numpy as np

    from unet3d_tpu.data.nifti import save

    rng = np.random.RandomState(0)
    affine = None
    filenames = []
    for i in range(n_subjects):
        d = os.path.join(root, f"sub{i:02d}")
        os.makedirs(d, exist_ok=True)
        affine = np.diag([1.0, 1.0, 1.2, 1.0])
        mods = []
        for mod in ("t1", "t1ce", "t2", "flair"):
            fn = os.path.join(d, f"{mod}.nii.gz")
            if not os.path.exists(fn):
                save(fn, rng.rand(*shape).astype(np.float32), affine)
            mods.append(fn)
        seg_fn = os.path.join(d, "seg.nii.gz")
        if not os.path.exists(seg_fn):
            seg = np.zeros(shape, np.float32)
            c = [s // 2 for s in shape]
            seg[c[0]-30:c[0]+30, c[1]-30:c[1]+30, c[2]-30:c[2]+30] = 2
            seg[c[0]-15:c[0]+15, c[1]-15:c[1]+15, c[2]-15:c[2]+15] = 1
            seg[c[0]-5:c[0]+5, c[1]-5:c[1]+5, c[2]-5:c[2]+5] = 4
            save(seg_fn, seg, affine)
        filenames.append({"image": mods, "label": seg_fn, "subject_id": f"sub{i:02d}"})
    return filenames


def main():
    import jax.numpy as jnp
    import numpy as np

    from unet3d_tpu.data.dataset import SegmentationDatasetPersistent
    from unet3d_tpu.data.loader import DataLoader
    from unet3d_tpu.models.registry import create_model, init_params
    from unet3d_tpu.train.losses import DiceLoss
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state, make_train_step

    root = "/tmp/bench_pipeline_data"
    t0 = time.perf_counter()
    filenames = make_data(root)
    print(f"data gen: {time.perf_counter() - t0:.1f}s", flush=True)

    dataset = SegmentationDatasetPersistent(
        filenames, cache_dir=os.path.join(root, "cache"),
        labels=[[2, 1, 4], [1, 4], [4]], desired_shape=(128, 128, 128),
        crop_foreground=True, normalization="NormalizeIntensityD",
        normalization_kwargs={"channel_wise": True}, orientation="RAS",
        spatial_augmentations=[{"name": "RandFlipD", "prob": 0.5,
                                "spatial_axis": 0}])
    import ml_dtypes
    loader = DataLoader(dataset, batch_size=1, shuffle=True, num_workers=4,
                        prefetch_factor=2,
                        transfer_dtype={"image": ml_dtypes.bfloat16,
                                        "label": ml_dtypes.bfloat16})

    strides = [[1, 1, 1]] + [[2, 2, 2]] * 5
    model = create_model(
        "DynUNet", in_channels=4, out_channels=3, spatial_dims=3,
        strides=strides, filters=[64, 96, 128, 192, 256, 384],
        kernel_size=[[3, 3, 3]] * 6,
        upsample_kernel_size=strides[1:], deep_supervision=False)
    variables = init_params(model, (128, 128, 128, 4))
    tx = build_optimizer("Adam", lr=1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(model, DiceLoss(sigmoid=True), tx, amp=True)

    for epoch in range(3):
        loader.set_epoch(epoch)
        t0 = time.perf_counter()
        n = 0
        loss = None
        for batch in loader:
            # ship in the loader's compact dtype; the step upcasts on device
            images = jnp.asarray(batch["image"])
            labels = jnp.asarray(batch["label"])
            state, loss = step(state, images, labels)
            n += 1
        loss_val = float(loss)  # host transfer = completion barrier
        dt = (time.perf_counter() - t0) / n
        tag = "cold-cache" if epoch == 0 else "warm"
        print(f"epoch {epoch} ({tag}): {dt:.3f} s/sample over {n} samples "
              f"(loss {loss_val:.4f})", flush=True)

    # warm epochs through the double-buffered device prefetcher: batch i+1's
    # host->device put overlaps step i (data/prefetch.py; SURVEY §7 stage 5).
    # Expect ~max(transfer, loader) instead of transfer + loader + step.
    from unet3d_tpu.data.prefetch import DevicePrefetcher
    prefetched = DevicePrefetcher(loader)
    for epoch in (3, 4):
        prefetched.set_epoch(epoch)
        t0 = time.perf_counter()
        n = 0
        loss = None
        for batch in prefetched:
            state, loss = step(state, batch["image"], batch["label"])
            n += 1
        loss_val = float(loss)
        dt = (time.perf_counter() - t0) / n
        print(f"epoch {epoch} (warm+prefetch): {dt:.3f} s/sample over {n} "
              f"samples (loss {loss_val:.4f})", flush=True)


    # attribution: host-only (loader, no device) and transfer-only costs
    loader.set_epoch(3)
    t0 = time.perf_counter()
    n = 0
    last = None
    for batch in loader:
        last = batch
        n += 1
    print(f"loader-only: {(time.perf_counter() - t0) / n:.3f} s/sample",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(8):
        x = jnp.asarray(last["image"])
        y = jnp.asarray(last["label"])
        float(jnp.sum(x.astype(jnp.float32))) + float(jnp.sum(y.astype(jnp.float32)))
    print(f"transfer+sum-only: {(time.perf_counter() - t0) / 8:.3f} s/sample",
          flush=True)


if __name__ == "__main__":
    main()
