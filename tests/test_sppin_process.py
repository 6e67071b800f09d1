"""End-to-end SPPIN container entry: native registration + fold ensemble.

Drives `examples/sppin/process.py` as a subprocess on a synthetic 4-modality
case with a known misalignment between T1 and the other modalities, using two
random-init fold models — the full pipeline the reference runs with
ANTs/SimpleITK (`/root/reference/examples/sppin/process.py:192-280`), here
with zero external tools.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sppin_process_end_to_end(tmp_path):
    import jax.numpy as jnp

    from unet3d_tpu.config.factory import (build_or_load_model_from_config,
                                           model_input_shape_from_config)
    from unet3d_tpu.data.nifti import save
    from unet3d_tpu.models.registry import init_params
    from unet3d_tpu.ops.registration import _rotation_matrix
    from unet3d_tpu.ops.resample import resample_transform
    from unet3d_tpu.train.checkpoint import save_checkpoint

    rng = np.random.RandomState(0)
    shape = (32, 32, 32)
    affine = np.diag([2.0, 2.0, 2.0, 1.0])

    z, y, x = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape],
                          indexing="ij")
    c = (np.array(shape) - 1) / 2
    t1 = np.exp(-(((z - c[0]) / 8) ** 2 + ((y - c[1]) / 6) ** 2
                  + ((x - c[2]) / 5) ** 2)).astype(np.float32)
    t1 += 0.6 * np.exp(-(((z - c[0] - 6) / 3) ** 2 + ((y - c[1]) / 3) ** 2
                         + ((x - c[2] - 5) / 3) ** 2)).astype(np.float32)
    t1 += rng.rand(*shape).astype(np.float32) * 0.01
    save(str(tmp_path / "t1.nii.gz"), t1, affine)

    # other modalities: T1 geometry rotated/translated + intensity remap
    R = np.asarray(_rotation_matrix(jnp.asarray([0.06, -0.04, 0.08],
                                                jnp.float32)), np.float64)
    cp = (affine @ np.array(list(c) + [1.0]))[:3]
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = cp + np.array([3.0, -2.0, 2.5]) - R @ cp
    M = np.linalg.inv(affine) @ np.linalg.inv(T) @ affine
    for name, gain in [("t2", 1.2), ("b0", 0.8), ("b100", 1.5)]:
        vol = np.asarray(resample_transform(jnp.asarray(t1)[None],
                                            jnp.asarray(M), shape)[0])
        save(str(tmp_path / f"{name}.nii.gz"),
             (np.exp(gain * vol) - 1.0).astype(np.float32), affine)

    config = {
        "model": {"name": "DynUNet", "in_channels": 4, "out_channels": 1,
                  "kernel_size": [[3, 3, 3], [3, 3, 3]],
                  "strides": [[1, 1, 1], [2, 2, 2]],
                  "upsample_kernel_size": [[2, 2, 2]], "filters": [2, 4]},
        "dataset": {"name": "SegmentationDataset",
                    "desired_shape": [32, 32, 32],
                    "normalization": "zero_mean"},
    }
    config_filename = tmp_path / "config.json"
    config_filename.write_text(json.dumps(config))

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    for fold in range(2):
        model, variables = build_or_load_model_from_config(
            config, str(model_dir / "missing.npz"))
        variables = init_params(model, model_input_shape_from_config(config),
                                seed=fold)
        save_checkpoint(variables, str(model_dir / f"model{fold + 1}.npz"))

    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out_filename = tmp_path / "segmentation.nii.gz"
    result = subprocess.run(
        [sys.executable, "process.py",
         "--t1", str(tmp_path / "t1.nii.gz"),
         "--t2", str(tmp_path / "t2.nii.gz"),
         "--b0", str(tmp_path / "b0.nii.gz"),
         "--b100", str(tmp_path / "b100.nii.gz"),
         "--config", str(config_filename),
         "--model_dir", str(model_dir),
         "--output", str(out_filename)],
        cwd=os.path.join(REPO, "examples", "sppin"),
        env=env, capture_output=True, text=True, timeout=1200)
    assert result.returncode == 0, result.stderr[-3000:]
    assert "registered t2" in result.stdout

    from unet3d_tpu.data.io import load_image
    seg = load_image([str(out_filename)])
    data = np.asarray(seg.data)
    assert data.shape[-3:] == shape
    assert set(np.unique(data)).issubset({0.0, 1.0})
