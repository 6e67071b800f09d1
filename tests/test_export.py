"""AOT export/serving artifact tests (predict/export.py + scripts/export.py).

Framework extension: the reference has no serving export; these pin the
contract — single-file StableHLO container, dynamic batch, activation/AMP
folding, CLI end-to-end — on the CPU backend.
"""
import json
import os

import numpy as np
import pytest

from unet3d_tpu.models.registry import create_model, init_params
from unet3d_tpu.predict.export import (export_forward, load_exported,
                                       save_exported)


def _tiny_model():
    strides = [[1, 1, 1], [2, 2, 2]]
    model = create_model("DynUNet", in_channels=2, out_channels=3,
                         spatial_dims=3, strides=strides,
                         filters=[4, 8], kernel_size=[[3, 3, 3]] * 2,
                         upsample_kernel_size=strides[1:],
                         deep_supervision=False)
    variables = init_params(model, (8, 8, 8, 2))
    return model, variables


def _reference_forward(model, variables, x, activation=None):
    import jax.numpy as jnp

    from unet3d_tpu.train.step import from_ndhwc, to_ndhwc
    out = model.apply(variables, to_ndhwc(jnp.asarray(x)), False)
    if activation == "sigmoid":
        import jax
        out = jax.nn.sigmoid(out)
    return np.asarray(from_ndhwc(out), np.float32)


def test_export_roundtrip_dynamic_batch(tmp_path):
    model, variables = _tiny_model()
    exported = export_forward(model, variables, (8, 8, 8, 2))
    path = str(tmp_path / "model.u3dexp")
    header = save_exported(exported, path, metadata={"model": {"name": "DynUNet"}})
    assert header["platforms"] and header["format"] == "unet3d_tpu.export"

    served = load_exported(path)
    assert served.metadata["model"]["name"] == "DynUNet"
    rng = np.random.RandomState(0)
    for batch in (1, 2):  # symbolic batch dim serves any batch size
        x = rng.rand(batch, 2, 8, 8, 8).astype(np.float32)
        got = np.asarray(served(x))
        assert got.shape == (batch, 3, 8, 8, 8)
        want = _reference_forward(model, variables, x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_fixed_batch_and_activation(tmp_path):
    model, variables = _tiny_model()
    exported = export_forward(model, variables, (8, 8, 8, 2),
                              activation="sigmoid", batch_size=2)
    path = str(tmp_path / "model.u3dexp")
    save_exported(exported, path)
    served = load_exported(path)
    x = np.random.RandomState(1).rand(2, 2, 8, 8, 8).astype(np.float32)
    got = np.asarray(served(x))
    assert got.min() >= 0.0 and got.max() <= 1.0
    want = _reference_forward(model, variables, x, activation="sigmoid")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # fixed batch: the wrong batch size must be rejected, not mis-served
    with pytest.raises(Exception):
        served(x[:1])


def test_export_amp_bf16(tmp_path):
    model, variables = _tiny_model()
    exported = export_forward(model, variables, (8, 8, 8, 2), amp=True)
    path = str(tmp_path / "model.u3dexp")
    save_exported(exported, path)
    served = load_exported(path)
    x = np.random.RandomState(2).rand(1, 2, 8, 8, 8).astype(np.float32)
    got = np.asarray(served(x))
    assert got.dtype == np.float32
    want = _reference_forward(model, variables, x)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)  # bf16 graph


def test_export_cross_platform_artifact(tmp_path):
    """platforms=("cpu","tpu"): one artifact, both targets; runs on CPU here."""
    model, variables = _tiny_model()
    exported = export_forward(model, variables, (8, 8, 8, 2),
                              platforms=("cpu", "tpu"))
    path = str(tmp_path / "model.u3dexp")
    header = save_exported(exported, path)
    assert set(header["platforms"]) == {"cpu", "tpu"}
    served = load_exported(path)
    x = np.random.RandomState(3).rand(1, 2, 8, 8, 8).astype(np.float32)
    np.testing.assert_allclose(np.asarray(served(x)),
                               _reference_forward(model, variables, x),
                               rtol=1e-5, atol=1e-5)


def test_export_ndhwc_entry_layout(tmp_path):
    """entry_layout='ndhwc' serves device-native channel-last tensors with no
    boundary transposes, numerically identical to the channel-first artifact
    (VERDICT r4 item 4: the serving layout-tax bisect)."""
    model, variables = _tiny_model()
    exported = export_forward(model, variables, (8, 8, 8, 2),
                              activation="sigmoid", entry_layout="ndhwc")
    path = str(tmp_path / "model_ndhwc.u3dexp")
    # NO manual metadata: export_forward stamps the layout and save_exported
    # writes it — an ndhwc artifact saved through the bare library API must
    # still pick the passthrough ndhwc_forward adapter below
    save_exported(exported, path)
    served = load_exported(path)
    assert served.metadata["entry_layout"] == "ndhwc"
    rng = np.random.RandomState(4)
    x_ncdhw = rng.rand(2, 2, 8, 8, 8).astype(np.float32)
    x_ndhwc = np.transpose(x_ncdhw, (0, 2, 3, 4, 1))
    got = np.asarray(served(x_ndhwc))
    assert got.shape == (2, 8, 8, 8, 3)
    want = _reference_forward(model, variables, x_ncdhw, activation="sigmoid")
    np.testing.assert_allclose(np.transpose(got, (0, 4, 1, 2, 3)), want,
                               rtol=1e-5, atol=1e-5)
    # the make_forward adapter is a passthrough for ndhwc-entry artifacts
    fwd = served.ndhwc_forward()
    assert fwd is served
    np.testing.assert_allclose(np.asarray(fwd(x_ndhwc)), got, rtol=0, atol=0)
    with pytest.raises(ValueError, match="entry_layout"):
        export_forward(model, variables, (8, 8, 8, 2), entry_layout="nchw")


def test_load_rejects_non_artifact(tmp_path):
    path = str(tmp_path / "bogus")
    with open(path, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        load_exported(path)


def test_export_cli_end_to_end(tmp_path):
    from unet3d_tpu.scripts.export import main as export_main
    from unet3d_tpu.train.checkpoint import save_checkpoint

    model, variables = _tiny_model()
    ckpt = str(tmp_path / "model.npz")
    save_checkpoint(variables, ckpt)
    config = {
        "model": {"name": "DynUNet", "in_channels": 2, "out_channels": 3,
                  "spatial_dims": 3, "strides": [[1, 1, 1], [2, 2, 2]],
                  "filters": [4, 8], "kernel_size": [[3, 3, 3]] * 2,
                  "upsample_kernel_size": [[2, 2, 2]],
                  "deep_supervision": False},
        "loss": {"name": "DiceLoss", "sigmoid": True},
        "dataset": {"desired_shape": [8, 8, 8]},
    }
    cfg = str(tmp_path / "config.json")
    json.dump(config, open(cfg, "w"))
    out = str(tmp_path / "model.u3dexp")
    export_main(["--config_filename", cfg, "--model_filename", ckpt,
                 "--output_filename", out])
    assert os.path.exists(out)
    served = load_exported(out)
    # activation inferred from the loss section (sigmoid)
    assert served.metadata["activation"] == "sigmoid"
    x = np.random.RandomState(4).rand(2, 2, 8, 8, 8).astype(np.float32)
    got = np.asarray(served(x))
    assert got.shape == (2, 3, 8, 8, 8)
    np.testing.assert_allclose(
        got, _reference_forward(model, variables, x, activation="sigmoid"),
        rtol=1e-5, atol=1e-5)


def test_predict_cli_serves_artifact(tmp_path):
    """predict --model_filename model.u3dexp serves the exported artifact:
    no model build, activation folded in (framework extension)."""
    from unet3d_tpu.data import nifti
    from unet3d_tpu.scripts.export import main as export_main
    from unet3d_tpu.scripts.predict import main as predict_main
    from unet3d_tpu.train.checkpoint import save_checkpoint

    rng = np.random.RandomState(0)
    test_fns = []
    for i in range(2):
        img = rng.rand(8, 8, 8).astype(np.float32)
        ifn = str(tmp_path / f"img{i}.nii.gz")
        nifti.save(ifn, img, np.eye(4))
        test_fns.append({"image": ifn})
    config = {
        "model": {"name": "UNet3D", "n_features": 1, "base_width": 2,
                  "encoder_blocks": [1, 1], "n_outputs": 1},
        "loss": {"name": "DiceLoss", "sigmoid": True},
        "dataset": {"name": "SegmentationDataset", "desired_shape": [8, 8, 8],
                    "labels": [1], "normalization": "zero_mean",
                    "resample": True},
        "test_filenames": test_fns,
    }
    cfg = str(tmp_path / "config.json")
    json.dump(config, open(cfg, "w"))

    from unet3d_tpu.models.registry import create_model, init_params
    model = create_model("UNet3D", n_features=1, base_width=2,
                         encoder_blocks=[1, 1], n_outputs=1)
    variables = init_params(model, (8, 8, 8, 1))
    ckpt = str(tmp_path / "model.npz")
    save_checkpoint(variables, ckpt)
    artifact = str(tmp_path / "model.u3dexp")
    export_main(["--config_filename", cfg, "--model_filename", ckpt,
                 "--output_filename", artifact])

    out_dir = str(tmp_path / "served")
    predict_main(["--config_filename", cfg, "--output_directory", out_dir,
                  "--model_filename", artifact, "--group", "test"])
    pred_dir = os.path.join(out_dir, "predictions")
    preds = sorted(os.listdir(pred_dir))
    assert len(preds) == 2
    from unet3d_tpu.data.io import load_image
    served_out = np.asarray(load_image(os.path.join(pred_dir, preds[0])).data)
    assert served_out.min() >= 0.0 and served_out.max() <= 1.0  # sigmoid folded

    # the same artifact through the checkpoint-based CLI path must agree
    out_dir2 = str(tmp_path / "direct")
    predict_main(["--config_filename", cfg, "--output_directory", out_dir2,
                  "--model_filename", ckpt, "--group", "test",
                  "--activation", "sigmoid"])
    direct_out = np.asarray(load_image(
        os.path.join(out_dir2, "predictions", preds[0])).data)
    np.testing.assert_allclose(served_out, direct_out, rtol=1e-5, atol=1e-5)

    # conflicting --activation against the folded one is rejected
    with pytest.raises(ValueError, match="folded into"):
        predict_main(["--config_filename", cfg, "--output_directory", out_dir,
                      "--model_filename", artifact, "--group", "test",
                      "--activation", "softmax"])


@pytest.mark.parametrize("mesh_spec", [{"data": 2, "space": 4},
                                       {"data": 4, "space": 2}])
def test_export_sharded_mesh_artifact(tmp_path, mesh_spec):
    """mesh export: 8-device artifact, auto-resharded inputs at serving time,
    output matches the single-device forward. Two factorizations exercise the
    mesh rebuild on load (predict/export.py) beyond the single shape the
    artifact was first developed against (VERDICT r4 item 6)."""
    import jax

    from unet3d_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model, variables = _tiny_model()
    mesh = make_mesh(mesh_spec)
    exported = export_forward(model, variables, (8, 8, 8, 2), mesh=mesh)
    path = str(tmp_path / "model8.u3dexp")
    header = save_exported(
        exported, path,
        metadata={"mesh": {"axes": list(mesh.axis_names),
                           "shape": [int(mesh.shape[a])
                                     for a in mesh.axis_names]}})
    assert header["nr_devices"] == 8
    served = load_exported(path)
    # batch defaults to the data-axis size
    bs = mesh_spec.get("data", 1)
    x = np.random.RandomState(5).rand(bs, 2, 8, 8, 8).astype(np.float32)
    got = np.asarray(served(x))  # plain numpy in: sharded automatically
    want = _reference_forward(model, variables, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_http_serving_example(tmp_path):
    """examples/serving/serve.py: load artifact, serve /predict + /health."""
    import io
    import json as json_mod
    import sys
    import threading
    import urllib.request

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "serving"))
    try:
        import serve as serve_mod
    finally:
        sys.path.pop(0)

    model, variables = _tiny_model()
    exported = export_forward(model, variables, (8, 8, 8, 2),
                              activation="sigmoid")
    artifact = str(tmp_path / "model.u3dexp")
    save_exported(exported, artifact, metadata={"activation": "sigmoid"})

    server = serve_mod.build_server(artifact, host="127.0.0.1", port=0)
    host, port = server.server_address
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://{host}:{port}/health") as r:
            health = json_mod.loads(r.read())
        assert health["status"] == "ok" and health["activation"] == "sigmoid"

        x = np.random.RandomState(7).rand(2, 2, 8, 8, 8).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(f"http://{host}:{port}/predict",
                                     buf.getvalue())
        with urllib.request.urlopen(req) as r:
            out = np.load(io.BytesIO(r.read()))
        want = _reference_forward(model, variables, x, activation="sigmoid")
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)

        # malformed body -> 400, server stays alive
        bad = urllib.request.Request(f"http://{host}:{port}/predict",
                                     b"not npy")
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(f"http://{host}:{port}/health") as r:
            assert json_mod.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_sliding_window_over_artifact(tmp_path):
    """An ROI-shaped artifact drives the sliding-window inferer (server-side
    whole-case inference), bit-identical to the in-process forward."""
    import jax.numpy as jnp

    from unet3d_tpu.predict.sliding_window import SlidingWindowInferer
    from unet3d_tpu.predict.volumetric import make_forward
    from unet3d_tpu.train.optim import build_optimizer
    from unet3d_tpu.train.step import create_train_state

    model, variables = _tiny_model()
    exported = export_forward(model, variables, (8, 8, 8, 2))
    path = str(tmp_path / "roi.u3dexp")
    save_exported(exported, path)
    served = load_exported(path)

    inferer = SlidingWindowInferer(roi_size=(8, 8, 8), overlap=0.5,
                                   mode="gaussian")
    x = jnp.asarray(np.random.RandomState(0).rand(1, 12, 12, 12, 2),
                    jnp.float32)
    out_served = np.asarray(inferer(x, served.ndhwc_forward()))
    state = create_train_state(variables, build_optimizer("Adam"))
    out_direct = np.asarray(inferer(x, make_forward(model, state)))
    np.testing.assert_array_equal(out_served, out_direct)
