"""make_gif CLI: expert-vs-prediction GIF rendering.

Reference behavior: `unet3d/scripts/make_gif.py:9-18` (muted palette,
annotated panels) and `:81-125` (slice sweep spanning the expert labels with
padding). Covers frame count, palette application, annotation presence,
byte-level determinism, and the empty-labelmap error.
"""
import os

import numpy as np
import pytest
from PIL import Image

from unet3d_tpu.data import nifti
from unet3d_tpu.scripts import make_gif as make_gif_cli

D, H, W = 20, 24, 24
CUBE = (slice(6, 14), slice(8, 16), slice(6, 14))  # w-extent 6..13


def _write_case(root, empty_expert=False):
    aff = np.eye(4)
    # varied background so every slice differs (PIL's GIF writer merges
    # identical consecutive frames), but only 8 gray levels so the global
    # color count stays < 256 and GIF quantization is exact
    rng = np.random.RandomState(7)
    bg = (rng.randint(0, 8, (D, H, W)) * 32).astype(np.float32)
    lb1 = np.zeros((D, H, W), np.int16)
    lb2 = np.zeros((D, H, W), np.int16)
    if not empty_expert:
        lb1[CUBE] = 1
    lb2[6:12, 8:14, 7:13] = 1  # the "UNet" panel differs from the expert
    paths = {}
    for name, arr in (("bg", bg), ("lb1", lb1), ("lb2", lb2)):
        fn = os.path.join(root, f"{name}.nii.gz")
        nifti.save(fn, arr, aff)
        paths[name] = fn
    return paths


def test_make_gif_frames_palette_annotation(tmp_path):
    paths = _write_case(str(tmp_path))
    out = str(tmp_path / "out.gif")
    make_gif_cli.main(["--background", paths["bg"], "--labelmap1", paths["lb1"],
                       "--labelmap2", paths["lb2"], "--output", out,
                       "--pad", "2", "--text_size", "10"])
    im = Image.open(out)
    # expert labels span w=6..13 (8 slices) + pad 2 on each side
    assert im.n_frames == 8 + 2 * 2
    frame = np.asarray(im.convert("RGB"))
    # two side-by-side panels, annotation band prepended along axis 1
    assert frame.shape == ((H + 10), 2 * D, 3)
    # mid-cube slice: first palette color on BOTH panels (same label value)
    im.seek(im.n_frames // 2)
    mid = np.asarray(im.convert("RGB"))
    color = np.asarray(make_gif_cli.muted_palette[0], np.uint8)
    left, right = mid[:, :D], mid[:, D:]
    assert (left == color).all(axis=-1).any()
    assert (right == color).all(axis=-1).any()
    # the two panels differ (expert vs prediction overlay)
    assert (left != right).any()
    # annotation text rendered in the prepended band (the bottom text_size
    # rows after rot90): zeros everywhere except the drawn label text
    band = mid[-10:]
    assert band.max() > 0  # text pixels present
    assert (band == 0).any()  # ...on the blank band


def test_make_gif_deterministic(tmp_path):
    paths = _write_case(str(tmp_path))
    out1, out2 = str(tmp_path / "a.gif"), str(tmp_path / "b.gif")
    for out in (out1, out2):
        make_gif_cli.make_gif(paths["bg"], paths["lb1"], paths["lb2"], out,
                              pad=1, text_size=10)
    assert open(out1, "rb").read() == open(out2, "rb").read()


def test_make_gif_pad_clips_to_volume(tmp_path):
    paths = _write_case(str(tmp_path))
    out = str(tmp_path / "out.gif")
    make_gif_cli.make_gif(paths["bg"], paths["lb1"], paths["lb2"], out,
                          pad=100, text_size=10)
    assert Image.open(out).n_frames == W  # clipped to the full w extent


def test_make_gif_empty_expert_raises(tmp_path):
    paths = _write_case(str(tmp_path), empty_expert=True)
    with pytest.raises(ValueError, match="no positive labels"):
        make_gif_cli.make_gif(paths["bg"], paths["lb1"], paths["lb2"],
                              str(tmp_path / "out.gif"))
