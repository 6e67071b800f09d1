#!/usr/bin/env python
"""Expert-vs-prediction animated GIF visualization CLI.

Parity: `unet3d/scripts/make_gif.py:9-129` — overlays two label maps on a
background volume with a muted color palette, annotates each panel, and sweeps
the slices spanned by the expert labels into an animated GIF. Falls back to
PIL's default font when no TrueType font is available (the reference ships one
in misc/fonts/).
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from unet3d_tpu.data.io import load_image

muted_palette = ([72, 120, 208],
                 [238, 133, 74],
                 [106, 204, 100],
                 [214, 95, 95],
                 [149, 108, 180],
                 [140, 97, 60],
                 [220, 126, 192],
                 [121, 121, 121],
                 [213, 187, 103],
                 [130, 198, 226])


def parse_args(args=None):
    parser = ArgumentParser()
    parser.add_argument("--background", required=True,
                        help="Filename for the background image file.")
    parser.add_argument("--labelmap1", required=True,
                        help="Filename for the 'Expert' or ground truth label map.")
    parser.add_argument("--labelmap2", required=True,
                        help="Filename for the 'UNet' label map.")
    parser.add_argument("--output", required=True, help="Output gif filename.")
    parser.add_argument("--labels", nargs=2, default=("Expert", "UNet"),
                        help="Annotation labels to place under the images.")
    parser.add_argument("--text_size", default=30, type=int,
                        help="Size of text for annotating the images.")
    parser.add_argument("--fps", default=6, type=int,
                        help="Frames per second (fps) of the output gif file.")
    parser.add_argument("--pad", default=5, type=int,
                        help="Frames above/below the labels to start/end the gif.")
    parser.add_argument("--palette", default="muted", type=str,
                        help="Palette name; 'muted' is built in, anything else "
                             "requires seaborn.")
    parser.add_argument("--axcodes", default="RAS", type=str,
                        help="Axcodes for re-ordering image orientations on load.")
    parser.add_argument("--include_zero", default=False, action="store_true",
                        help="Include zero as a label value.")
    return parser.parse_args(args)


def get_palette(name: str = "muted"):
    if name == "muted":
        return muted_palette
    import seaborn
    return np.asarray(np.asarray(seaborn.color_palette(name)) * 255, np.uint8)


def to_255(array: np.ndarray) -> np.ndarray:
    scaled = np.asarray(((array - array.min()) / max(array.max(), 1e-8)) * 255,
                        np.uint8)
    return np.stack([scaled] * 3, axis=3)


def _font(size: int):
    """Scalable bold font for the label annotation (the reference ships
    OpenSans-Bold in misc/fonts; here a vendored font, then common system
    bold fonts, then PIL's bitmap default)."""
    base = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(base, "..", "misc", "fonts", "OpenSans-Bold.ttf"),
        "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
        "/usr/share/fonts/truetype/liberation/LiberationSans-Bold.ttf",
        "/Library/Fonts/Arial Bold.ttf",
    ]
    for font_file in candidates:
        try:
            return ImageFont.truetype(font_file, size)
        except OSError:
            continue
    return ImageFont.load_default()


def annotate(img: Image.Image, text: str, size: int = 30) -> None:
    draw = ImageDraw.Draw(img)
    draw.text((img.size[0] / 2 - len(text) * size / 4, img.size[1] - size * 1.5),
              text, font=_font(size))


def concat_images(im1: Image.Image, im2: Image.Image) -> Image.Image:
    dst = Image.new("RGB", (im1.width + im2.width, im1.height))
    dst.paste(im1, (0, 0))
    dst.paste(im2, (im1.width, 0))
    return dst


def _load(fn: str, axcodes: str) -> np.ndarray:
    return np.asarray(load_image(fn, axcodes=axcodes).data)[0]


def make_gif(background, labelmap1, labelmap2, output, labels=("Expert", "UNet"),
             text_size=30, fps=6, pad=5, palette="muted", axcodes="RAS",
             include_zero=False):
    ignore_zero = not include_zero
    annot_axis = 1
    cp = get_palette(palette)

    bg255 = to_255(_load(background, axcodes))
    lb1 = _load(labelmap1, axcodes)
    lb2 = _load(labelmap2, axcodes)

    bg1 = np.copy(bg255)
    bg2 = np.copy(bg255)

    positive = np.asarray(np.where(lb1 > 0))
    if positive.size == 0:
        raise ValueError("labelmap1 contains no positive labels to animate")
    idx_min = positive.min(axis=1)
    idx_max = positive.max(axis=1)

    label_values = np.unique(lb1)
    if ignore_zero:
        label_values = label_values[label_values != 0]
    for i, label in enumerate(label_values):
        bg1[lb1 == label] = cp[i % len(cp)]
        bg2[lb2 == label] = cp[i % len(cp)]

    concat_shape = list(bg1.shape)
    concat_shape[annot_axis] = text_size
    bg1 = np.concatenate([np.zeros(concat_shape, bg1.dtype), bg1], axis=annot_axis)
    bg2 = np.concatenate([np.zeros(concat_shape, bg2.dtype), bg2], axis=annot_axis)

    frames = []
    lo = max(int(idx_min[2]) - pad, 0)
    hi = min(int(idx_max[2]) + 1 + pad, bg1.shape[2])
    for idx in range(lo, hi):
        img1 = Image.fromarray(np.rot90(bg1[:, :, idx]))
        annotate(img1, labels[0], size=text_size)
        img2 = Image.fromarray(np.rot90(bg2[:, :, idx]))
        annotate(img2, labels[1], size=text_size)
        frames.append(concat_images(img1, img2))

    frames[0].save(output, save_all=True, append_images=frames[1:],
                   duration=1000 / fps, loop=0)
    return output


def main(args=None):
    ns = parse_args(args)
    make_gif(background=ns.background, labelmap1=ns.labelmap1, labelmap2=ns.labelmap2,
             output=ns.output, labels=tuple(ns.labels), text_size=ns.text_size,
             fps=ns.fps, pad=ns.pad, palette=ns.palette, axcodes=ns.axcodes,
             include_zero=ns.include_zero)


if __name__ == "__main__":
    main()
