"""Compare a render against the reference's committed golden PNG.

Usage:
    python tools/golden_rmse.py <render.png> [golden.png]

The golden (docs/img/cornell_512spp.png in the reference mirror) has a black
frame border around the canvas; it is cropped to the non-black bounding box
before a box-filter resize to the render's size. Reports RMSE over [0, 1]
sRGB and writes a side-by-side PNG next to the render.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from wgpu_path_tracing_tpu.utils.image import read_png, rmse  # noqa: E402

GOLDEN = "/root/reference/docs/img/cornell_512spp.png"


def crop_border(img: np.ndarray, thresh: float = 0.02) -> np.ndarray:
    mask = img.max(axis=2) > thresh
    ys = np.nonzero(mask.any(axis=1))[0]
    xs = np.nonzero(mask.any(axis=0))[0]
    return img[ys[0] : ys[-1] + 1, xs[0] : xs[-1] + 1]


def box_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray((img * 255.0 + 0.5).astype(np.uint8))
    return np.asarray(pil.resize((w, h), Image.BOX), np.float32) / 255.0


def compare(render_path: str, golden_path: str = GOLDEN):
    render = read_png(render_path)
    golden = crop_border(read_png(golden_path))
    golden = box_resize(golden, render.shape[0], render.shape[1])
    value = float(rmse(render, golden))
    side = np.concatenate([golden, render], axis=1)
    out = render_path.rsplit(".", 1)[0] + "_vs_golden.png"
    from PIL import Image

    Image.fromarray((side * 255.0 + 0.5).astype(np.uint8)).save(out)
    return value, out


if __name__ == "__main__":
    value, out = compare(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else GOLDEN)
    print(f"RMSE vs golden: {value:.4f}  (side-by-side: {out})")
