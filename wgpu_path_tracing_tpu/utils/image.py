"""Image output and comparison utilities.

The reference displays through a canvas blit (blit.wgsl); headless on TPU we
write PNGs. The accumulation buffer's row 0 is the BOTTOM of the view (see
ops/camera_rays.py and blit.wgsl:149-151's y-flip), so PNG writing flips
vertically to match what the reference shows on screen (and its goldens under
docs/img/).
"""

from __future__ import annotations

import numpy as np


def buffer_to_srgb(accum: np.ndarray, width: int, height: int, exposure: float = 1.0):
    """HDR accumulation (N, 3) -> display-referred (H, W, 3) float in [0,1],
    top row first."""
    from wgpu_path_tracing_tpu.ops import tonemap

    img = np.asarray(tonemap.display_transform(accum.reshape(height, width, 3),
                                               exposure))
    img = np.nan_to_num(img, nan=0.0, posinf=1.0, neginf=0.0)
    img = np.clip(img, 0.0, 1.0)
    return img[::-1]  # buffer row 0 is the bottom of the view


def write_png(path: str, img01: np.ndarray) -> None:
    """img01: (H, W, 3) float in [0, 1], top row first."""
    from PIL import Image

    data = (np.clip(img01, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(data, "RGB").save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    """Root-mean-square error between two [0,1] images of equal shape."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.sqrt(np.mean((a - b) ** 2)))
